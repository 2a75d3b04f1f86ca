"""Invariant tests for the round-2f operators (moving-average window
frame, late-event watermark, full outer join, rank/dense_rank,
duplicated-span detection, vector tile export)."""

import duckdb
import numpy as np
import pandas as pd

import rhealpixdggs_py_ray.pipelines.queries as Q

SF = "/root/testdata/sf0.001"


def _df(ds):
    return ds.to_pandas() if hasattr(ds, "to_pandas") else ds


def test_moving_avg_frame_invariants(ray_session):
    df = _df(Q.q_moving_avg(SF)).sort_values("event_id").reset_index(drop=True)
    assert (df["n_frame"] >= 1).all() and (df["n_frame"] <= Q.MOV_FRAME).all()
    # brute per-user replay on a sample of users
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    ev["v_c"] = np.floor(ev["value"].to_numpy() * 100).astype(np.int64)
    for uid in ev["user_id"].unique()[:5]:
        sub = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
        v = sub["v_c"].to_numpy()
        want = [
            v[max(0, i - Q.MOV_FRAME + 1):i + 1].sum() for i in range(len(v))
        ]
        got = df.set_index("event_id").loc[sub["event_id"], "mov_sum_c"]
        assert np.array_equal(got.to_numpy(), np.array(want, dtype=np.int64))


def test_late_events_watermark_semantics(ray_session):
    from rhealpixdggs_py_ray.fixtures import splitmix64

    df = _df(Q.q_late_events(SF))
    assert set(df["late"].unique()) <= {0, 1}
    # brute replay: arrival order = splitmix64(event_id); late iff the
    # event time sits >15 min below the running max of earlier arrivals
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    ev["t"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev["arr"] = splitmix64(
        ev["event_id"].to_numpy().astype(np.uint64)
    ).astype(np.float64)  # float ok: compare order only, values < 2^64
    got = df.set_index("event_id")["late"]
    n_late = 0
    for uid, sub in ev.groupby("user_id"):
        sub = sub.sort_values(["arr", "event_id"])
        t = sub["t"].to_numpy()
        pm = np.maximum.accumulate(t)
        late = np.r_[False, t[1:] < pm[:-1] - Q.LATE_GAP_US]
        assert np.array_equal(
            got.loc[sub["event_id"]].to_numpy(), late.astype(np.int64)
        )
        n_late += int(late.sum())
    assert n_late == int(df["late"].sum())
    assert n_late > 0  # the permuted arrival order must create lateness


def test_full_outer_days_totals(ray_session):
    df = _df(Q.q_full_outer_days(SF))
    con = duckdb.connect()
    n_ev = con.sql(f"SELECT COUNT(*) FROM '{SF}/events.parquet'").fetchone()[0]
    n_od = con.sql(f"SELECT COUNT(*) FROM '{SF}/orders.parquet'").fetchone()[0]
    assert df["n_events"].sum() == n_ev
    assert df["n_orders"].sum() == n_od
    assert df["day"].is_unique
    # genuinely outer: days exist with each side empty
    assert ((df["n_events"] == 0) & (df["n_orders"] > 0)).any()
    assert ((df["n_orders"] == 0) & (df["n_events"] > 0)).any()


def test_rank_orders_contract(ray_session):
    df = _df(Q.q_rank_orders(SF))
    assert (df["rnk"] >= df["drnk"]).all()
    for ck, g in list(df.groupby("o_custkey"))[:20]:
        g = g.sort_values(["price_c"], ascending=False)
        # dense ranks are 1..n_distinct_prices with no gaps
        assert sorted(g["drnk"].unique()) == list(
            range(1, g["price_c"].nunique() + 1)
        )
        # rank of the best-priced order is 1; ties share ranks
        assert g["rnk"].min() == 1
        for pc, tg in g.groupby("price_c"):
            assert tg["rnk"].nunique() == 1 and tg["drnk"].nunique() == 1


def test_dup_spans_bounds(ray_session):
    df = _df(Q.q_dup_spans(SF))
    assert (df["n_docs"] >= 2).all()
    assert (df["n_occ"] >= df["n_docs"]).all()
    assert df["gram_md5"].is_unique
    n_docs_total = len(pd.read_parquet(f"{SF}/documents.parquet",
                                       columns=["doc_id"]))
    assert (df["n_docs"] <= n_docs_total).all()


def test_vector_tiles_matches_tile_counts(ray_session):
    vt = _df(Q.q_vector_tiles(SF))
    tc = _df(Q.q_tile_counts(SF))
    # exactly 4 corner rows per tile, count replicated on each
    sizes = vt.groupby("tile_id").size()
    assert (sizes == 4).all()
    per_tile = vt.groupby("tile_id")["n"].first()
    want = tc.set_index("tile_id")["n"]
    assert per_tile.sort_index().equals(want.sort_index())
    # corners are sane coordinates
    assert vt["pt_lon_micros"].between(-180_000_000, 180_000_000).all()
    assert vt["pt_lat_micros"].between(-90_000_000, 90_000_000).all()
