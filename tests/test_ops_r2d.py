"""Invariant tests for the round-2d operators (BM25, distance join,
funnel, TTR, image mosaic, trajectory segmentation, anomaly filter,
ROLLUP, cap cover).  Exact oracle parity is tools/check_queries.py's
job; these pin semantics the value hash can't: ranking monotonicity,
funnel containment, rollup consistency, threshold correctness."""

import numpy as np
import pandas as pd

import rhealpixdggs_py_ray.pipelines.queries as Q

SF = "/root/testdata/sf0.001"


def _df(ds):
    return ds.to_pandas() if hasattr(ds, "to_pandas") else ds


def test_bm25_rank_contract(ray_session):
    df = _df(Q.q_bm25_topk(SF))
    assert set(df["qid"]) <= set(range(Q.BM25_NQ))
    for _, g in df.groupby("qid"):
        g = g.sort_values("rank")
        assert (g["rank"].to_numpy() == np.arange(1, len(g) + 1)).all()
        assert len(g) <= Q.BM25_K
        # scores non-increasing down the ranking; ties break doc_id asc
        s = g["score"].to_numpy()
        assert (s[:-1] >= s[1:]).all()
        d = g["doc_id"].to_numpy()
        ties = s[:-1] == s[1:]
        assert (d[:-1][ties] < d[1:][ties]).all()
    # a query doc never retrieves itself (candidates start at BM25_NQ)
    assert (df["doc_id"] >= Q.BM25_NQ).all()


def test_bm25_self_similarity_top1(ray_session):
    """A candidate that shares every term with the query doc should
    outrank one sharing few: verify top-1 has the max score."""
    df = _df(Q.q_bm25_topk(SF))
    for _, g in df.groupby("qid"):
        assert g.loc[g["rank"].idxmin(), "score"] == g["score"].max()


def test_distance_join_within_radius(ray_session):
    df = _df(Q.q_distance_join(SF))
    assert (df["min_d2_mm2"] * 1e6 <= Q.DISTJOIN_D2).all()
    assert (df["n_within"] > 0).all()


def test_funnel_monotone(ray_session):
    r = _df(Q.q_funnel(SF)).iloc[0]
    assert r["n_view"] >= r["n_click"] >= r["n_purchase"] >= 0


def test_ttr_bounds(ray_session):
    df = _df(Q.q_ttr(SF))
    assert (df["n_distinct"] <= df["n_tokens"]).all()
    assert df["ttr_permille"].between(0, 1000).all()


def test_image_mosaic_counts_and_bounds(ray_session):
    df = _df(Q.q_image_mosaic(SF))
    assert df["n"].sum() == Q.IMG_N
    # channel means are in [0, 255] => centi-sums bounded by 25500 * n
    for c in ("sum_mean_r_c", "sum_mean_g_c", "sum_mean_b_c"):
        assert (df[c] >= 0).all()
        assert (df[c] <= 25500 * df["n"]).all()
    # res-2 tile ids are 3 chars (face + 2 digits)
    assert df["tile_id"].str.len().eq(3).all()


def test_trajectory_segments_bounds(ray_session):
    df = _df(Q.q_trajectory_segments(SF))
    assert (df["n_segments"] >= 1).all()
    assert (df["n_segments"] <= df["n_points"]).all()
    single = df[df["n_points"] == 1]
    assert (single["n_segments"] == 1).all()
    assert (single["max_step_mm2"] == 0).all()


def test_anomaly_filter_is_top_percent(ray_session):
    import duckdb

    df = _df(Q.q_anomaly_filter(SF))
    assert (df["value_c"] > df["p99_c"]).all()
    # at most ~1% of each type's rows can exceed an exact p99
    tot = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(*) FROM '{SF}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    for et, g in df.groupby("event_type"):
        assert len(g) <= max(1, tot[et] // 100 + 1)


def test_rollup_levels_consistent(ray_session):
    df = _df(Q.q_rollup_revenue(SF))
    fine = df[(df["prio"] != "ALL") & (df["status"] != "ALL")]
    sub = df[(df["prio"] != "ALL") & (df["status"] == "ALL")]
    tot = df[(df["prio"] == "ALL") & (df["status"] == "ALL")]
    assert len(tot) == 1
    assert fine["n_orders"].sum() == tot["n_orders"].iloc[0]
    assert fine["revenue_c"].sum() == tot["revenue_c"].iloc[0]
    for p, g in fine.groupby("prio"):
        row = sub[sub["prio"] == p]
        assert row["n_orders"].iloc[0] == g["n_orders"].sum()
        assert row["revenue_c"].iloc[0] == g["revenue_c"].sum()


def test_cap_cover_radius_and_validity(ray_session):
    from rhealpixdggs_py_ray.core import suid as su

    df = _df(Q.q_cap_cover(SF))
    assert len(df) > 0
    assert (df["d2_mm2"] * 1e6 <= Q.CAP_D2).all()
    # every covered cell is a valid res-2 SUID
    u = su.from_string(df["cell_id"].tolist())
    assert (su.resolution_of(u) == 2).all()
    # each POI's cover contains the nucleus-closest cell exactly once
    for _, g in df.groupby("poi_id"):
        assert g["cell_id"].is_unique
