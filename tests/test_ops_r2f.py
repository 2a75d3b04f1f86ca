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


# --- round 2g ---


def test_length_buckets_partition(ray_session):
    df = _df(Q.q_length_buckets(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    n_nonempty = sum(1 for t in docs["text"] if len(t.split()) >= 1)
    assert df["n_docs"].sum() == n_nonempty  # buckets partition the docs
    assert (df["waste_tokens"] == df["padded_tokens"] - df["sum_tokens"]).all()
    assert (df["waste_tokens"] >= 0).all()
    for _, r in df.iterrows():  # bucket cap bounds the true tokens
        assert r["sum_tokens"] <= r["n_docs"] * (1 << (r["bucket"] + 1))
        assert r["sum_tokens"] >= r["n_docs"] * (1 << r["bucket"])


def test_mixture_weights_sum_to_one(ray_session):
    df = _df(Q.q_mixture_weights(SF))
    # ppm weights sum to 1e6 within the floor slack (one unit/source)
    assert 1_000_000 - len(df) <= df["weight_ppm"].sum() <= 1_000_000
    # sqrt temperature flattens: every weight between uniform/3 and 3x
    assert (df["weight_ppm"] > 1_000_000 // (3 * len(df))).all()


def test_zscore_events_moments(ray_session):
    df = _df(Q.q_zscore_events(SF))
    # z in milli units: per type, mean ~0 and spread ~1000
    for et, g in df.groupby("event_type"):
        z = g["z_milli"].to_numpy() / 1000.0
        assert abs(z.mean()) < 0.01
        assert 0.9 < z.std() < 1.1


def test_polygon_overlay_set_algebra(ray_session):
    from rhealpixdggs_py_ray.core import wrappers as W
    from rhealpixdggs_py_ray.core import geometry as geo

    df = _df(Q.q_polygon_overlay(SF))
    r = df.iloc[0]
    ca = W.polyfill(geo.Polygon(Q.OVERLAY_A), Q.OVERLAY_RES, plane=False)
    cb = W.polyfill(geo.Polygon(Q.OVERLAY_B), Q.OVERLAY_RES, plane=False)
    assert r["n_a"] == len(set(ca)) and r["n_b"] == len(set(cb))
    assert r["n_both"] == len(set(ca) & set(cb))
    assert 0 < r["n_both"] < min(r["n_a"], r["n_b"])  # genuine overlap
    u = r["n_a"] + r["n_b"] - r["n_both"]
    assert r["jaccard_ppm"] == 1_000_000 * r["n_both"] // u


def test_morans_i_identities(ray_session):
    import duckdb

    df = _df(Q.q_morans_i(SF))
    r = df.iloc[0]
    nrow = 9
    assert r["n_cells"] == nrow * 4 * nrow
    # every interior cell has 8 neighbors; edge rows lose the 3
    # off-lattice ones (columns wrap, rows clip)
    assert r["w_pairs"] == 8 * r["n_cells"] - 2 * 3 * (4 * nrow)
    assert r["den"] > 0
    # |I| <= ~1 sanity via the normalized statistic
    i_stat = (r["n_cells"] / r["w_pairs"]) * (r["num"] / r["den"])
    assert -1.5 < i_stat < 1.5
    con = duckdb.connect()
    n_ev = con.sql(f"SELECT COUNT(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert 0 < r["sum_x"] <= n_ev  # equatorial subset of events


# --- round 2h ---


def test_kmeans_train_improves_inertia(ray_session):
    from rhealpixdggs_py_ray.ops.ann import _seq_d2
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.floor(np.array(emb["embedding"].to_pylist()) * 1e6)

    def inertia(stats):
        sdf = stats.sort_values(["cluster", "dim"]).reset_index(drop=True)
        k = sdf["cluster"].nunique()
        C = (sdf["sum_micros"].to_numpy() / sdf["n"].to_numpy()).reshape(k, -1)
        return _seq_d2(X, C).min(axis=1).sum()

    one = _df(Q.q_kmeans_step(SF))
    three = _df(Q.q_kmeans_train(SF))
    # Lloyd monotonicity: more iterations never increase inertia
    assert inertia(three) <= inertia(one) + 1e-6
    # every embedding is assigned exactly once per dim
    d = three.groupby("dim")["n"].sum()
    assert (d == len(X)).all()


def test_debounce_lag_rule(ray_session):
    df = _df(Q.q_debounce(SF))
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    ev["t"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    got = df.set_index("event_id")["keep"]
    for (u, et), sub in list(ev.groupby(["user_id", "event_type"]))[:25]:
        sub = sub.sort_values(["t", "event_id"])
        t = sub["t"].to_numpy()
        keep = np.r_[True, (t[1:] - t[:-1]) >= Q.DEBOUNCE_US]
        assert np.array_equal(
            got.loc[sub["event_id"]].to_numpy(), keep.astype(np.int64))
    assert 0 < df["keep"].sum() < len(df)  # rule actually fires both ways


def test_user_gini_bounds(ray_session):
    df = _df(Q.q_user_gini(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    assert df["n_events"].sum() == len(ev)
    assert df["user_id"].is_unique
    assert (df["gini_ppm"] >= 0).all()
    # 5 event types -> gini < 1 - 1/5
    assert (df["gini_ppm"] <= 800_000).all()
    # single-event users have zero diversity
    solo = df[df["n_events"] == 1]
    assert (solo["gini_ppm"] == 0).all()


def test_image_retention_policy(ray_session):
    pairs = _df(Q.q_image_neardup(SF))
    dropped = _df(Q.q_image_retention(SF))
    di = set(dropped["img_idx"])
    assert dropped["img_idx"].is_unique
    # every pair loses at least one member; no pair survives intact
    assert all(a in di or b in di for a, b in zip(pairs["a"], pairs["b"]))
    # dropped set is minimal per pair rule: each dropped image must be
    # the designated loser of at least one pair
    import pyarrow.parquet as pq
    dims = pq.read_table(Q.IMG_DIR, columns=["image_id", "w", "h"])
    px = {int(s[3:]): w * h for s, w, h in zip(
        dims["image_id"].to_pylist(),
        dims["w"].to_numpy(), dims["h"].to_numpy())}
    losers = set()
    for a, b in zip(pairs["a"], pairs["b"]):
        losers.add(a if px[a] < px[b] else b if px[b] < px[a] else max(a, b))
    assert di == losers


def test_nearest_poi_consistent_with_distance_join(ray_session):
    near = _df(Q.q_nearest_poi(SF))
    assert len(near) == len(pd.read_parquet(f"{SF}/events.parquet",
                                            columns=["event_id"]))
    assert near["poi_id"].between(0, Q.DISTJOIN_NPOI - 1).all()
    assert (near["d2_mm2"] >= 0).all()
    # the per-POI min over assignments can't beat distance_join's min
    dj = _df(Q.q_distance_join(SF)).set_index("poi_id")
    for pid, g in near.groupby("poi_id"):
        if pid in dj.index:
            assert g["d2_mm2"].min() >= dj.loc[pid, "min_d2_mm2"]


def test_generator_source_matches_parquet_fixture(ray_session):
    import ray as _ray
    from rhealpixdggs_py_ray.sources.generator import ImagesDatasource

    # the generated table IS the parquet fixture, row for row
    ds = _ray.data.read_datasource(ImagesDatasource(64), override_num_blocks=5)
    gen = ds.to_pandas().sort_values("image_id").reset_index(drop=True)
    from rhealpixdggs_py_ray.fixtures import images_batch
    want = images_batch(0, 64).to_pandas()
    pd.testing.assert_frame_equal(gen, want)
    # parallelism honored: 5 requested -> 5 declared metadata tasks
    tasks = ImagesDatasource(64).get_read_tasks(5)
    assert len(tasks) == 5
    assert sum(t.metadata.num_rows for t in tasks) == 64
    # meta_only drops the payload column
    slim = _ray.data.read_datasource(
        ImagesDatasource(16, meta_only=True), override_num_blocks=2)
    assert "bytes" not in slim.schema().names


def test_brand_nation_revenue_consistent(ray_session):
    import duckdb

    df = _df(Q.q_brand_nation_revenue(SF))
    con = duckdb.connect()
    n_li = con.sql(
        f"SELECT COUNT(*) FROM '{SF}/lineitem.parquet'").fetchone()[0]
    # 4-way inner join with full referential integrity keeps every line
    assert df["n_items"].sum() == n_li
    assert (df["revenue_c"] > 0).all()
    assert df.set_index(["p_brand", "n_name"]).index.is_unique


def test_generator_meta_fast_path_parity(ray_session):
    from rhealpixdggs_py_ray.sources.generator import _meta_batch
    from rhealpixdggs_py_ray.fixtures import images_batch

    # the payload-free fast path must equal the canonical rows column
    # for column (same ids, dims, fmt, phash) at an odd offset
    a = _meta_batch(37, 200)
    b = images_batch(37, 200).select(["image_id", "w", "h", "fmt", "phash"])
    assert a.equals(b)


def test_mixed_res_counts_partitions_polygon_events(ray_session):
    from rhealpixdggs_py_ray.core import wrappers as W
    from rhealpixdggs_py_ray.core import geometry as geo

    df = _df(Q.q_mixed_res_counts(SF))
    # compacted cover cells are mixed-resolution and unique
    lens = df["cell_id"].str.len()
    assert lens.min() < lens.max()
    assert df["cell_id"].is_unique
    # totals match the uncompacted res-4 polyfill cover count
    full = set(W.polyfill(geo.Polygon(Q.POLYFILL_POLY), Q.POLYFILL_RES,
                          plane=False))
    flat = _df(Q.q_cell_from_point(SF))
    # every event whose res-4 cell is in the uncompacted cover is
    # counted exactly once (compaction preserves membership)
    r4 = flat["cell_id"].str.slice(0, 5)
    n_in = int(r4.isin(full).sum())
    assert df["n"].sum() == n_in


def test_od_matrix_conservation(ray_session):
    import duckdb

    df = _df(Q.q_od_matrix(SF))
    con = duckdb.connect()
    n_ud = con.sql(
        f"""SELECT COUNT(*) FROM (SELECT DISTINCT user_id,
            epoch_us(ts) // 86400000000 FROM '{SF}/events.parquet')"""
    ).fetchone()[0]
    # one OD pair per (user, day)
    assert df["n_user_days"].sum() == n_ud
    # diagonal exists (single-event days) and off-diagonal movement too
    assert (df["origin"] == df["dest"]).any()
    assert (df["origin"] != df["dest"]).any()


def test_cube_revenue_marginals_consistent(ray_session):
    df = _df(Q.q_cube_revenue(SF)).set_index(["prio", "status"])
    fine = df[(df.index.get_level_values(0) != "ALL")
              & (df.index.get_level_values(1) != "ALL")]
    tot = df.loc[("ALL", "ALL")]
    # both marginals and the grand total re-add exactly
    assert fine["revenue_c"].sum() == tot["revenue_c"]
    assert fine["n_orders"].sum() == tot["n_orders"]
    for p in fine.index.get_level_values(0).unique():
        assert fine.loc[p]["revenue_c"].sum() == df.loc[(p, "ALL"), "revenue_c"]
    for s in fine.index.get_level_values(1).unique():
        sub = fine[fine.index.get_level_values(1) == s]
        assert sub["revenue_c"].sum() == df.loc[("ALL", s), "revenue_c"]


def test_contrastive_pairs_labels(ray_session):
    df = _df(Q.q_contrastive_pairs(SF))
    pos = _df(Q.q_minhash_lsh(SF))
    p = df[df["label"] == 1]
    n = df[df["label"] == 0]
    # positives are exactly the minhash near-dup pairs
    assert set(zip(p["a"], p["b"])) == set(zip(pos["a"], pos["b"]))
    # negatives: canonical, non-self, disjoint from positives, jac 0
    assert (n["a"] < n["b"]).all()
    assert (n["jac_micros"] == 0).all()
    assert not (set(zip(n["a"], n["b"])) & set(zip(p["a"], p["b"])))
    assert len(n) >= len(p)  # every doc contributes a negative candidate


def test_calendar_ops_conservation(ray_session):
    hp = _df(Q.q_hourly_profile(SF))
    mo = _df(Q.q_monthly_orders(SF))
    n_ev = len(pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"]))
    n_od = len(pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"]))
    assert hp["n"].sum() == n_ev
    assert hp["hour"].between(0, 23).all()
    assert mo["n_orders"].sum() == n_od
    assert mo["m"].between(1, 12).all()
    assert mo.set_index(["y", "m"]).index.is_unique


def test_retention_cohorts_matrix(ray_session):
    df = _df(Q.q_retention_cohorts(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["w"] = ev["ts"].astype("datetime64[us]").astype(np.int64) // 604_800_000_000
    um = ev.drop_duplicates(["user_id", "w"])
    first = um.groupby("user_id")["w"].min()
    # offset-0 cell of each cohort counts exactly its new users
    for cw, g in first.groupby(first):
        cell = df[(df["cohort_week"] == cw) & (df["weeks_since"] == 0)]
        assert int(cell["n_users"].iloc[0]) == len(g)
    # total matrix mass == distinct (user, week) pairs
    assert df["n_users"].sum() == len(um)
    assert (df["weeks_since"] >= 0).all()
