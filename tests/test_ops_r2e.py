"""Invariant tests for the round-2e operators (co-occurrence,
constraint audit, image quality filter, thumbnail pyramid,
stream-stream window join, deep pagination)."""

import numpy as np
import pandas as pd

import rhealpixdggs_py_ray.pipelines.queries as Q

SF = "/root/testdata/sf0.001"


def _df(ds):
    return ds.to_pandas() if hasattr(ds, "to_pandas") else ds


def test_cooccurrence_symmetric_bound(ray_session):
    import duckdb

    df = _df(Q.q_cooccurrence(SF))
    # pairs are canonical (a < b) and bounded by the smaller side's
    # basket count
    assert (df["type_a"] < df["type_b"]).all()
    baskets = duckdb.sql(
        f"""SELECT event_type, COUNT(*) FROM (
          SELECT DISTINCT user_id, epoch_us(ts) // 86400000000, event_type
          FROM '{SF}/events.parquet') GROUP BY 1"""
    ).fetchall()
    per_type = dict(baskets)
    for _, r in df.iterrows():
        assert r["n_baskets"] <= min(per_type[r["type_a"]], per_type[r["type_b"]])


def test_constraint_audit_clean_fixture(ray_session):
    df = _df(Q.q_constraint_audit(SF)).set_index("check_name")["n"]
    assert len(df) == 4
    # the synthetic fixture is referentially clean with unique keys
    assert df["orders_orderkey_duplicate"] == 0
    assert df["orders_custkey_orphan"] == 0


def test_image_quality_filter_threshold(ray_session):
    df = _df(Q.q_image_quality_filter(SF))
    assert len(df) > 0
    assert (df["var_r_q"] < Q.IMGVAR_MIN).all()
    assert (df["var_r_q"] >= 0).all()


def test_image_pyramid_levels(ray_session):
    df = _df(Q.q_image_pyramid(SF)).set_index("level")
    assert sorted(df.index) == sorted(Q.PYRAMID_LEVELS)
    assert (df["n"] == Q.IMG_N).all()
    # centi-mean sums bounded by 255*100 per image
    assert (df["sum_mean_r_c"] <= 25500 * Q.IMG_N).all()


def test_window_join_against_bruteforce(ray_session):
    import duckdb

    df = _df(Q.q_window_join(SF))
    assert (df["n_matched_purchases"] <= df["n_pairs"]).all()
    brute = duckdb.sql(
        f"""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type
             FROM '{SF}/events.parquet')
        SELECT p.user_id, COUNT(*) AS n
        FROM e p JOIN e c ON c.user_id = p.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.t < p.t AND c.t >= p.t - {Q.SSJOIN_WINDOW_US}
        GROUP BY 1"""
    ).fetchdf().set_index("user_id")["n"]
    got = df.set_index("user_id")["n_pairs"]
    assert got.to_dict() == brute.to_dict()


def test_page_orders_is_true_slice(ray_session):
    import duckdb

    df = _df(Q.q_page_orders(SF)).sort_values("rank")
    assert len(df) == Q.PAGE_SIZE
    assert (df["rank"].to_numpy()
            == np.arange(Q.PAGE_OFFSET + 1,
                         Q.PAGE_OFFSET + 1 + Q.PAGE_SIZE)).all()
    # the page's max price must not exceed the (OFFSET)th price overall
    top = duckdb.sql(
        f"""SELECT CAST(floor(o_totalprice*100) AS BIGINT) AS c
        FROM '{SF}/orders.parquet'
        ORDER BY c DESC LIMIT {Q.PAGE_OFFSET}"""
    ).fetchdf()["c"]
    assert df["price_c"].max() <= top.min()


def test_levenshtein_duckdb_parity():
    """levenshtein_u (min-plus prefix-scan DP) == DuckDB levenshtein
    on 300 random string pairs incl. empty strings."""
    import duckdb
    import numpy as np

    from rhealpixdggs_py_ray.ops.dedup import levenshtein_u

    rng = np.random.RandomState(7)
    con = duckdb.connect()
    for _ in range(300):
        a = "".join(rng.choice(list("abcde "), rng.randint(0, 30)))
        b = "".join(rng.choice(list("abcde "), rng.randint(0, 30)))
        assert levenshtein_u(a, b) == con.execute(
            "SELECT levenshtein(?, ?)", [a, b]
        ).fetchone()[0]


def test_editdist_identical_docs_zero(ray_session):
    df = _df(Q.q_dedup_editdist(SF))
    assert len(df) > 0
    assert (df["edit_dist"] >= 0).all()
    # LSH candidates are near-dups: the closest pair must be within a
    # few edits (fixture near-dups differ by small token perturbations)
    assert df["edit_dist"].min() <= 8


def test_uncompact_roundtrip_exact(ray_session):
    """compress -> uncompact is lossless: the expanded set equals the
    original uniform cover exactly."""
    from rhealpixdggs_py_ray.core import geometry as geo
    from rhealpixdggs_py_ray.core import wrappers as W
    from rhealpixdggs_py_ray.pipelines.queries import (
        CFG, POLYFILL_POLY, POLYFILL_RES)

    orig = sorted(
        W.polyfill(geo.Polygon(POLYFILL_POLY), POLYFILL_RES,
                   plane=False, cfg=CFG)
    )
    got = sorted(_df(Q.q_uncompact_cells(SF))["cell_id"].tolist())
    assert got == orig
    # and the compressed form is strictly smaller
    comp = W.compress_order_cells(list(orig))
    assert len(comp) < len(orig)


def test_grid_distance_bounds(ray_session):
    from rhealpixdggs_py_ray.pipelines.queries import CFG, GRIDDIST_RES

    df = _df(Q.q_grid_distance(SF))
    assert len(df) > 0
    nrow = CFG.N_side**GRIDDIST_RES
    # Chebyshev distance bounded by max(row span, wrapped col span)
    assert (df["grid_dist"] >= 0).all()
    assert (df["grid_dist"] <= max(nrow - 1, (4 * nrow) // 2)).all()


def test_snapshot_diff_partitions_rows(ray_session):
    import duckdb

    df = _df(Q.q_snapshot_diff(SF))
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    # modified + removed + unchanged covers every old-snapshot row
    assert df["n"].sum() == total
    assert set(df["status"]) <= {"modified", "removed", "unchanged"}


def test_polars_source_total(ray_session):
    df = _df(Q.q_polars_source(SF))
    assert df["n"].sum() == Q.POLARS_N
    assert len(df) == 7
