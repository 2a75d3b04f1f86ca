"""Skew stress: the round-2c/d exchange operators on a synthetic
events table where ONE user owns 90% of all rows (the hot-key shape
that breaks naive per-key grouping).  Each query runs end-to-end on
the skewed parquet and must match DuckDB exactly."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import rhealpixdggs_py_ray.pipelines.queries as Q

N = 120_000
HOT_USER = 7


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skew")
    rng = np.random.RandomState(11)
    uid = np.where(
        rng.rand(N) < 0.9, HOT_USER, rng.randint(0, 500, N)
    ).astype(np.int64)
    ts = (
        np.datetime64("2024-01-01", "us")
        + (rng.randint(0, 30 * 86400, N) * 1_000_000).astype("timedelta64[us]")
    )
    types = np.array(["view", "click", "purchase", "signup", "error"])
    t = pa.table({
        "event_id": pa.array(np.arange(N, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(uid),
        "event_type": pa.array(types[rng.randint(0, 5, N)], type=pa.string()),
        "value": pa.array(np.round(rng.rand(N) * 1000, 2)),
        "props": pa.array(["{}"] * N, type=pa.string()),
    })
    pq.write_table(t, os.path.join(str(d), "events.parquet"))
    return str(d)


def _con(skew_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{skew_dir}/events.parquet'"
    )
    return con


def _cmp(ray_df: pd.DataFrame, sql_df: pd.DataFrame):
    cols = sorted(ray_df.columns)
    assert cols == sorted(sql_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = sql_df[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (av == bv).all(), c


def test_running_totals_hot_user(ray_session, skew_dir):
    got = Q.q_running_totals(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_running_totals()).fetchdf()
    _cmp(got, want)
    # the hot user's history really is ~90% of rows and stayed exact
    assert (got["user_id"] == HOT_USER).sum() > 0.8 * N


def test_window_join_hot_user(ray_session, skew_dir):
    got = Q.q_window_join(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_window_join()).fetchdf()
    _cmp(got, want)
    assert HOT_USER in set(got["user_id"])


def test_funnel_hot_user(ray_session, skew_dir):
    got = Q.q_funnel(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_funnel()).fetchdf()
    _cmp(got, want)


def test_count_of_counts_hot_user(ray_session, skew_dir):
    got = Q.q_count_of_counts(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_count_of_counts()).fetchdf()
    _cmp(got, want)
    # the hot user appears as a single huge count bucket
    assert got["n_events"].max() > 0.8 * N


def test_distinct_users_hot_user(ray_session, skew_dir):
    got = Q.q_distinct_users(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_distinct_users()).fetchdf()
    _cmp(got, want)


def test_cooccurrence_hot_user(ray_session, skew_dir):
    got = Q.q_cooccurrence(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_cooccurrence()).fetchdf()
    _cmp(got, want)


def test_moving_avg_hot_user(ray_session, skew_dir):
    got = Q.q_moving_avg(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_moving_avg()).fetchdf()
    _cmp(got, want)
    assert (got["user_id"] == HOT_USER).sum() > 0.8 * N


def test_late_events_hot_user(ray_session, skew_dir):
    got = Q.q_late_events(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_late_events()).fetchdf()
    _cmp(got, want)
    # the hot user's shuffled arrivals must produce lateness
    assert got.loc[got["user_id"] == HOT_USER, "late"].sum() > 0


def test_debounce_hot_user(ray_session, skew_dir):
    got = Q.q_debounce(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_debounce()).fetchdf()
    _cmp(got, want)
    hot = got[got["user_id"] == HOT_USER]
    assert 0 < hot["keep"].sum() < len(hot)  # suppression fires on the hot key


def test_user_gini_hot_user(ray_session, skew_dir):
    got = Q.q_user_gini(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_user_gini()).fetchdf()
    _cmp(got, want)


def test_od_matrix_hot_user(ray_session, skew_dir):
    got = Q.q_od_matrix(skew_dir).to_pandas()
    want = _con(skew_dir).execute(Q.sql_od_matrix()).fetchdf()
    _cmp(got, want)
