"""Round-4 operator tests: cell_color query shape, grid_path invariants."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_cell_color_query(ray_session):
    from rhealpixdggs_py_ray.pipelines import queries as Q

    t = Q.q_cell_color(SF).to_pandas()
    assert len(t) > 0
    assert set(t.columns) == {"tile_id", "r_q6", "g_q6", "b_q6"}
    # saturation 0.5, v=1: every channel in [0.5, 1] -> quantized bounds
    for c in ("r_q6", "g_q6", "b_q6"):
        assert t[c].min() >= 500000 and t[c].max() <= 1000000
    # hue is unique per cell at a fixed resolution -> rgb triples unique
    assert not t.duplicated(subset=["r_q6", "g_q6", "b_q6"]).any()


def test_grid_path_invariants(ray_session):
    """Every path: starts/ends on the pair's cells (seq 0 / seq n),
    consecutive steps are lattice-adjacent (Chebyshev 1 with seam
    wrap), and path length == grid distance + 1."""
    from rhealpixdggs_py_ray.pipelines import queries as Q
    from rhealpixdggs_py_ray.pipelines.queries import (
        GRIDDIST_RES, GRIDPATH_MAX, _lattice_from_cell_strings)

    t = Q.q_grid_path(SF).to_pandas()
    assert len(t) > 0
    W = 4 * 3 ** GRIDDIST_RES
    gy, gx = _lattice_from_cell_strings(t["cell_id"].to_numpy(), GRIDDIST_RES)
    t = t.assign(gy=gy, gx=gx).sort_values(["event_id", "seq"])
    for eid, g in t.groupby("event_id"):
        seq = g["seq"].to_numpy()
        assert seq[0] == 0 and (np.diff(seq) == 1).all()
        assert len(g) - 1 <= GRIDPATH_MAX
        dy = np.abs(np.diff(g["gy"].to_numpy()))
        dxr = np.abs(np.diff(g["gx"].to_numpy()))
        dx = np.minimum(dxr, W - dxr)
        assert (np.maximum(dy, dx) <= 1).all()

    # endpoints match the grid_distance pairs: n_steps-1 == grid_dist
    d = Q.q_grid_distance(SF).to_pandas().set_index("event_id")["grid_dist"]
    n_steps = t.groupby("event_id").size()
    shared = n_steps.index.intersection(d.index)
    assert len(shared) > 0
    capped = d.loc[shared] <= GRIDPATH_MAX
    assert (n_steps.loc[shared][capped] == d.loc[shared][capped] + 1).all()
