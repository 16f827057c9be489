"""Tests for the sorted voxel-grid kNN (pfilter_tpu.ops.knn) against
brute-force exact kNN.  The engine gates correspondences at 5th-NN sq-dist
< 1.0 (ref: src/odomEstimationClass.cpp:300), so the grid search must agree
with exact kNN on every gated query."""

import jax.numpy as jnp
import numpy as np

from pfilter_tpu.ops import knn


def _build(rng, n_map, cap, spread=40.0):
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n_map] = rng.uniform(-spread, spread, size=(n_map, 3)).astype(np.float32)
    rg = rng.integers(0, 20, size=(cap, 2)).astype(np.float32)
    valid = np.zeros(cap, bool)
    valid[:n_map] = True
    origin = knn.grid_origin_for_pose(jnp.zeros(3), 1.0)
    grid = knn.build_grid(jnp.array(xyz), jnp.array(rg), jnp.array(valid), origin, 1.0)
    return xyz, valid, grid


def test_grid_sorted_and_complete():
    rng = np.random.default_rng(0)
    xyz, valid, grid = _build(rng, 500, 512)
    ids = np.asarray(grid.cell_ids)
    assert np.all(np.diff(ids.astype(np.int64)) >= 0)
    assert int(np.asarray(grid.valid).sum()) == 500
    # Every input point survives the sort with its rg payload intact.
    got = np.asarray(grid.xyz)[np.asarray(grid.valid)]
    assert set(map(tuple, got.tolist())) == set(map(tuple, xyz[valid].tolist()))


def test_knn_matches_bruteforce_within_gate():
    rng = np.random.default_rng(1)
    n_map, cap, k = 2000, 2048, 5
    xyz, valid, grid = _build(rng, n_map, cap, spread=4.0)  # dense -> gates pass
    q = rng.uniform(-3.5, 3.5, size=(256, 3)).astype(np.float32)
    res = knn.knn_query(grid, jnp.array(q), jnp.ones(256, bool), k, 16)
    sq = np.asarray(res.sqdist)
    idx = np.asarray(res.idx)
    grid_xyz = np.asarray(grid.xyz)

    mp = xyz[:n_map]
    d2 = ((q[:, None] - mp[None]) ** 2).sum(-1)
    exact = np.sort(d2, axis=1)[:, :k]

    gated = exact[:, k - 1] < 1.0
    assert gated.sum() > 50, "test setup should produce many gated queries"
    np.testing.assert_allclose(sq[gated], exact[gated], rtol=1e-4, atol=1e-5)
    # Returned indices must point at the right coordinates.
    for qi in np.nonzero(gated)[0][:20]:
        for j in range(k):
            d = ((grid_xyz[idx[qi, j]] - q[qi]) ** 2).sum()
            np.testing.assert_allclose(d, sq[qi, j], rtol=1e-4, atol=1e-5)


def test_knn_sparse_returns_inf():
    rng = np.random.default_rng(2)
    xyz, valid, grid = _build(rng, 10, 64, spread=50.0)
    q = np.array([[200.0, 200.0, 200.0]], np.float32)  # far from everything
    res = knn.knn_query(grid, jnp.array(q), jnp.ones(1, bool), 5, 16)
    assert np.all(np.isinf(np.asarray(res.sqdist)))


def test_invalid_queries_masked():
    rng = np.random.default_rng(3)
    xyz, valid, grid = _build(rng, 100, 128, spread=1.5)
    q = np.zeros((4, 3), np.float32)
    qv = np.array([True, False, True, False])
    res = knn.knn_query(grid, jnp.array(q), jnp.array(qv), 5, 16)
    sq = np.asarray(res.sqdist)
    assert np.all(np.isinf(sq[~qv]))
    assert np.all(np.isfinite(sq[qv]))


def test_rg_travels_with_points():
    """Persistence counters must stay attached through the sort."""
    rng = np.random.default_rng(4)
    cap = 64
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:32] = rng.uniform(-5, 5, size=(32, 3)).astype(np.float32)
    rg = np.zeros((cap, 2), np.float32)
    rg[:32] = np.stack([np.arange(32), np.arange(32) * 2], -1)
    valid = np.zeros(cap, bool)
    valid[:32] = True
    origin = knn.grid_origin_for_pose(jnp.zeros(3), 1.0)
    grid = knn.build_grid(jnp.array(xyz), jnp.array(rg), jnp.array(valid), origin, 1.0)
    g_xyz, g_rg, g_valid = np.asarray(grid.xyz), np.asarray(grid.rg), np.asarray(grid.valid)
    for i in range(cap):
        if not g_valid[i]:
            continue
        src = np.where((xyz == g_xyz[i]).all(-1))[0][0]
        np.testing.assert_allclose(g_rg[i], rg[src])
