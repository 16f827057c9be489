"""Tests for the tiled Pallas kNN kernel (interpret mode on CPU) against
exact brute force.  The engine gates correspondences at 5th-NN sq-dist < 1.0,
and the 3x3-tile halo covers the 1 m ball exactly, so gated results must
match brute force bit-for-bit (up to fp reduction order)."""

import jax.numpy as jnp
import numpy as np

from pfilter_tpu.ops import knn_tiled

NT = 16
TILE_CELLS = 4
TILE_CAP = 512


def _build(rng, n_map, cap, spread):
    xyz = np.full((cap, 3), 0.0, np.float32)
    xyz[:n_map] = rng.uniform(-spread, spread, size=(n_map, 3)).astype(np.float32)
    rg = rng.integers(0, 20, size=(cap, 2)).astype(np.float32)
    valid = np.zeros(cap, bool)
    valid[:n_map] = True
    origin = knn_tiled.tile_origin_for_pose(jnp.zeros(3), NT, TILE_CELLS)
    tmap = knn_tiled.build_tiled(
        jnp.array(xyz), jnp.array(rg), jnp.array(valid), origin, NT, TILE_CELLS, TILE_CAP
    )
    return tmap


def test_build_tiled_layout():
    rng = np.random.default_rng(0)
    tmap = _build(rng, 500, 512, spread=20.0)
    ts = np.asarray(tmap.tile_start)
    assert ts[-1] == 500  # valid slots first
    assert (np.diff(ts) >= 0).all()
    # xyz_t transposed copy matches valid slots
    v = np.asarray(tmap.valid)
    np.testing.assert_allclose(
        np.asarray(tmap.xyz_t[:3, : len(v)]).T[v], np.asarray(tmap.xyz)[v], atol=0
    )


def test_query_matches_bruteforce_within_gate():
    rng = np.random.default_rng(1)
    tmap = _build(rng, 1500, 2048, spread=6.0)
    q = rng.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    qv = np.ones(300, bool)
    res = knn_tiled.query_tiled(
        tmap, jnp.array(q), jnp.array(qv), NT, TILE_CELLS, TILE_CAP, interpret=True
    )
    ref = knn_tiled.query_tiled_reference(tmap, jnp.array(q), jnp.array(qv))
    sq, rsq = np.asarray(res.sqdist), np.asarray(ref.sqdist)
    gated = rsq[:, 4] < 1.0
    assert gated.sum() > 30, f"setup should gate many queries ({gated.sum()})"
    # The kernel packs the lane index into the distance's low _IDX_BITS
    # mantissa bits, so returned distances are truncated downward by up to
    # 2^-10 relative — selection order and indices stay exact.
    trunc = 2.0 ** -(23 - knn_tiled._IDX_BITS)
    np.testing.assert_allclose(sq[gated], rsq[gated], rtol=2 * trunc, atol=1e-5)
    # indices point at the same coordinates (ties aside, distances must agree)
    mx = np.asarray(tmap.xyz)
    for qi in np.nonzero(gated)[0][:25]:
        for j in range(5):
            d = ((mx[res.idx[qi, j]] - q[qi]) ** 2).sum()
            np.testing.assert_allclose(d, sq[qi, j], rtol=2 * trunc, atol=1e-5)


def test_query_all_neighbors_beyond_halo():
    rng = np.random.default_rng(2)
    tmap = _build(rng, 100, 128, spread=25.0)
    # Far query: nothing within its halo -> inf
    q = np.array([[200.0, 200.0, 0.0]], np.float32)  # clipped to border tile
    res = knn_tiled.query_tiled(
        tmap, jnp.array(q), jnp.ones(1, bool), NT, TILE_CELLS, TILE_CAP, interpret=True
    )
    # border tiles may contain clipped far map points; at minimum the result
    # must be monotone and match brute force on the gate decision
    ref = knn_tiled.query_tiled_reference(tmap, jnp.array(q), jnp.ones(1, bool))
    gate_kernel = np.asarray(res.sqdist)[0, 4] < 1.0
    gate_ref = np.asarray(ref.sqdist)[0, 4] < 1.0
    assert gate_kernel == gate_ref == False  # noqa: E712


def test_invalid_queries_masked():
    rng = np.random.default_rng(3)
    tmap = _build(rng, 400, 512, spread=3.0)
    q = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
    qv = np.zeros(64, bool)
    qv[::2] = True
    res = knn_tiled.query_tiled(
        tmap, jnp.array(q), jnp.array(qv), NT, TILE_CELLS, TILE_CAP, interpret=True
    )
    sq = np.asarray(res.sqdist)
    assert np.all(np.isinf(sq[~qv]))
    assert np.all(np.isfinite(sq[qv][:, 0]))


def test_many_queries_per_tile_subtiling():
    """More queries in one tile than tqc -> the subtile loop must cover all."""
    rng = np.random.default_rng(4)
    tmap = _build(rng, 800, 1024, spread=2.0)
    # 200 queries all in the same small region (same tile)
    q = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    qv = np.ones(200, bool)
    res = knn_tiled.query_tiled(
        tmap, jnp.array(q), jnp.array(qv), NT, TILE_CELLS, TILE_CAP, interpret=True
    )
    ref = knn_tiled.query_tiled_reference(tmap, jnp.array(q), jnp.array(qv))
    np.testing.assert_allclose(
        # rtol: packed-key mantissa truncation (see _IDX_BITS in the kernel)
        np.asarray(res.sqdist), np.asarray(ref.sqdist), rtol=2e-3, atol=1e-5
    )
