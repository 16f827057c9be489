"""Tests for voxel kernels (pfilter_tpu.ops.voxel) against brute-force numpy
models of the reference semantics (rgbds: src/odomEstimationClass.cpp:34-134,
extractstablepoint: :7-25, aging: :634-646, crop: :606-623)."""

import jax.numpy as jnp
import numpy as np

from pfilter_tpu.ops import voxel


def _random_points(rng, n, cap, scale=20.0):
    xyz = rng.uniform(-scale, scale, size=(cap, 3)).astype(np.float32)
    rg = rng.integers(0, 50, size=(cap, 2)).astype(np.float32)
    valid = np.zeros(cap, bool)
    valid[:n] = True
    return voxel.PointSet(jnp.array(xyz), jnp.array(rg), jnp.array(valid))


def _numpy_rgbds(xyz, rg, valid, leaf):
    """Direct transcription of rgbds: min-anchored voxel grid, per-voxel
    centroid + max r + max g, output sorted by voxel id."""
    pts = xyz[valid]
    prg = rg[valid]
    min_b = np.floor(pts.min(0) / leaf)
    max_b = np.floor(pts.max(0) / leaf)
    div = (max_b - min_b + 1).astype(np.int64)
    ijk = (np.floor(pts / leaf) - min_b).astype(np.int64)
    ids = ijk[:, 0] + div[0] * (ijk[:, 1] + div[1] * ijk[:, 2])
    out = {}
    for i, vid in enumerate(ids):
        out.setdefault(vid, []).append(i)
    rows = []
    for vid in sorted(out):
        sel = out[vid]
        rows.append(
            (pts[sel].mean(0), np.array([prg[sel, 0].max(), prg[sel, 1].max()]))
        )
    return rows


def test_voxel_downsample_matches_numpy():
    rng = np.random.default_rng(0)
    ps = _random_points(rng, 700, 1024, scale=10.0)
    leaf = 2.0
    out = voxel.voxel_downsample_rgbds(ps, leaf, out_cap=512)
    got_n = int(out.count)
    expect = _numpy_rgbds(np.asarray(ps.xyz), np.asarray(ps.rg), np.asarray(ps.valid), leaf)
    assert got_n == len(expect)
    got_xyz = np.asarray(out.xyz[:got_n])
    got_rg = np.asarray(out.rg[:got_n])
    for i, (c, m) in enumerate(expect):
        np.testing.assert_allclose(got_xyz[i], c, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got_rg[i], m, atol=1e-5)
    # compaction: valid slots first
    assert bool(np.all(np.asarray(out.valid[:got_n])))
    assert not bool(np.any(np.asarray(out.valid[got_n:])))


def test_voxel_downsample_empty():
    ps = voxel.empty_pointset(64)
    out = voxel.voxel_downsample_rgbds(ps, 1.0, out_cap=32)
    assert int(out.count) == 0


def test_crop_box():
    rng = np.random.default_rng(1)
    ps = _random_points(rng, 1000, 1024, scale=150.0)
    center = jnp.array([10.0, -5.0, 0.0])
    out = voxel.crop_box(ps, center, 100.0)
    inside = np.all(np.abs(np.asarray(ps.xyz) - np.asarray(center)) <= 100.0, -1)
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ps.valid) & inside)


def test_persistence_predicate():
    """Evict iff g < r*theta_p && r > k_new && g < theta_max+1 (ref :12-13)."""
    k_new, theta_p, theta_max = 0.0, 0.4, 75.0
    rg = jnp.array(
        [
            [10.0, 2.0],  # g=2 < 4=r*0.4, r>0, g<76 -> evict
            [10.0, 5.0],  # g=5 >= 4 -> keep
            [0.0, 0.0],  # r=0 not > k_new -> keep (fresh points survive)
            [255.0, 80.0],  # g=80 >= 76 -> keep (theta_max saturation)
            [255.0, 60.0],  # 60 < 102 and 60 < 76 -> evict
        ]
    )
    keep = voxel.persistence_keep(rg, k_new, theta_p, theta_max)
    np.testing.assert_array_equal(np.asarray(keep), [False, True, True, True, False])


def test_floam_mode_never_evicts():
    """Params (0,0,0) = FLOAM-equivalent mode (README.md:44): with theta_p=0,
    g < 0 never holds, so nothing is evicted."""
    rng = np.random.default_rng(2)
    rg = jnp.array(rng.integers(0, 256, size=(100, 2)).astype(np.float32))
    keep = voxel.persistence_keep(rg, 0.0, 0.0, 0.0)
    assert bool(jnp.all(keep))


def test_aging():
    ps = voxel.PointSet(
        xyz=jnp.zeros((4, 3)),
        rg=jnp.array([[0.0, 1.0], [248.0, 0.0], [251.0, 0.0], [255.0, 3.0]]),
        valid=jnp.array([True, True, True, True]),
    )
    out = voxel.age_points(ps)
    np.testing.assert_allclose(np.asarray(out.rg[:, 0]), [2.0, 250.0, 255.0, 255.0])
    np.testing.assert_allclose(np.asarray(out.rg[:, 1]), np.asarray(ps.rg[:, 1]))


def test_rgbds_counted_overflow():
    """Occupied voxels beyond out_cap must be counted, not silently dropped."""
    n = 100
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = np.arange(n) * 1.0 + 0.25  # 100 distinct 0.5 m voxels
    ps = voxel.PointSet(
        jnp.asarray(xyz), jnp.zeros((n, 2), jnp.float32), jnp.ones(n, bool)
    )
    out, dropped = voxel.voxel_downsample_rgbds_counted(ps, 0.5, out_cap=64)
    assert int(dropped) == 36
    assert int(out.valid.sum()) == 64
    # And zero when capacity suffices.
    _, dropped2 = voxel.voxel_downsample_rgbds_counted(ps, 0.5, out_cap=128)
    assert int(dropped2) == 0
