"""Fused tiled map merge vs the unfused reference path.

The fused merge (models.map_state._fused_merge_tiled) must produce the same
*set* of surviving voxels (centroid, max-r/g, eviction, aging) as running the
unfused chain — crop -> rgbds (absolute-anchored) -> evict -> age — followed
by the tile sort, because the only intended change is fusing the two sorts
into one combined (tile, voxel) key.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pfilter_tpu.config import PipelineConfig, CapacityConfig, OdometryConfig
from pfilter_tpu.models import map_state
from pfilter_tpu.ops import knn_tiled, voxel


def _cfg():
    return PipelineConfig(
        odometry=OdometryConfig(k_new=0.0, theta_p=0.4, theta_max=75.0, map_resolution=0.4),
        capacity=CapacityConfig(
            edge_map_points=4096,
            surf_map_points=8192,
            edge_tile_cap=128,
            surf_tile_cap=128,
        ),
    )


def _snap(pts, leaf, rng):
    """Snap points near voxel centers so fp rounding at voxel/tile boundaries
    cannot flip voxel assignment between the two id computations under test
    (the fused path quantizes (x - origin)/leaf, the reference x/leaf; both
    are exact away from boundaries)."""
    centers = (np.floor(pts / leaf) + 0.5) * leaf
    return (centers + rng.uniform(-0.2, 0.2, pts.shape) * leaf).astype(np.float32)


def _random_map(cfg, kind, n, seed, leaf):
    rng = np.random.default_rng(seed)
    cap = map_state.map_capacity(cfg, kind)
    xyz = np.zeros((cap, 3), np.float32)
    rg = np.zeros((cap, 2), np.float32)
    valid = np.zeros(cap, bool)
    pts = rng.uniform(-40, 40, (n, 3))
    pts[:, 2] = rng.uniform(-3, 8, n)
    xyz[:n] = _snap(pts, leaf, rng)
    rg[:n, 0] = rng.integers(0, 30, n)
    rg[:n, 1] = rng.integers(0, 30, n)
    valid[:n] = True
    return jnp.asarray(xyz), jnp.asarray(rg), jnp.asarray(valid)


def _unfused(index, scan_xyz, scan_rg, scan_valid, pose_t, leaf, cfg, kind):
    """The pre-fusion semantics with the same absolute voxel anchoring."""
    o = cfg.odometry
    capacity = map_state.map_capacity(cfg, kind)
    nt, tc, _ = map_state._tile_params(cfg, kind)
    origin = knn_tiled.tile_origin_for_pose(pose_t, nt, tc)
    combined = voxel.concat_pointsets(
        voxel.PointSet(xyz=index.xyz, rg=index.rg, valid=index.valid),
        voxel.PointSet(xyz=scan_xyz, rg=scan_rg, valid=scan_valid),
    )
    combined = voxel.crop_box(combined, pose_t, o.crop_half_extent)
    # Absolute anchoring: anchor_t such that boundaries are multiples of leaf
    # (voxel_ids_anchored uses floor(xyz/leaf) absolute boundaries).
    ds = voxel.voxel_downsample_rgbds(combined, leaf, out_cap=capacity, anchor_t=pose_t)
    ds = voxel.evict_unstable(ds, o.k_new, o.theta_p, o.theta_max)
    ds = voxel.age_points(ds, o.aging_increment, o.counter_cap)
    return ds


def _as_set(xyz, rg, valid, leaf):
    keys = {}
    xyz, rg, valid = np.asarray(xyz), np.asarray(rg), np.asarray(valid)
    for i in np.nonzero(valid)[0]:
        k = tuple(np.floor(xyz[i] / leaf).astype(int))
        keys[k] = (xyz[i], rg[i])
    return keys


@pytest.mark.parametrize("kind,leaf_mult", [("edge", 1.0), ("surf", 2.0)])
def test_fused_merge_matches_unfused(kind, leaf_mult):
    cfg = _cfg()
    leaf = cfg.odometry.map_resolution * leaf_mult
    pose_t = jnp.asarray([3.3, -1.2, 0.7], jnp.float32)

    mx, mrg, mv = _random_map(cfg, kind, 1500, seed=1, leaf=leaf)
    index = map_state.build_index(mx, mrg, mv, pose_t, cfg, kind)

    rng = np.random.default_rng(2)
    ns = 800
    sx = jnp.asarray(_snap(rng.uniform(-35, 35, (ns, 3)), leaf, rng))
    srg = jnp.asarray(
        np.stack([rng.integers(0, 20, ns), rng.integers(0, 20, ns)], -1).astype(np.float32)
    )
    sv = jnp.asarray(rng.uniform(size=ns) < 0.9)

    fused, n_drop = map_state.merge_scan_into_index(index, sx, srg, sv, pose_t, leaf, cfg, kind)
    assert int(n_drop) == 0
    ref = _unfused(index, sx, srg, sv, pose_t, leaf, cfg, kind)

    got = _as_set(fused.xyz, fused.rg, fused.valid, leaf)
    want = _as_set(ref.xyz, ref.rg, ref.valid, leaf)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k][0], want[k][0], atol=1e-4)
        np.testing.assert_allclose(got[k][1], want[k][1], atol=1e-5)

    # Tile ranges must describe the fused output's layout exactly.
    nt, tc, _ = map_state._tile_params(cfg, kind)
    tid = np.asarray(
        knn_tiled._tile_ids(fused.xyz, fused.valid, fused.origin, nt, tc)
    )
    ts = np.asarray(fused.tile_start)
    for i in np.nonzero(np.asarray(fused.valid))[0]:
        t = tid[i]
        assert ts[t] <= i < ts[t + 1]


def test_fused_merge_eviction_and_aging():
    cfg = _cfg()
    leaf = cfg.odometry.map_resolution
    pose_t = jnp.zeros(3, jnp.float32)
    cap = map_state.map_capacity(cfg, "edge")

    xyz = np.zeros((cap, 3), np.float32)
    rg = np.zeros((cap, 2), np.float32)
    valid = np.zeros(cap, bool)
    # Point A: persistent (g high). Point B: evictable (r=10, g=1 < 10*0.4).
    xyz[0] = (1.0, 1.0, 1.0)
    rg[0] = (10.0, 50.0)
    xyz[1] = (5.0, 5.0, 1.0)
    rg[1] = (10.0, 1.0)
    valid[:2] = True
    index = map_state.build_index(
        jnp.asarray(xyz), jnp.asarray(rg), jnp.asarray(valid), pose_t, cfg, "edge"
    )
    empty_scan = jnp.zeros((4, 3), jnp.float32)
    merged, _ = map_state.merge_scan_into_index(
        index,
        empty_scan,
        jnp.zeros((4, 2), jnp.float32),
        jnp.zeros(4, bool),
        pose_t,
        leaf,
        cfg,
        "edge",
    )
    got = _as_set(merged.xyz, merged.rg, merged.valid, leaf)
    assert len(got) == 1  # B evicted
    (k,) = got
    np.testing.assert_allclose(got[k][0], [1.0, 1.0, 1.0], atol=1e-5)
    # aging: r 10 -> 12
    np.testing.assert_allclose(got[k][1], [12.0, 50.0], atol=1e-6)
