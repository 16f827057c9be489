"""Persistent feature-map state: the voxel-block map with persistence counters.

The reference keeps each feature map as a growing ``pcl::PointCloud<PointXYZRGB>``
whose r/g color channels store the persistence counters, re-voxelized and
filtered every frame (ref: src/odomEstimationClass.cpp:589-647).  Here a map
is a fixed-capacity :class:`~pfilter_tpu.ops.knn.HashGrid` — point coords,
(r, g) counters, validity mask — kept sorted by spatial cell id so the same
structure serves kNN queries, voxel downsampling and eviction.
"""

from __future__ import annotations

import jax.numpy as jnp

from pfilter_tpu.config import CapacityConfig, OdometryConfig
from pfilter_tpu.ops import knn, voxel


def empty_map(capacity: int, cell_size: float) -> knn.HashGrid:
    return knn.HashGrid(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        rg=jnp.zeros((capacity, 2), jnp.float32),
        valid=jnp.zeros(capacity, bool),
        cell_ids=jnp.full(capacity, jnp.iinfo(jnp.int32).max, jnp.int32),
        origin=knn.grid_origin_for_pose(jnp.zeros(3), cell_size),
        cell_size=jnp.asarray(cell_size, jnp.float32),
    )


def map_from_points(
    xyz: jnp.ndarray,
    rg: jnp.ndarray,
    valid: jnp.ndarray,
    pose_t: jnp.ndarray,
    capacity: int,
    cell_size: float,
) -> knn.HashGrid:
    """Initialize a map from raw feature points (ref ``initMapWithPoints``,
    src/odomEstimationClass.cpp:217-222 — no downsampling, no filtering)."""
    n = xyz.shape[0]
    if n > capacity:
        raise ValueError(f"init cloud ({n}) exceeds map capacity ({capacity})")
    pad = capacity - n
    xyz = jnp.pad(xyz, ((0, pad), (0, 0)))
    rg = jnp.pad(rg, ((0, pad), (0, 0)))
    valid = jnp.pad(valid, (0, pad))
    origin = knn.grid_origin_for_pose(pose_t, cell_size)
    return knn.build_grid(xyz, rg, valid, origin, cell_size)


def merge_scan_into_map(
    grid: knn.HashGrid,
    scan_xyz_world: jnp.ndarray,
    scan_rg: jnp.ndarray,
    scan_valid: jnp.ndarray,
    pose_t: jnp.ndarray,
    leaf: float,
    ocfg: OdometryConfig,
    capacity: int,
    cell_size: float,
) -> knn.HashGrid:
    """Per-frame map update (ref ``addPointsToMap``,
    src/odomEstimationClass.cpp:589-647): append the pose-transformed scan,
    crop +-100 m around the pose, rgbds re-voxelize (centroid + max r/g),
    evict non-persistent points, age survivors (r += 2), and re-sort into the
    kNN grid layout anchored at the new pose."""
    combined = voxel.concat_pointsets(
        voxel.PointSet(xyz=grid.xyz, rg=grid.rg, valid=grid.valid),
        voxel.PointSet(xyz=scan_xyz_world, rg=scan_rg, valid=scan_valid),
    )
    combined = voxel.crop_box(combined, pose_t, ocfg.crop_half_extent)
    ds = voxel.voxel_downsample_rgbds(combined, leaf, out_cap=capacity)
    ds = voxel.evict_unstable(ds, ocfg.k_new, ocfg.theta_p, ocfg.theta_max)
    ds = voxel.age_points(ds, ocfg.aging_increment, ocfg.counter_cap)
    origin = knn.grid_origin_for_pose(pose_t, cell_size)
    return knn.build_grid(ds.xyz, ds.rg, ds.valid, origin, cell_size)
