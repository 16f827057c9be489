"""Persistent feature-map state: the voxel-block map with persistence counters.

The reference keeps each feature map as a growing ``pcl::PointCloud<PointXYZRGB>``
whose r/g color channels store the persistence counters, re-voxelized and
filtered every frame (ref: src/odomEstimationClass.cpp:589-647).  Here a map
is a fixed-capacity :class:`~pfilter_tpu.ops.knn.HashGrid` — point coords,
(r, g) counters, validity mask — kept sorted by spatial cell id so the same
structure serves kNN queries, voxel downsampling and eviction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pfilter_tpu.config import CapacityConfig, OdometryConfig, PipelineConfig
from pfilter_tpu.ops import knn, knn_tiled, voxel


# ---------------------------------------------------------------------------
# Map-index abstraction: "tiled" (Pallas brute-force tiles) or "grid"
# (XLA searchsorted voxel grid).  Both index types expose .xyz/.rg/.valid.
# ---------------------------------------------------------------------------


# Feature channels: ES mode has edge/surf; BPF mode has beam/pillar (line
# geometry, edge-like caps) and facade (plane geometry, surf-like caps) —
# ref: include/odomEstimationClass.h:169-205.
LINE_KINDS = ("edge", "beam", "pillar")
PLANE_KINDS = ("surf", "facade")


def is_line_kind(kind: str) -> bool:
    if kind in LINE_KINDS:
        return True
    if kind in PLANE_KINDS:
        return False
    raise ValueError(f"unknown feature kind {kind}")


def _tile_params(cfg: PipelineConfig, kind: str):
    cap = cfg.capacity
    tile_cap = cap.edge_tile_cap if is_line_kind(kind) else cap.surf_tile_cap
    return cap.knn_tiles, cap.tile_cells, tile_cap


def _interpret_mode() -> bool:
    """Pallas interpret mode on CPU (tests / debugging)."""
    return jax.default_backend() == "cpu"


def build_index(xyz, rg, valid, pose_t, cfg: PipelineConfig, kind: str):
    """Build the per-frame spatial index over map points (replaces the
    reference's per-frame KD-tree rebuild, src/odomEstimationClass.cpp:249-250)."""
    if cfg.capacity.knn_impl == "tiled":
        nt, tc, tcap = _tile_params(cfg, kind)
        origin = knn_tiled.tile_origin_for_pose(pose_t, nt, tc)
        return knn_tiled.build_tiled(xyz, rg, valid, origin, nt, tc, tcap)
    cell = cfg.capacity.knn_cell_size
    origin = knn.grid_origin_for_pose(pose_t, cell)
    return knn.build_grid(xyz, rg, valid, origin, cell)


def query_index(index, q_xyz, q_valid, cfg: PipelineConfig, kind: str):
    """5-NN of each query against the index; returns (idx [Q,5], sqdist [Q,5])."""
    cap = cfg.capacity
    if cfg.capacity.knn_impl == "tiled":
        nt, tc, tcap = _tile_params(cfg, kind)
        res = knn_tiled.query_tiled(
            index,
            q_xyz,
            q_valid,
            nt,
            tc,
            tcap,
            tqc=cap.tile_query_cap,
            k=cap.knn_k,
            interpret=_interpret_mode(),
        )
        return res.idx, res.sqdist
    res = knn.knn_query(index, q_xyz, q_valid, cap.knn_k, cap.knn_candidates_per_cell)
    return res.idx, res.sqdist


def map_capacity(cfg: PipelineConfig, kind: str) -> int:
    return cfg.capacity.edge_map_points if is_line_kind(kind) else cfg.capacity.surf_map_points


def empty_index(cfg: PipelineConfig, kind: str):
    capacity = map_capacity(cfg, kind)
    zeros = jnp.zeros((capacity, 3), jnp.float32)
    zrg = jnp.zeros((capacity, 2), jnp.float32)
    invalid = jnp.zeros(capacity, bool)
    return build_index(zeros, zrg, invalid, jnp.zeros(3, jnp.float32), cfg, kind)


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


def merge_scan_into_index(
    index,
    scan_xyz_world: jnp.ndarray,
    scan_rg: jnp.ndarray,
    scan_valid: jnp.ndarray,
    pose_t: jnp.ndarray,
    leaf: float,
    cfg: PipelineConfig,
    kind: str,
):
    """Per-frame map update against either index type (ref ``addPointsToMap``,
    src/odomEstimationClass.cpp:589-647): append the pose-transformed scan,
    crop +-100 m, rgbds re-voxelize (centroid + max r/g), evict, age, re-sort."""
    o = cfg.odometry
    capacity = map_capacity(cfg, kind)
    combined = voxel.concat_pointsets(
        voxel.PointSet(xyz=index.xyz, rg=index.rg, valid=index.valid),
        voxel.PointSet(xyz=scan_xyz_world, rg=scan_rg, valid=scan_valid),
    )
    combined = voxel.crop_box(combined, pose_t, o.crop_half_extent)
    ds = voxel.voxel_downsample_rgbds(combined, leaf, out_cap=capacity)
    ds = voxel.evict_unstable(ds, o.k_new, o.theta_p, o.theta_max)
    ds = voxel.age_points(ds, o.aging_increment, o.counter_cap)
    return build_index(ds.xyz, ds.rg, ds.valid, pose_t, cfg, kind)


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
