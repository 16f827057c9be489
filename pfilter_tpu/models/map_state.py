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
    if kind in ("beam", "pillar") and cap.bpf_line_tile_cap:
        tile_cap = cap.bpf_line_tile_cap
    elif kind == "facade" and cap.bpf_plane_tile_cap:
        tile_cap = cap.bpf_plane_tile_cap
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


def sort_queries_for_index(index, q_xyz_world, q_valid, cfg: PipelineConfig, kind: str):
    """Tile-sort a query cloud once per frame (tiled impl only; returns None
    for the grid impl).  GN outer iterations refine the pose by far less than
    the kernel's halo margin (>= 3 m for 4 m tiles vs the 1 m correspondence
    gate), so the sort computed at the *predicted* pose stays exact for every
    iteration — this replaces a per-iteration sort with a per-frame one."""
    if cfg.capacity.knn_impl != "tiled":
        return None
    nt, tc, _ = _tile_params(cfg, kind)
    return knn_tiled.sort_queries(q_xyz_world, q_valid, index.origin, nt, tc)


def query_index_presorted(index, sq_xyz_world, bounds, cfg: PipelineConfig, kind: str):
    """5-NN for queries already in tile-sorted order (results in the same
    order).  Only valid for the tiled impl."""
    cap = cfg.capacity
    nt, tc, tcap = _tile_params(cfg, kind)
    res = knn_tiled.query_tiled_sorted(
        index, sq_xyz_world, bounds, nt, tc, tcap, k=cap.knn_k, interpret=_interpret_mode()
    )
    return res.idx, res.sqdist


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
            k=cap.knn_k,
            interpret=_interpret_mode(),
        )
        return res.idx, res.sqdist
    res = knn.knn_query(index, q_xyz, q_valid, cap.knn_k, cap.knn_candidates_per_cell)
    return res.idx, res.sqdist


def map_capacity(cfg: PipelineConfig, kind: str) -> int:
    c = cfg.capacity
    if kind in ("beam", "pillar") and c.bpf_line_map_points:
        return c.bpf_line_map_points
    if kind == "facade" and c.bpf_plane_map_points:
        return c.bpf_plane_map_points
    return c.edge_map_points if is_line_kind(kind) else c.surf_map_points


def empty_index(cfg: PipelineConfig, kind: str, rg_width: int = 2):
    """``rg_width=3`` adds the provenance channel (diagnostics only): column 2
    carries a mover-origin bit, max-merged per voxel like the counters — the
    ground-truth contamination instrumentation for the persistence A/B."""
    capacity = map_capacity(cfg, kind)
    zeros = jnp.zeros((capacity, 3), jnp.float32)
    zrg = jnp.zeros((capacity, rg_width), jnp.float32)
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


def tile_overflow_count(index, cfg: PipelineConfig, kind: str) -> jnp.ndarray:
    """Exact kNN-truncation indicator for the tiled index: the kernel reads
    each query tile's halo as three contiguous 3-tile rows capped at
    ``w = 3 * tile_cap`` slots (ops/knn_tiled._halo_ranges) — candidates
    beyond the cap are silently unread.  This counts those unreadable slots
    over every (query tile, halo row) pair, so a steady 0 proves every kNN
    read was complete (VERDICT r1: fixed capacities must fail loudly)."""
    if cfg.capacity.knn_impl != "tiled":
        return jnp.asarray(0, jnp.int32)
    nt, _, tcap = _tile_params(cfg, kind)
    w = 3 * tcap
    ts = index.tile_start
    tids = jnp.arange(nt * nt, dtype=jnp.int32)
    tx, ty = tids // nt, tids % nt
    total = jnp.asarray(0, jnp.int32)
    for dr in (-1, 0, 1):
        row = jnp.clip(tx + dr, 0, nt - 1)
        lo = row * nt + jnp.clip(ty - 1, 0, nt - 1)
        hi = row * nt + jnp.clip(ty + 1, 0, nt - 1) + 1
        ln = ts[hi] - ts[lo]
        total = total + jnp.maximum(ln - w, 0).sum()
    return total


_FUSED_NZ = 1024  # z-voxel window (1024 * leaf meters, centered at the pose)


def _fused_merge_tiled(
    index,
    scan_xyz_world: jnp.ndarray,
    scan_rg: jnp.ndarray,
    scan_valid: jnp.ndarray,
    pose_t: jnp.ndarray,
    leaf: float,
    cfg: PipelineConfig,
    kind: str,
    capacity: int | None = None,
):
    """Fused map merge for the tiled index: ONE sort serves both the rgbds
    re-voxelization and the kNN tile layout.

    The sort key packs ``(tile_id, local_voxel_id)``: the voxel grid is
    anchored at the tile-window origin and ``leaf`` divides the tile size, so
    every voxel lies entirely inside one tile and ascending-key order is
    simultaneously (a) grouped by voxel for the segment reduce and (b)
    tile-major for the kNN kernel's slot ranges.  This replaces the unfused
    path's two full-map argsorts per frame (rgbds sort + tile re-sort,
    ref rgbds sort: src/odomEstimationClass.cpp:74) with one.

    Voxel boundaries are absolute multiples of ``leaf`` (the window origin is
    a multiple of the tile size, hence of ``leaf``), unlike the reference's
    cloud-min-anchored rgbds — a deliberate divergence that also removes
    frame-to-frame re-quantization jitter.
    """
    o = cfg.odometry
    nt, tc, _ = _tile_params(cfg, kind)
    if capacity is None:
        capacity = map_capacity(cfg, kind)
    ts = float(tc)
    nvx = int(round(ts / leaf))
    if abs(nvx * leaf - ts) > 1e-6:
        raise ValueError(f"leaf {leaf} must divide tile size {ts}")
    nz = _FUSED_NZ
    if (nt * nt) * nvx * nvx * nz >= 2**31:
        raise ValueError("fused merge key exceeds int32")

    origin = knn_tiled.tile_origin_for_pose(pose_t, nt, tc)

    xyz = jnp.concatenate([index.xyz, scan_xyz_world], axis=0)
    rg = jnp.concatenate([index.rg, scan_rg], axis=0)
    valid = jnp.concatenate([index.valid, scan_valid], axis=0)
    # Crop (ref: src/odomEstimationClass.cpp:606-623).  The crop radius is
    # strictly inside the tile window, so tile clipping below never binds.
    valid = valid & jnp.all(jnp.abs(xyz - pose_t) <= o.crop_half_extent, axis=-1)

    rel = xyz[:, :2] - origin[:2]
    t2 = jnp.clip(jnp.floor(rel / ts).astype(jnp.int32), 1, nt - 2)
    tid = t2[:, 0] * nt + t2[:, 1]
    # In exact arithmetic lxy is in [0, nvx); fp rounding near a shared
    # tile/voxel boundary can push it one off — clip (the point lands in the
    # boundary voxel of its tile; sub-leaf misplacement, no key collision).
    lxy = jnp.clip(jnp.floor(rel / leaf).astype(jnp.int32) - t2 * nvx, 0, nvx - 1)
    # z window origin snapped to the leaf grid so z voxel boundaries are
    # absolute multiples of leaf (like x/y) — otherwise a raw pose_t[2]
    # anchor would re-quantize the map in z every frame, destabilizing the
    # voxel identities the persistence r/g counters depend on.
    zmin = jnp.floor(pose_t[2] / leaf) * leaf - nz * leaf / 2.0
    lz = jnp.clip(
        jnp.floor((xyz[:, 2] - zmin) / leaf).astype(jnp.int32),
        0,
        nz - 1,
    )
    key = ((tid * nvx + lxy[:, 0]) * nvx + lxy[:, 1]) * nz + lz
    key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)

    order = jnp.argsort(key)
    skey = key[order]
    sxyz = xyz[order]
    srg = rg[order]
    sval = valid[order]

    head = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    n_occupied = jnp.max(jnp.where(sval, seg, -1)) + 1
    n_dropped = jnp.maximum(n_occupied - capacity, 0)
    seg = jnp.where(sval, seg, capacity)

    ones = sval.astype(jnp.float32)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=capacity, indices_are_sorted=True)
    sums = jax.ops.segment_sum(
        sxyz * ones[:, None], seg, num_segments=capacity, indices_are_sorted=True
    )
    rg_max = jax.ops.segment_max(
        jnp.where(sval[:, None], srg, -jnp.inf),
        seg,
        num_segments=capacity,
        indices_are_sorted=True,
    )
    key_min = jax.ops.segment_min(
        jnp.where(sval, skey, jnp.iinfo(jnp.int32).max),
        seg,
        num_segments=capacity,
        indices_are_sorted=True,
    )
    occupied = cnt > 0
    centroid = sums / jnp.maximum(cnt, 1.0)[:, None]
    out_rg = jnp.where(occupied[:, None], rg_max, 0.0)

    # Persistence eviction + aging (ref: :631-646).
    keep = voxel.persistence_keep(out_rg, o.k_new, o.theta_p, o.theta_max)
    out_valid = occupied & keep
    r = out_rg[:, 0]
    r = jnp.where(r > o.counter_cap - 5.0, o.counter_cap, r + o.aging_increment)
    out_rg = out_rg.at[:, 0].set(jnp.where(out_valid, r, out_rg[:, 0]))

    # Tile ranges straight from the keys: outputs are ascending-key, hence
    # ascending-tile; empty slots get the one-past-last tile id.
    out_tid = jnp.where(occupied, key_min // (nvx * nvx * nz), nt * nt)
    tile_start = jnp.searchsorted(
        out_tid, jnp.arange(nt * nt + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    # Kernel-side transposed copy: evicted/empty slots pushed to FAR so they
    # can never win a kNN race (they still occupy slot ranges — harmless).
    tile_cap = _tile_params(cfg, kind)[2]
    pad = 3 * tile_cap + knn_tiled._ALIGN
    xyz_t = jnp.full((4, capacity + pad), knn_tiled._FAR, jnp.float32)
    xyz_t = xyz_t.at[:3, :capacity].set(
        jnp.where(out_valid[None, :], centroid.T, knn_tiled._FAR)
    )
    xyz_t = xyz_t.at[3, :].set(0.0)
    return (
        knn_tiled.TiledMap(
            xyz=centroid,
            rg=out_rg,
            valid=out_valid,
            xyz_t=xyz_t,
            tile_start=tile_start,
            origin=origin,
        ),
        n_dropped,
    )


def merge_scan_into_index(
    index,
    scan_xyz_world: jnp.ndarray,
    scan_rg: jnp.ndarray,
    scan_valid: jnp.ndarray,
    pose_t: jnp.ndarray,
    leaf: float,
    cfg: PipelineConfig,
    kind: str,
    capacity: int | None = None,
):
    """Per-frame map update against either index type (ref ``addPointsToMap``,
    src/odomEstimationClass.cpp:589-647): append the pose-transformed scan,
    crop +-100 m, rgbds re-voxelize (centroid + max r/g), evict, age, re-sort.

    ``capacity`` overrides the config map capacity (used by the sharded path,
    whose per-shard maps hold capacity // n_map points each).

    Returns ``(index, n_voxel_dropped)`` — the count of occupied voxels that
    exceeded the map capacity and were silently dropped (overflow counter)."""
    o = cfg.odometry
    if cfg.capacity.knn_impl == "tiled":
        return _fused_merge_tiled(
            index, scan_xyz_world, scan_rg, scan_valid, pose_t, leaf, cfg, kind,
            capacity=capacity,
        )
    if capacity is None:
        capacity = map_capacity(cfg, kind)
    combined = voxel.concat_pointsets(
        voxel.PointSet(xyz=index.xyz, rg=index.rg, valid=index.valid),
        voxel.PointSet(xyz=scan_xyz_world, rg=scan_rg, valid=scan_valid),
    )
    combined = voxel.crop_box(combined, pose_t, o.crop_half_extent)
    ds, n_dropped = voxel.voxel_downsample_rgbds_counted(combined, leaf, out_cap=capacity)
    ds = voxel.evict_unstable(ds, o.k_new, o.theta_p, o.theta_max)
    ds = voxel.age_points(ds, o.aging_increment, o.counter_cap)
    return build_index(ds.xyz, ds.rg, ds.valid, pose_t, cfg, kind), n_dropped


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
