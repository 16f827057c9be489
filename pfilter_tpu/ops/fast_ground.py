"""Fast ground filter — TPU-native form of ``groundSeg::fast_ground_filter``
(ref: src/preProcess.cpp:56-346).

The reference's variant of ground segmentation adds, over the simple
``ground_seg`` (ops/ground.py):

- an approximate mean height prefilter: points above
  ``mean_z + max_ground_height`` skip the grid entirely and go straight to
  the non-ground cloud (ref: :140-156),
- per-grid reliability gating: a grid participates only with
  ``>= min_grid_pt_num`` points and ``>= reliable_neighbor_grid_num_thre``
  well-populated 3x3 neighbors (ref: :212),
- distance-weighted stochastic downsampling: per-grid keep rates scale with
  ``standard_distance / dist(grid)`` linearly or quadratically, so far
  (sparse) regions keep everything and near (dense) regions thin out
  (ref: :139-151, :214-226),
- height-above-ground annotation per non-ground point (ref: :259, :276),
- ground normal estimation, 4 methods (ref: :296-321).

TPU redesign: the per-point ``j % rate == 0`` subsampling becomes a
rank-within-grid stride (one sort by grid id yields the ranks — the same
sorted layout every other kernel here uses), grid reductions are
``segment_min``/``segment_sum`` over the sorted ids, and the 3x3 neighbor
pass is a reshape + shifted-min.  Divergences (all documented):

- the grid's distance-to-station uses the grid's *minimum* point distance
  (deterministic) instead of the first point in scan order (ref: :135),
- normal method 2 (k-nearest PCA) and method 3 (per-grid RANSAC plane) both
  become the per-grid total-least-squares plane normal (closed-form 3x3
  eigensolver over the grid's ground points): RANSAC's robustness role is
  already covered by the height gates, and a fixed-radius/grid neighborhood
  is the TPU-native neighbor set.  Method 1 (radius PCA) uses the same
  per-grid covariance (radius ~ grid_resolution).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pfilter_tpu.config import FastGroundConfig
from pfilter_tpu.ops import eig3

_INVALID = jnp.iinfo(jnp.int32).max


class FastGroundResult(NamedTuple):
    ground_mask: jnp.ndarray  # [N] kept ground points (downsampled)
    ground_down_mask: jnp.ndarray  # [N] further-downsampled ground subset
    nonground_mask: jnp.ndarray  # [N] kept non-ground points (downsampled)
    normal: jnp.ndarray  # [N, 3] ground normal per point (0 for non-ground)
    height_above_ground: jnp.ndarray  # [N] z - grid min_z (non-ground points)


def fast_ground_filter(
    xyz: jnp.ndarray, valid: jnp.ndarray, cfg: FastGroundConfig
) -> FastGroundResult:
    n = xyz.shape[0]
    g = cfg.num_cells
    res = cfg.grid_resolution

    # Approximate mean height from every 100th point (ref: :90-99).
    probe = (jnp.arange(n) % 100) == 0
    pm = probe & valid
    mean_z = jnp.sum(jnp.where(pm, xyz[:, 2], 0.0)) / jnp.maximum(pm.sum(), 1)
    high_thre = mean_z + cfg.max_ground_height

    # Grid ids on a fixed window centered at the (masked) centroid.
    cnt = jnp.maximum(valid.sum(), 1)
    center = jnp.sum(jnp.where(valid[:, None], xyz, 0.0), axis=0) / cnt
    origin = jnp.floor(center[:2] / res) * res - (g // 2) * res
    cxy = jnp.clip(jnp.floor((xyz[:, :2] - origin) / res).astype(jnp.int32), 1, g - 2)
    gid = cxy[:, 0] * g + cxy[:, 1]

    high = valid & (xyz[:, 2] > high_thre)
    binned = valid & ~high
    gid_b = jnp.where(binned, gid, _INVALID)

    # Per-grid reductions over the sorted layout.
    order = jnp.argsort(gid_b)
    sgid = gid_b[order]
    sz = xyz[order, 2]
    sval = sgid != _INVALID
    seg = jnp.where(sval, sgid, g * g)
    big = jnp.float32(3.0e38)
    min_z = jax.ops.segment_min(
        jnp.where(sval, sz, big), seg, num_segments=g * g, indices_are_sorted=False
    )
    pts_count = jax.ops.segment_sum(
        sval.astype(jnp.int32), seg, num_segments=g * g, indices_are_sorted=False
    )
    dist = jnp.linalg.norm(xyz, axis=-1)
    dist_grid = jax.ops.segment_min(
        jnp.where(sval, dist[order], big), seg, num_segments=g * g, indices_are_sorted=False
    )

    # Rank within grid (the reference's j index into grid.point_id).
    head = jnp.concatenate([jnp.ones(1, bool), sgid[1:] != sgid[:-1]])
    first_of_run = jnp.where(head, jnp.arange(n), 0)
    run_start = jax.lax.associative_scan(jnp.maximum, first_of_run)
    rank_sorted = jnp.arange(n) - run_start
    rank = jnp.zeros(n, jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))

    # 3x3 neighbor pass (ref: :170-186).
    mz2 = min_z.reshape(g, g)
    cnt2 = pts_count.reshape(g, g)
    pad_mz = jnp.pad(mz2, 1, constant_values=big)
    pad_rel = jnp.pad(cnt2 >= cfg.min_grid_pt_num, 1, constant_values=False)
    neigh_min = jnp.full((g, g), big)
    reliable = jnp.zeros((g, g), jnp.int32)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            neigh_min = jnp.minimum(neigh_min, pad_mz[1 + dr : 1 + dr + g, 1 + dc : 1 + dc + g])
            reliable = reliable + pad_rel[1 + dr : 1 + dr + g, 1 + dc : 1 + dc + g]
    neigh_min = neigh_min.reshape(-1)
    reliable = reliable.reshape(-1)

    # Distance-weighted keep rates (ref: :214-226): rate = dw^p * base + 1.
    dw = cfg.standard_distance / (dist_grid + 1e-4)
    p = cfg.distance_weight_method
    if p == 0:
        g_rate = jnp.full(g * g, cfg.ground_down_rate, jnp.int32)
        ng_rate = jnp.full(g * g, cfg.nonground_down_rate, jnp.int32)
    else:
        w = dw if p == 1 else dw * dw
        g_rate = (w * cfg.ground_down_rate + 1.0).astype(jnp.int32)
        ng_rate = (w * cfg.nonground_down_rate + 1.0).astype(jnp.int32)
    g_rate = jnp.maximum(g_rate, 1)
    ng_rate = jnp.maximum(ng_rate, 1)

    # Per-point classification (ref: :228-283).
    gmin = min_z[gid]
    gneigh = neigh_min[gid]
    grid_ok = (pts_count[gid] >= cfg.min_grid_pt_num) & (
        reliable[gid] >= cfg.reliable_neighbor_thre
    )
    grid_is_ground = (gmin - gneigh) < cfg.neighbor_height_diff
    near_floor = (xyz[:, 2] - gmin) < cfg.max_height_difference

    keep_g = (rank % g_rate[gid]) == 0
    keep_ng = (rank % ng_rate[gid]) == 0

    ground_mask = binned & grid_ok & grid_is_ground & near_floor & keep_g
    nong_inner = binned & grid_ok & grid_is_ground & ~near_floor & keep_ng
    nong_grid = binned & grid_ok & ~grid_is_ground & keep_ng
    nonground_mask = high | nong_inner | nong_grid

    hag = jnp.where(
        high,
        xyz[:, 2] - (mean_z - 3.0),  # ref: :153
        jnp.where(nong_grid, xyz[:, 2] - gneigh, xyz[:, 2] - gmin),
    )
    hag = jnp.where(nonground_mask, hag, 0.0)

    # Ground normals (ref: :296-321).  Methods 1/2/3 -> per-grid TLS plane.
    if cfg.normal_method == 0:
        normal = jnp.where(
            ground_mask[:, None],
            jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3)),
            0.0,
        )
    else:
        gm_sorted = ground_mask[order]
        w_ = gm_sorted.astype(jnp.float32)
        sxyz = xyz[order]
        s1 = jax.ops.segment_sum(w_, seg, num_segments=g * g)
        sx = jax.ops.segment_sum(sxyz * w_[:, None], seg, num_segments=g * g)
        sxx = jax.ops.segment_sum(
            (sxyz[:, :, None] * sxyz[:, None, :]) * w_[:, None, None],
            seg,
            num_segments=g * g,
        )
        mean = sx / jnp.maximum(s1, 1.0)[:, None]
        cov = sxx - s1[:, None, None] * mean[:, None, :] * mean[:, :, None]
        _, nrm = eig3.eigh3_smallest(cov)
        nrm = jnp.where(nrm[:, 2:3] < 0, -nrm, nrm)  # orient +z
        enough = s1 >= 3.0
        nrm = jnp.where(
            enough[:, None], nrm, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (g * g, 3))
        )
        normal = jnp.where(ground_mask[:, None], nrm[gid], 0.0)

    # Down-down sampling of the ground set (ref: :303-317): every
    # ground_down_down_rate-th kept ground point by rank, or a fixed count.
    if cfg.fixed_num_downsampling:
        gm_sorted = ground_mask[order]
        grank_sorted = jnp.cumsum(gm_sorted.astype(jnp.int32)) - 1
        grank = jnp.zeros(n, jnp.int32).at[order].set(grank_sorted)
        total = ground_mask.sum()
        stride = jnp.maximum(total // jnp.maximum(cfg.down_fixed_num, 1), 1)
        ground_down = ground_mask & ((grank % stride) == 0)
    else:
        ground_down = ground_mask & ((rank % (g_rate[gid] * cfg.ground_down_down_rate)) == 0)

    return FastGroundResult(
        ground_mask=ground_mask,
        ground_down_mask=ground_down,
        nonground_mask=nonground_mask,
        normal=normal,
        height_above_ground=hag,
    )
