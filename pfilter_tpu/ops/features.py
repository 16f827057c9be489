"""Ring-based edge/surf feature extraction — TPU-native form of the
reference's ``LaserProcessingClass`` (ref: src/laserProcessingClass.cpp:10-209).

The reference splits the cloud into scan rings by vertical angle, computes an
11-point curvature per ring point, splits each ring into 6 azimuth sectors,
sorts each sector by curvature, then *sequentially* picks the <=20 largest
(curvature > 0.1) with +-5-neighbor non-max suppression that stops at gaps
> 0.05 m^2; every unpicked curvature point becomes a surf point.

TPU redesign (no sorts-of-structs, no sequential scans over points):

1. points are stably sorted by ring id into a dense ``[rings, ring_cap]``
   grid (original azimuth order preserved within each ring),
2. curvature is an 11-tap window sum (vectorized shifts, VPU-friendly),
3. the sequential pick-and-suppress loop becomes 20 iterations of *masked
   argmax per (ring, sector)* — mathematically the same selection order as
   the reference's sort-then-scan, because each iteration picks the current
   maximum among unsuppressed candidates,
4. suppression ranges are precomputed reach counts (how far the <=0.05 m^2
   gap chain extends left/right of each point), so suppressing a pick is a
   data-parallel range mask, and is clipped to the pick's own sector
   (the reference's ``picked_points`` is local to each sector call).

Known deliberate divergences from the reference (validated on drift, not
bit-exactness — SURVEY.md §7f): sector boundaries cover every curvature point
(the reference's iterator arithmetic drops one point per sector,
src/laserProcessingClass.cpp:82-88), and fp argmax tie-breaking differs from
std::sort ordering.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pfilter_tpu.config import CapacityConfig, FeatureConfig, LidarConfig


class RingGrid(NamedTuple):
    """Scan points laid out densely by (ring, azimuth rank)."""

    xyz: jnp.ndarray  # [R, C, 3]
    valid: jnp.ndarray  # [R, C] bool
    length: jnp.ndarray  # [R] int32 — number of valid points in each ring


class FeatureResult(NamedTuple):
    """Edge/surf feature masks over the flattened ring grid."""

    xyz: jnp.ndarray  # [R*C, 3]
    edge_mask: jnp.ndarray  # [R*C] bool
    surf_mask: jnp.ndarray  # [R*C] bool
    curvature: jnp.ndarray  # [R*C] float32 (for tests/diagnostics)
    ring: jnp.ndarray  # [R*C] int32


def ring_ids(xyz: jnp.ndarray, mask: jnp.ndarray, lidar: LidarConfig):
    """Vertical-angle ring assignment (ref: src/laserProcessingClass.cpp:22-64).

    Returns (ring [N] int32, valid [N] bool).  Implements the reference's
    16/32/64-beam formulas; points outside the distance gate or ring range
    are invalid.
    """
    n = lidar.num_lines
    dist = jnp.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    in_range = (dist >= lidar.min_distance) & (dist <= lidar.max_distance)
    angle = jnp.degrees(jnp.arctan2(xyz[:, 2], dist))

    if n == 16:
        ring = ((angle + 15.0) / 2.0 + 0.5).astype(jnp.int32)
        ok = (ring >= 0) & (ring <= n - 1)
    elif n == 32:
        ring = ((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(jnp.int32)
        ok = (ring >= 0) & (ring <= n - 1)
    elif n == 64:
        upper = ((2.0 - angle) * 3.0 + 0.5).astype(jnp.int32)
        lower = n // 2 + ((-8.83 - angle) * 2.0 + 0.5).astype(jnp.int32)
        ring = jnp.where(angle >= -8.83, upper, lower)
        ok = (angle <= 2.0) & (angle >= -24.33) & (ring >= 0) & (ring <= 63)
    else:
        raise ValueError(f"unsupported num_lines={n} (reference supports 16/32/64)")

    valid = mask & in_range & ok
    return jnp.where(valid, ring, n).astype(jnp.int32), valid


def bin_rings(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    lidar: LidarConfig,
    cap: CapacityConfig,
) -> RingGrid:
    """Scatter points into a dense [rings, ring_cap] grid, preserving the
    original (azimuth) order within each ring via a stable sort."""
    R, C = lidar.num_lines, cap.ring_points
    ring, valid = ring_ids(xyz, mask, lidar)

    order = jnp.argsort(ring, stable=True)  # invalid (ring == R) sort last
    sorted_ring = ring[order]
    sorted_xyz = xyz[order]
    n_pts = xyz.shape[0]

    # Dense grid by GATHER, not scatter: ring r's points occupy the sorted
    # array's contiguous run [ring_start[r], ring_start[r+1]), so slot
    # (r, c) simply reads sorted row ring_start[r] + c.  Gathers are cheap
    # on TPU; the scatter form this replaces serialized per update.
    ring_start = jnp.searchsorted(sorted_ring, jnp.arange(R + 1, dtype=jnp.int32))
    length = jnp.minimum(ring_start[1:] - ring_start[:-1], C).astype(jnp.int32)
    slot_c = jnp.arange(C, dtype=jnp.int32)[None, :]
    src = ring_start[:-1, None].astype(jnp.int32) + slot_c  # [R, C]
    in_run = slot_c < (ring_start[1:] - ring_start[:-1])[:, None]
    src = jnp.minimum(src, n_pts - 1)
    dense_xyz = sorted_xyz[src.reshape(-1)].reshape(R, C, 3)
    dense_xyz = jnp.where(in_run[..., None], dense_xyz, 0.0)
    return RingGrid(xyz=dense_xyz, valid=in_run, length=length)


def bin_extra(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    extra: jnp.ndarray,
    lidar: LidarConfig,
    cap: CapacityConfig,
) -> jnp.ndarray:
    """Route a per-point scalar channel through the exact same dense ring-grid
    scatter as :func:`bin_rings`, returning it flattened to [R*C] — aligned
    with ``FeatureResult.xyz``.  Used to carry ground-truth provenance (e.g.
    the renderer's mover-origin mask) alongside the scan into the odometry
    step's diagnostics."""
    R, C = lidar.num_lines, cap.ring_points
    ring, valid = ring_ids(xyz, mask, lidar)
    order = jnp.argsort(ring, stable=True)
    sorted_ring = ring[order]
    sorted_extra = extra[order]
    n_pts = xyz.shape[0]
    # Same gather formulation as bin_rings (see there).
    ring_start = jnp.searchsorted(sorted_ring, jnp.arange(R + 1, dtype=jnp.int32))
    slot_c = jnp.arange(C, dtype=jnp.int32)[None, :]
    src = ring_start[:-1, None].astype(jnp.int32) + slot_c
    in_run = slot_c < (ring_start[1:] - ring_start[:-1])[:, None]
    src = jnp.minimum(src, n_pts - 1)
    dense = sorted_extra[src.reshape(-1)].reshape(R, C)
    dense = jnp.where(in_run, dense, jnp.zeros_like(dense))
    return dense.reshape(-1)


def _window_sum(x: jnp.ndarray, half: int) -> jnp.ndarray:
    """Sum over a (2*half+1)-tap window along axis 1 (zero padded)."""
    pad = jnp.pad(x, ((0, 0), (half, half), (0, 0)))
    out = jnp.zeros_like(x)
    for k in range(2 * half + 1):
        out = out + jax.lax.dynamic_slice_in_dim(pad, k, x.shape[1], axis=1)
    return out


def ring_curvature(grid: RingGrid, feat: FeatureConfig):
    """11-point curvature (ref: src/laserProcessingClass.cpp:73-80):
    ``|sum_{k=-5..5} p[j+k] - 11 p[j]|^2`` over positions with a full window.

    Returns (curvature [R, C], curv_valid [R, C]).
    """
    h = feat.curvature_half_window
    diff = _window_sum(grid.xyz, h) - (2 * h + 1) * grid.xyz
    curv = jnp.sum(diff * diff, axis=-1)
    c = grid.xyz.shape[1]
    pos = jnp.arange(c, dtype=jnp.int32)[None, :]
    ln = grid.length[:, None]
    curv_valid = grid.valid & (pos >= h) & (pos < ln - h) & (ln >= feat.min_ring_points)
    return curv, curv_valid


def _suppression_reach(grid: RingGrid, feat: FeatureConfig):
    """Precompute, for every ring position, how far the +-5 suppression chain
    extends (ref: src/laserProcessingClass.cpp:128-145 — walk stops at the
    first inter-point gap > 0.05 m^2).

    gap_ok[j] == True when ||p[j] - p[j-1]||^2 <= threshold (j >= 1).
    reach_right[j] = number of leading True in gap_ok[j+1 .. j+5]
    reach_left[j]  = number of leading True in gap_ok[j, j-1, .. j-4]
    """
    t = feat.suppression_gap_sq
    rr = feat.suppression_radius
    d = grid.xyz[:, 1:] - grid.xyz[:, :-1]
    gap_ok_core = (jnp.sum(d * d, -1) <= t) & grid.valid[:, 1:] & grid.valid[:, :-1]
    gap_ok = jnp.pad(gap_ok_core, ((0, 0), (1, 0)))  # gap_ok[j] about (j-1, j)

    C = grid.xyz.shape[1]
    right = jnp.zeros(grid.valid.shape, jnp.int32)
    chain = jnp.ones(grid.valid.shape, bool)
    padded = jnp.pad(gap_ok, ((0, 0), (0, rr)))
    for k in range(1, rr + 1):
        chain = chain & jax.lax.dynamic_slice_in_dim(padded, k, C, axis=1)
        right = right + chain.astype(jnp.int32)

    left = jnp.zeros(grid.valid.shape, jnp.int32)
    chain = jnp.ones(grid.valid.shape, bool)
    padded_l = jnp.pad(gap_ok, ((0, 0), (rr, 0)))
    for k in range(rr):
        # k-th link of the left chain is gap_ok[j - k]
        chain = chain & jax.lax.dynamic_slice_in_dim(padded_l, rr - k, C, axis=1)
        left = left + chain.astype(jnp.int32)
    return left, right


def extract_features(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    lidar: LidarConfig,
    feat: FeatureConfig,
    cap: CapacityConfig,
) -> FeatureResult:
    """Full feature extraction (ref: featureExtraction + featureExtractionFromSector,
    src/laserProcessingClass.cpp:10-209).

    Returns edge/surf masks over the flattened dense ring grid; downstream
    voxel downsampling consumes masked points directly (no compaction pass).
    """
    grid = bin_rings(xyz, mask, lidar, cap)
    curv, curv_valid = ring_curvature(grid, feat)
    reach_l, reach_r = _suppression_reach(grid, feat)

    R, C = curv.shape
    S = feat.num_sectors
    pos = jnp.arange(C, dtype=jnp.int32)[None, :]
    h = feat.curvature_half_window
    total = jnp.maximum(grid.length - 2 * h, 1)[:, None]  # curvature points per ring
    sector_len = jnp.maximum(total // S, 1)
    sector_id = jnp.clip((pos - h) // sector_len, 0, S - 1)
    sector_id = jnp.where(curv_valid, sector_id, -1)

    threshold = feat.edge_curvature_threshold
    K = feat.pick_candidates
    T = feat.max_edge_per_sector

    # --- Candidate compaction: one batched lexicographic sort per ring by
    # (sector, candidate-first, curvature desc) pulls each sector's pickable
    # points (curv > threshold) into a contiguous descending-curvature run,
    # so the pick loop below works on [R, S, K] instead of [S, R, C] (a ~60x
    # data reduction at HDL-64 scale).  Stable sort => ascending-position
    # tie-break, the same order as sorting a sector by descending curvature.
    cand = curv_valid & (curv > threshold)
    pk = jnp.where(
        sector_id >= 0,
        sector_id * 2 + jnp.where(cand, 0, 1),
        2 * S,
    ).astype(jnp.int32)
    neg_curv = jnp.where(cand, -curv, jnp.float32(3.0e38))
    pos_grid = jnp.broadcast_to(pos, (R, C)).astype(jnp.int32)
    _, _, spos = jax.lax.sort((pk, neg_curv, pos_grid), dimension=1, num_keys=2)

    # Per-(ring, key) counts -> start offset of each sector's candidate run.
    # Histogram by one-hot reduction, not scatter-add: 131k+ updates onto an
    # (R, 13) grid collide massively and TPU scatter serializes per
    # duplicate; comparing against the 13 key values and reducing over C is
    # pure VPU work.
    cnts = jnp.sum(
        pk[:, :, None] == jnp.arange(2 * S + 1, dtype=jnp.int32)[None, None, :],
        axis=1,
        dtype=jnp.int32,
    )
    starts = jnp.cumsum(cnts, axis=1) - cnts  # exclusive prefix
    cand_start = starts[:, 0 : 2 * S : 2]  # [R, S]
    n_cand = cnts[:, 0 : 2 * S : 2]  # [R, S]

    idx = jnp.minimum(
        cand_start[:, :, None] + jnp.arange(K, dtype=jnp.int32)[None, None, :], C - 1
    )  # [R,S,K]
    cmask = jnp.arange(K, dtype=jnp.int32)[None, None, :] < n_cand[:, :, None]
    flat_idx = idx.reshape(R, S * K)
    cpos = jnp.take_along_axis(spos, flat_idx, axis=1).reshape(R, S, K)
    creach_l = jnp.take_along_axis(reach_l, cpos.reshape(R, S * K), axis=1).reshape(R, S, K)
    creach_r = jnp.take_along_axis(reach_r, cpos.reshape(R, S * K), axis=1).reshape(R, S, K)

    # --- Pick-and-suppress: candidates are descending-curvature, so "highest
    # unsuppressed curvature" == "first available slot"; suppression is a
    # position-range mask within the (ring, sector) block (the reference's
    # picked_points set is sector-local, src/laserProcessingClass.cpp:110-148).
    klane = jnp.arange(K, dtype=jnp.int32)[None, None, :]

    def pick_body(it, state):
        avail, edge_c, lo_t, hi_t, found_t = state
        j = jnp.argmax(avail, axis=2)  # first available = max curvature
        found = jnp.any(avail, axis=2)
        p = jnp.take_along_axis(cpos, j[..., None], 2)[..., 0]
        rl = jnp.take_along_axis(creach_l, j[..., None], 2)[..., 0]
        rr = jnp.take_along_axis(creach_r, j[..., None], 2)[..., 0]
        lo = p - rl
        hi = p + rr
        supp = (cpos >= lo[..., None]) & (cpos <= hi[..., None]) & found[..., None]
        avail = avail & ~supp
        edge_c = edge_c | ((klane == j[..., None]) & found[..., None])
        return (
            avail,
            edge_c,
            lo_t.at[it].set(lo),
            hi_t.at[it].set(hi),
            found_t.at[it].set(found),
        )

    avail0 = cmask
    edge_c0 = jnp.zeros((R, S, K), bool)
    ztr = jnp.zeros((T, R, S), jnp.int32)
    avail, edge_c, lo_t, hi_t, found_t = jax.lax.fori_loop(
        0, T, pick_body, (avail0, edge_c0, ztr, ztr, jnp.zeros((T, R, S), bool))
    )

    # --- Full-grid suppression mask via a difference array: each pick marks
    # [lo, hi] clipped to its own sector's position span; everything marked
    # is excluded from the surf cloud (matching the reference, which skips
    # picked_points when emitting surfs, src/laserProcessingClass.cpp:198-205).
    srange = jnp.arange(S, dtype=jnp.int32)[None, :]
    sec_lo = h + srange * sector_len  # [R, S]
    sec_hi = jnp.where(srange == S - 1, C - 1, h + (srange + 1) * sector_len - 1)
    lo_c = jnp.clip(jnp.maximum(lo_t, sec_lo[None]), 0, C - 1)
    hi_c = jnp.clip(jnp.minimum(hi_t, sec_hi[None]), 0, C - 1)
    r_trs = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :, None], (T, R, S))
    fint = found_t.astype(jnp.int32)
    diff = jnp.zeros((R, C + 1), jnp.int32)
    diff = diff.at[r_trs, lo_c].add(fint)
    diff = diff.at[r_trs, hi_c + 1].add(-fint)
    picked = jnp.cumsum(diff[:, :C], axis=1) > 0

    # --- Edge mask: scatter the picked candidates' positions.
    r_rsk = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None, None], (R, S, K))
    edge_sel = jnp.zeros((R, C), bool)
    edge_sel = edge_sel.at[r_rsk, jnp.where(edge_c, cpos, C)].set(True, mode="drop")

    surf_sel = curv_valid & ~picked
    if feat.surf_decimate > 1:
        # Within-ring azimuth stride (see FeatureConfig.surf_decimate): the
        # dense grid's column axis is azimuth order, so `pos % N` keeps every
        # Nth return per ring — uniform angular thinning, not a spatial bias.
        surf_sel = surf_sel & (pos % feat.surf_decimate == 0)
    return FeatureResult(
        xyz=grid.xyz.reshape(-1, 3),
        edge_mask=edge_sel.reshape(-1),
        surf_mask=surf_sel.reshape(-1),
        curvature=jnp.where(curv_valid, curv, 0.0).reshape(-1),
        ring=jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], (R, C)).reshape(-1),
    )
