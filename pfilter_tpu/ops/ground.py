"""Grid-based ground segmentation — TPU-native form of ``groundSeg::ground_seg``
(ref: include/preProcess.hpp:398-505).

The reference builds a dynamic 2D grid (default 3 m cells) over the cloud's
bounding box, tracks each cell's minimum z, takes the 3x3-neighborhood
minimum, and labels a point as ground iff

- its cell has enough points (``min_grid_pt_num``),
- the cell's min-z is within ``neighbor_height_diff`` of the 3x3 neighbor
  minimum (rejects cells sitting on top of objects),
- the point is within ``max_height_difference`` of the cell min-z and inside
  the [min_ground_height, max_ground_height] band.

TPU redesign: the grid is a static [G, G] array centered on the sensor
(scatter-min for cell min-z, separable 3x3 min-pool for the neighbor pass) —
no dynamic allocation, one pass per stage, all VPU work.  Points above
``max_ground_height`` or outside the window are non-ground, matching the
reference's push-through behavior (ref: :436-437).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pfilter_tpu.config import GroundConfig

_ZBIG = 1.0e9


class GroundResult(NamedTuple):
    ground_mask: jnp.ndarray  # [N] bool — ground points
    nonground_mask: jnp.ndarray  # [N] bool — everything else that is valid


def segment_ground(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: GroundConfig,
    min_grid_pt_num: int = 8,  # ref gf_grid_pt_num_thre (include/preProcess.hpp:575)
    max_ground_height: float = 5.0,  # ref gf_max_ground_height (:600)
    min_ground_height: float = -5.0,  # ref gf_min_ground_height (:601)
) -> GroundResult:
    max_height_difference = cfg.point_height_tol  # ref gf_max_grid_height_diff (:603)
    g = cfg.num_cells
    res = cfg.grid_size
    half = g * res / 2.0

    cx = jnp.floor((xyz[:, 0] + half) / res).astype(jnp.int32)
    cy = jnp.floor((xyz[:, 1] + half) / res).astype(jnp.int32)
    in_window = (cx >= 0) & (cx < g) & (cy >= 0) & (cy < g)
    cell_ok = valid & in_window

    z = xyz[:, 2]
    band = (z <= max_ground_height) & (z > min_ground_height)

    # Scatter-min of z per cell (only band points update min-z, ref :441-445)
    # + scatter-add of per-cell point counts (all in-window points, ref :435).
    ix = jnp.where(cell_ok, cx, g)
    iy = jnp.where(cell_ok, cy, g)
    minz = jnp.full((g, g), _ZBIG, jnp.float32)
    contrib = jnp.where(cell_ok & band, z, _ZBIG)
    minz = minz.at[ix, iy].min(contrib, mode="drop")
    counts = jnp.zeros((g, g), jnp.int32)
    counts = counts.at[ix, iy].add(cell_ok.astype(jnp.int32), mode="drop")

    # 3x3 neighbor min (separable min-pool); border cells keep their own min
    # (the reference skips the border ring, ref :456 — same effect: their
    # neighbor_min_z stays at min_z).
    def pool1d(a, axis):
        lo = jnp.roll(a, 1, axis)
        hi = jnp.roll(a, -1, axis)
        return jnp.minimum(a, jnp.minimum(lo, hi))

    inner = pool1d(pool1d(minz, 0), 1)
    border = (
        (jnp.arange(g) == 0)[:, None]
        | (jnp.arange(g) == g - 1)[:, None]
        | (jnp.arange(g) == 0)[None, :]
        | (jnp.arange(g) == g - 1)[None, :]
    )
    neighbor_min = jnp.where(border, minz, inner)

    # Per-point classification.
    cell_minz = minz[ix, iy]
    cell_nmin = neighbor_min[ix, iy]
    cell_cnt = counts[ix, iy]
    cell_reliable = (
        (cell_cnt >= min_grid_pt_num)
        & ((cell_minz - cell_nmin) < cfg.neighbor_height_tol)
        & (cell_minz < _ZBIG * 0.5)
    )
    is_ground = (
        cell_ok
        & band
        & cell_reliable
        & ((z - cell_minz) < max_height_difference)
    )
    # Non-ground set mirrors the reference: points above the ground band pass
    # straight through (ref :436-437); band points in populated cells that
    # fail a test are non-ground (ref :483, :489); band points in
    # under-populated cells are *dropped* (the reference's grid loop never
    # emits them, ref :473).  Valid points OUTSIDE the static grid window
    # also pass through as non-ground (ADVICE r4: the reference's grid covers
    # the cloud's bounding box, so "outside the window" does not exist there;
    # silently dropping far points here would diverge for lidar ranges beyond
    # num_cells*grid_size/2).
    out_window = valid & ~in_window
    above_band = cell_ok & (z > max_ground_height)
    in_counted = cell_ok & band & (cell_cnt >= min_grid_pt_num)
    nonground = out_window | above_band | (in_counted & ~is_ground)
    return GroundResult(ground_mask=is_ground, nonground_mask=nonground)


def segment_ground_dispatch(xyz, valid, pipeline_cfg) -> GroundResult:
    """Ground segmentation by ``GroundConfig.method``: "grid" = the
    reference's ground_seg (the only variant its launch graph calls,
    src/additionNode.cpp:24); "fast" = the fast_ground_filter variant
    (ops/fast_ground.py) whose distance-weighted downsampling also thins the
    surviving masks.  ``pipeline_cfg`` is the full PipelineConfig (the fast
    variant reads FastGroundConfig)."""
    if pipeline_cfg.ground.method == "fast":
        from pfilter_tpu.ops import fast_ground

        r = fast_ground.fast_ground_filter(xyz, valid, pipeline_cfg.fast_ground)
        return GroundResult(ground_mask=r.ground_mask, nonground_mask=r.nonground_mask)
    if pipeline_cfg.ground.method != "grid":
        raise ValueError(f"unknown ground.method {pipeline_cfg.ground.method!r}")
    return segment_ground(xyz, valid, pipeline_cfg.ground)
