"""BPF front-end: ground removal -> DCVC clustering -> PCA classification.

TPU-native form of the ``curvedVoxel_node`` preprocessor
(ref: src/additionNode.cpp:12-54): each stage is optional and gated exactly
like the reference's ROS params ``groundfilter`` / ``curvedfilter`` /
``featurePreExtract`` (launch/pfilter_kitti.launch:5-10); the output is a set
of boolean masks over the input scan (beam/pillar/facade for BPF odometry,
plus the surviving non-ground cloud that the ES pipeline would consume).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pfilter_tpu.config import PipelineConfig
from pfilter_tpu.ops import dcvc, ground, knn_tiled, pca_classify, pca_radius, pca_voxel


class FrontendResult(NamedTuple):
    ground_mask: jnp.ndarray
    nonground_mask: jnp.ndarray  # after optional DCVC small-cluster removal
    beam_mask: jnp.ndarray
    pillar_mask: jnp.ndarray
    facade_mask: jnp.ndarray
    # Candidate slots beyond the radius-PCA kernel's halo-row capacity
    # (silent moment truncation if nonzero — see map_state.tile_overflow_count).
    n_halo_truncated: jnp.ndarray = 0


def _interpret_mode() -> bool:
    return jax.default_backend() == "cpu"


def run_frontend(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: PipelineConfig,
    use_ground_filter: bool = True,
    use_curved_filter: bool = True,
) -> FrontendResult:
    """Masks over the raw scan (sensor frame).  Stages:

    1. grid ground segmentation (ref: include/preProcess.hpp:398-505),
    2. DCVC clustering on non-ground points; clusters < minSeg dropped
       (ref: src/additionClass.cpp:457-497),
    3. radius-PCA moments + beam/pillar/facade thresholds
       (ref: include/preProcess.hpp:646-736).
    """
    if use_ground_filter:
        g = ground.segment_ground_dispatch(xyz, valid, cfg)
        ground_mask = g.ground_mask
        nonground = g.nonground_mask
    else:
        ground_mask = jnp.zeros_like(valid)
        nonground = valid

    # Neighborhood-PCA moments over the non-ground cloud against itself.
    # Optional ground->facade routing (see PCAClassifyConfig.ground_as_facade:
    # without it the BPF channel set has no z-constraining geometry — beams
    # alone carry z and drift ratchets).
    ground_extra = ground_mask if cfg.pca.ground_as_facade else jnp.zeros_like(valid)
    if cfg.pca.ground_as_facade and cfg.pca.ground_facade_decimate > 1:
        stride = jnp.arange(valid.shape[0]) % cfg.pca.ground_facade_decimate == 0
        ground_extra = ground_extra & stride

    if cfg.pca.impl == "voxel":
        # Production path.  The surviving non-ground cloud is COMPACTED to a
        # half-capacity prefix first: every DCVC/PCA scatter, sort and
        # segment cost scales with array CAPACITY, not valid count, and
        # after ground removal only ~40-55% of a 131k scan survives
        # (measured: the two 131k-row DCVC grid scatters alone are ~20 ms;
        # halving the row count halves them).  Masks are scattered back to
        # raw-scan indexing as one packed-code scatter; prefix overflow is
        # counted loudly.
        n = xyz.shape[0]
        ccap = max(n // 2, 8)
        cidx = jnp.nonzero(nonground, size=ccap, fill_value=n - 1)[0]
        n_ng = jnp.sum(nonground.astype(jnp.int32))
        cvalid = jnp.arange(ccap) < n_ng
        n_c_over = jnp.maximum(n_ng - ccap, 0)
        cxyz = xyz[cidx]

        dcvc_dropped = jnp.asarray(0, jnp.int32)
        ckeep = cvalid
        if use_curved_filter:
            c = dcvc.cluster(cxyz, cvalid, cfg.dcvc, cfg.lidar)
            ckeep = c.keep
            dcvc_dropped = jnp.asarray(c.n_vox_dropped, jnp.int32)

        # Cube-neighborhood moments by voxel aggregation, classified at
        # voxel resolution and propagated to points — one sort + 27
        # direct-addressed gathers (see ops/pca_voxel.py).
        vc = pca_voxel.voxel_pca_classify(
            cxyz, ckeep, cfg.pca, max_voxels=cfg.pca.max_voxels
        )
        code = (
            ckeep.astype(jnp.int32)
            + 2 * (vc.beam_mask & cvalid).astype(jnp.int32)
            + 4 * (vc.pillar_mask & cvalid).astype(jnp.int32)
            + 8 * (vc.facade_mask & cvalid).astype(jnp.int32)
        )
        full = jnp.zeros(n, jnp.int32)
        full = full.at[jnp.where(cvalid, cidx, n)].set(
            jnp.where(cvalid, code, 0), mode="drop", unique_indices=True
        )
        return FrontendResult(
            ground_mask=ground_mask,
            nonground_mask=(full & 1) > 0,
            beam_mask=(full & 2) > 0,
            pillar_mask=(full & 4) > 0,
            facade_mask=((full & 8) > 0) | ground_extra,
            n_halo_truncated=vc.n_voxel_dropped.astype(jnp.int32)
            + dcvc_dropped
            + n_c_over,
        )
    else:
        if use_curved_filter:
            c = dcvc.cluster(xyz, nonground, cfg.dcvc, cfg.lidar)
            nonground = c.keep
        # Exact-ball Pallas kernel.  The raw scan is far denser near the
        # sensor than any voxelized map, so it gets its own tile capacity
        # (cfg.capacity.frontend_tile_cap) — and a truncation counter, since
        # z-unbounded tiles CAN overflow on raw scans (measured 83k slots on
        # the city world; prefer impl="voxel").
        cap = cfg.capacity
        nt, tc = cap.knn_tiles, cap.tile_cells
        tile_cap = cap.frontend_tile_cap
        origin = knn_tiled.tile_origin_for_pose(jnp.zeros(3), nt, tc)
        rg = jnp.zeros((xyz.shape[0], 2), jnp.float32)
        tmap = knn_tiled.build_tiled(xyz, rg, nonground, origin, nt, tc, tile_cap)
        moments = pca_radius.radius_pca_moments(
            tmap,
            xyz,
            nonground,
            nt,
            tc,
            tile_cap,
            radius=cfg.pca.neighbor_radius,
            interpret=_interpret_mode(),
        )
        # Halo-row truncation counter (kernel reads 3-tile rows capped at
        # 3*tile_cap slots; anything beyond silently drops out of the moments).
        w = 3 * tile_cap
        ts = tmap.tile_start
        tids = jnp.arange(nt * nt, dtype=jnp.int32)
        tx, ty = tids // nt, tids % nt
        trunc = jnp.asarray(0, jnp.int32)
        for dr in (-1, 0, 1):
            row = jnp.clip(tx + dr, 0, nt - 1)
            lo = row * nt + jnp.clip(ty - 1, 0, nt - 1)
            hi = row * nt + jnp.clip(ty + 1, 0, nt - 1) + 1
            trunc = trunc + jnp.maximum(ts[hi] - ts[lo] - w, 0).sum()
    cls = pca_classify.classify(xyz, nonground, moments, cfg.pca)

    return FrontendResult(
        ground_mask=ground_mask,
        nonground_mask=nonground,
        beam_mask=cls.beam_mask,
        pillar_mask=cls.pillar_mask,
        facade_mask=cls.facade_mask | ground_extra,
        n_halo_truncated=trunc,
    )
