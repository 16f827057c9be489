"""Voxel-aggregated neighborhood PCA — the BPF frontend's production path.

TPU-native replacement for the reference's per-point radius kNN + PCL PCA
(ref: include/preProcess.hpp:200-247, 283-324), redesigned around sort +
segment-reduce + direct-addressed gather instead of per-query candidate
scans:

1. bin the cloud into ``leaf``-sized voxels (one 131k sort — the same
   primitive every other stage of the engine is built on),
2. segment-reduce per-voxel moment sums [n, Σx, Σy, Σz, Σxx, Σyy, Σzz,
   Σxy, Σxz, Σyz] in VOXEL-LOCAL coordinates (fp32 second moments cancel
   catastrophically at |coord| ~ 90 m; locals stay < leaf),
3. scatter each occupied voxel's row id into a DENSE 3D cell table (the
   sensor-frame scan is bounded by max range, so direct addressing needs
   only ~8M int32 cells — one gather per neighbor lookup, vs 27 binary
   searches whose ~17 dependent gathers each made searchsorted the
   bottleneck: 505 ms/frame measured),
4. every occupied voxel sums its 3x3x3 neighbors' moments (27 direct
   gathers over the ~10k voxel rows), shifted by the constant inter-voxel
   offset (moment translation identities), and is CLASSIFIED at voxel
   level; points inherit their voxel's class through one table lookup.

The neighborhood is a voxel-aligned cube of edge ``3*leaf`` centered on the
query's voxel instead of the reference's 1 m ball — with ``leaf = 0.7`` the
cube brackets the ball.  Classifying voxels instead of raw points matches
the downstream consumer: BPF odometry re-voxelizes each feature class at
0.4/0.8 m before registration anyway, so per-point labels within one 0.7 m
voxel are redundant.  Classification consumes eigenvalue RATIOS and
principal directions, both robust to the neighborhood change; yield-level
agreement with the exact-ball Pallas kernel is covered by tests.

Why not the Pallas radius kernel (ops/pca_radius.py)?  That kernel scans
every candidate slot in a query's 3-tile halo rows.  The raw near-sensor
scan packs thousands of points into a 4 m tile (tiles are z-unbounded), so
halo capacities either truncate (83k slots/frame measured on the city
world) or the matmuls burn ~800 ms on empty lanes.  This formulation is
EXACT for its cube neighborhood — no capacity truncation possible.  The
Pallas kernel remains for exact-ball comparisons in tests.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pfilter_tpu.config import PCAClassifyConfig
from pfilter_tpu.ops import pca_classify
from pfilter_tpu.ops.pca_radius import PCAMoments

# Dense-table window (sensor frame): xy bounded by max lidar range (90 m),
# z by physical scene height.  288*288*96 cells at leaf 0.7 = ~32 MB int32.
_HALF_XY = 100.8
_HALF_Z = 33.6

_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def _dims(leaf: float):
    nx = 2 * int(math.ceil(_HALF_XY / leaf))
    nz = 2 * int(math.ceil(_HALF_Z / leaf))
    return nx, nx, nz


def _cells(xyz: jnp.ndarray, valid: jnp.ndarray, leaf: float):
    """Dense linear cell id per point; out-of-window or invalid -> NCELL
    (the sentinel row of the table).  Returns (cell, ijk, ncell)."""
    nx, ny, nz = _dims(leaf)
    ijk = jnp.floor(xyz / leaf).astype(jnp.int32) + jnp.array(
        [nx // 2, ny // 2, nz // 2], jnp.int32
    )
    in_win = jnp.all((ijk >= 0) & (ijk < jnp.array([nx, ny, nz], jnp.int32)), axis=-1)
    cell = (ijk[:, 0] * ny + ijk[:, 1]) * nz + ijk[:, 2]
    ncell = nx * ny * nz
    cell = jnp.where(valid & in_win, cell, ncell)
    return cell, ijk, ncell


class _VoxelTable(NamedTuple):
    mom: jnp.ndarray  # [V, 10] per-voxel local-frame moment sums
    cell: jnp.ndarray  # [V] dense cell id (NCELL for empty rows)
    center: jnp.ndarray  # [V, 3] voxel center (world/sensor frame)
    row_of: jnp.ndarray  # [NCELL+1] int32 — cell -> row (-1 if empty)
    point_cell: jnp.ndarray  # [N] each input point's cell id
    n_dropped: jnp.ndarray  # occupied voxels beyond max_voxels (overflow)


def _build_table(xyz, valid, leaf: float, max_voxels: int) -> _VoxelTable:
    n = xyz.shape[0]
    nx, ny, nz = _dims(leaf)
    cell, ijk, ncell = _cells(xyz, valid, leaf)
    ok = cell < ncell
    vctr = (
        ijk.astype(jnp.float32)
        - jnp.array([nx // 2, ny // 2, nz // 2], jnp.float32)
        + 0.5
    ) * leaf
    local = xyz - vctr

    order = jnp.argsort(cell)
    scell = cell[order]
    sloc = local[order]
    sok = ok[order]

    head = jnp.concatenate([jnp.ones(1, bool), scell[1:] != scell[:-1]])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    n_occ = jnp.max(jnp.where(sok, seg, -1)) + 1
    seg = jnp.where(sok, seg, max_voxels)

    ones = sok.astype(jnp.float32)
    x, y, z = sloc[:, 0], sloc[:, 1], sloc[:, 2]
    feats = jnp.stack(
        [ones, x, y, z, x * x, y * y, z * z, x * y, x * z, y * z], -1
    ) * ones[:, None]
    mom = jax.ops.segment_sum(feats, seg, num_segments=max_voxels, indices_are_sorted=True)
    vcell = jax.ops.segment_min(
        jnp.where(sok, scell, ncell), seg, num_segments=max_voxels, indices_are_sorted=True
    )
    occupied = mom[:, 0] > 0
    vcell = jnp.where(occupied, vcell, ncell)

    iz = vcell % nz
    iy = (vcell // nz) % ny
    ix = vcell // (nz * ny)
    center = (
        jnp.stack([ix, iy, iz], -1).astype(jnp.float32)
        - jnp.array([nx // 2, ny // 2, nz // 2], jnp.float32)
        + 0.5
    ) * leaf

    row_of = jnp.full(ncell + 1, -1, jnp.int32)
    rows = jnp.arange(max_voxels, dtype=jnp.int32)
    row_of = row_of.at[jnp.minimum(vcell, ncell)].set(
        jnp.where(occupied, rows, -1), mode="drop"
    )
    row_of = row_of.at[ncell].set(-1)
    return _VoxelTable(
        mom=mom,
        cell=vcell,
        center=center,
        row_of=row_of,
        point_cell=cell,
        n_dropped=jnp.maximum(n_occ - max_voxels, 0),
    )


def _cube_moments_rows(tbl: _VoxelTable, leaf: float):
    """Per occupied voxel row: moments of its 3x3x3 cube neighborhood, in the
    row's own voxel-local frame (translation-shifted sums)."""
    nx, ny, nz = _dims(leaf)
    ncell = nx * ny * nz
    total = jnp.zeros_like(tbl.mom)
    own_valid = tbl.cell < ncell
    iz = tbl.cell % nz
    iy = (tbl.cell // nz) % ny
    ix = tbl.cell // (nz * ny)
    for dx, dy, dz in _OFFSETS:
        jx, jy, jz = ix + dx, iy + dy, iz + dz
        in_win = (
            own_valid
            & (jx >= 0) & (jx < nx)
            & (jy >= 0) & (jy < ny)
            & (jz >= 0) & (jz < nz)
        )
        ncell_id = jnp.where(in_win, (jx * ny + jy) * nz + jz, ncell)
        nrow = tbl.row_of[ncell_id]
        hit = nrow >= 0
        m = jnp.where(hit[:, None], tbl.mom[jnp.maximum(nrow, 0)], 0.0)
        cnt = m[:, 0]
        sx, sy, sz = dx * leaf, dy * leaf, dz * leaf
        total = total + jnp.stack(
            [
                cnt,
                m[:, 1] + cnt * sx,
                m[:, 2] + cnt * sy,
                m[:, 3] + cnt * sz,
                m[:, 4] + 2 * sx * m[:, 1] + cnt * sx * sx,
                m[:, 5] + 2 * sy * m[:, 2] + cnt * sy * sy,
                m[:, 6] + 2 * sz * m[:, 3] + cnt * sz * sz,
                m[:, 7] + sx * m[:, 2] + sy * m[:, 1] + cnt * sx * sy,
                m[:, 8] + sx * m[:, 3] + sz * m[:, 1] + cnt * sx * sz,
                m[:, 9] + sy * m[:, 3] + sz * m[:, 2] + cnt * sy * sz,
            ],
            -1,
        )
    return total


def _finalize(total, valid, center):
    cnt = total[:, 0]
    safe_n = jnp.maximum(cnt, 1.0)
    mean_local = total[:, 1:4] / safe_n[:, None]
    xx, yy, zz, xy, xz, yz = (
        total[:, 4], total[:, 5], total[:, 6], total[:, 7], total[:, 8], total[:, 9]
    )
    second = jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        -2,
    )
    cov = second - safe_n[:, None, None] * mean_local[:, :, None] * mean_local[:, None, :]
    mean = mean_local + jnp.where(valid[:, None], center, 0.0)
    cnt = jnp.where(valid, cnt, 0.0)
    return PCAMoments(count=cnt, mean=mean, cov=jnp.where(valid[:, None, None], cov, 0.0))


def voxel_pca_moments(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    leaf: float = 0.7,
    max_voxels: int | None = None,
) -> PCAMoments:
    """Per-POINT cube-neighborhood moments (each point's own voxel's 3x3x3
    block) — the exact-semantics building block, used by tests and anywhere
    point-resolution moments are needed.  The frontend classifies at voxel
    resolution instead (see :func:`voxel_pca_classify`)."""
    n = xyz.shape[0]
    if max_voxels is None:
        max_voxels = n
    tbl = _build_table(xyz, valid, leaf, max_voxels)
    rows_total = _cube_moments_rows(tbl, leaf)
    prow = tbl.row_of[tbl.point_cell]
    ok = valid & (prow >= 0)
    total = jnp.where(ok[:, None], rows_total[jnp.maximum(prow, 0)], 0.0)
    nx, ny, nz = _dims(leaf)
    ijk = jnp.floor(xyz / leaf).astype(jnp.int32)
    vctr = (ijk.astype(jnp.float32) + 0.5) * leaf
    return _finalize(total, ok, vctr)


class VoxelClassifyResult(NamedTuple):
    beam_mask: jnp.ndarray  # [N] bool — per input point
    pillar_mask: jnp.ndarray
    facade_mask: jnp.ndarray
    n_voxel_dropped: jnp.ndarray  # occupied voxels beyond max_voxels


def voxel_pca_classify(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: PCAClassifyConfig,
    max_voxels: int = 16384,
) -> VoxelClassifyResult:
    """Classify at voxel resolution, propagate labels to points: the
    frontend's production path (ref classifies every non-ground point,
    include/preProcess.hpp:646-736, then BPF odometry voxelizes each class —
    voxel-level labels at ``voxel_leaf`` < the odometry leafs lose nothing).

    ``max_voxels`` 16384 (was 32768): the segment-reduce and the 27-gather
    cube loop scale with the row count, and the measured occupancy on the
    HDL-64 city scan is ~1.0k non-ground voxels — 16384 keeps 16x headroom
    and cuts this stage 19.1 -> 13.7 ms; ``n_voxel_dropped`` fails loudly
    if a denser world ever exceeds it."""
    leaf = cfg.voxel_leaf
    tbl = _build_table(xyz, valid, leaf, max_voxels)
    total = _cube_moments_rows(tbl, leaf)
    nx, ny, nz = _dims(leaf)
    row_valid = tbl.cell < nx * ny * nz
    moments = _finalize(total, row_valid, tbl.center)
    # Voxel "position" for the beam z-gate: the voxel's own centroid.
    cnt_own = jnp.maximum(tbl.mom[:, 0], 1.0)
    centroid = tbl.center + tbl.mom[:, 1:4] / cnt_own[:, None]
    cls = pca_classify.classify(centroid, row_valid, moments, cfg)

    prow = tbl.row_of[tbl.point_cell]
    ok = valid & (prow >= 0)
    safe = jnp.maximum(prow, 0)
    return VoxelClassifyResult(
        beam_mask=ok & cls.beam_mask[safe],
        pillar_mask=ok & cls.pillar_mask[safe],
        facade_mask=ok & cls.facade_mask[safe],
        n_voxel_dropped=tbl.n_dropped,
    )
