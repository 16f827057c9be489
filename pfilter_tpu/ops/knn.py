"""Sorted voxel-grid k-nearest-neighbor search — the TPU replacement for
``pcl::KdTreeFLANN`` (ref: src/odomEstimationClass.cpp:249-250,299,447).

The reference rebuilds a KD-tree over each feature map every frame and runs
5-NN queries per scan point per Gauss-Newton outer iteration.  Pointer-chasing
trees don't map to TPUs; instead the map is kept sorted by 1 m grid-cell id
(a layout the reference's own rgbds sort already implies,
src/odomEstimationClass.cpp:74), and a query gathers candidates from the 27
neighboring cells via vectorized binary search + top-k:

  1. grid build: cell id = packed (ix, iy, iz) on a 256^3 grid of
     ``cell_size`` cells anchored near the current pose; sort once per frame.
  2. query: 27 ``searchsorted`` probes -> candidate ranges -> gather up to
     ``candidates_per_cell`` points per cell -> masked distances -> ``top_k``.

Exactness: correspondences are gated on 5th-NN sq-distance < 1.0
(ref: src/odomEstimationClass.cpp:300), and every point within 1.0 m of a
query lies in its 27-cell neighborhood at cell_size >= 1.0, so gated results
match exact KNN as long as no single cell holds more than
``candidates_per_cell`` map points.  The map is voxel-downsampled at leaf
``L`` (one point per voxel), and a cell of size ``C`` intersects at most
``(floor(C/L) + 1)^3`` voxels per axis-product — 27 for C=1 m, L=0.4 m (edge
maps), 8 for L=0.8 m (surf maps) — so ``candidates_per_cell=32`` makes the
query exact for every map the engine builds (enforced in knn_query).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_INVALID_ID = jnp.iinfo(jnp.int32).max
_GRID_N = 256  # cells per axis; ids pack into ix*65536 + iy*256 + iz < 2^24


class HashGrid(NamedTuple):
    """A point map stored sorted by spatial cell id (the 'voxel-block map')."""

    xyz: jnp.ndarray  # [CAP, 3] float32, sorted by cell id
    rg: jnp.ndarray  # [CAP, 2] float32 persistence counters (r, g)
    valid: jnp.ndarray  # [CAP] bool
    cell_ids: jnp.ndarray  # [CAP] int32 sorted; invalid slots = INT32_MAX
    origin: jnp.ndarray  # [3] float32 — world coords of cell (0,0,0) corner
    cell_size: jnp.ndarray  # [] float32


class KnnResult(NamedTuple):
    idx: jnp.ndarray  # [Q, K] int32 indices into the grid arrays
    sqdist: jnp.ndarray  # [Q, K] float32; +inf where no candidate


def _cell_coords(xyz: jnp.ndarray, origin: jnp.ndarray, cell_size) -> jnp.ndarray:
    c = jnp.floor((xyz - origin) / cell_size).astype(jnp.int32)
    return jnp.clip(c, 1, _GRID_N - 2)  # border ring unused: avoids id wraparound


def _pack(c: jnp.ndarray) -> jnp.ndarray:
    return c[..., 0] * (_GRID_N * _GRID_N) + c[..., 1] * _GRID_N + c[..., 2]


def grid_origin_for_pose(pose_t: jnp.ndarray, cell_size: float) -> jnp.ndarray:
    """Anchor the 256^3 grid so the pose sits at its center; the +-100 m map
    crop (ref: src/odomEstimationClass.cpp:606-623) always fits."""
    return jnp.floor(pose_t / cell_size) * cell_size - (_GRID_N // 2) * cell_size


def build_grid(
    xyz: jnp.ndarray,
    rg: jnp.ndarray,
    valid: jnp.ndarray,
    origin: jnp.ndarray,
    cell_size: float,
) -> HashGrid:
    """Sort points by cell id (one sort per map per frame — replaces the
    per-frame KD-tree rebuild at src/odomEstimationClass.cpp:249-250)."""
    ids = jnp.where(valid, _pack(_cell_coords(xyz, origin, cell_size)), _INVALID_ID)
    order = jnp.argsort(ids)
    return HashGrid(
        xyz=xyz[order],
        rg=rg[order],
        valid=valid[order],
        cell_ids=ids[order],
        origin=origin,
        cell_size=jnp.asarray(cell_size, jnp.float32),
    )


import numpy as _np

_NEIGHBOR_OFFSETS = _np.array(
    [
        dx * (_GRID_N * _GRID_N) + dy * _GRID_N + dz
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ],
    _np.int32,
)


def _neighbor_offsets() -> jnp.ndarray:
    return jnp.asarray(_NEIGHBOR_OFFSETS)


def knn_query(
    grid: HashGrid,
    query_xyz: jnp.ndarray,
    query_valid: jnp.ndarray,
    k: int,
    candidates_per_cell: int,
) -> KnnResult:
    """Batched k-NN: for each query, gather candidates from 27 neighbor cells
    and keep the k nearest.  Invalid queries return +inf distances."""
    q = query_xyz.shape[0]
    p = candidates_per_cell

    qids = _pack(_cell_coords(query_xyz, grid.origin, grid.cell_size))  # [Q]
    nids = qids[:, None] + _neighbor_offsets()[None, :]  # [Q, 27]

    starts = jnp.searchsorted(grid.cell_ids, nids, side="left")  # [Q, 27]
    ends = jnp.searchsorted(grid.cell_ids, nids, side="right")

    slots = starts[..., None] + jnp.arange(p, dtype=starts.dtype)  # [Q, 27, P]
    in_run = slots < ends[..., None]
    cap = grid.xyz.shape[0]
    cand = jnp.where(in_run, slots, cap - 1).reshape(q, 27 * p)
    cand_ok = in_run.reshape(q, 27 * p)

    cxyz = grid.xyz[cand]  # [Q, 27P, 3]
    d = query_xyz[:, None, :] - cxyz
    sq = jnp.sum(d * d, axis=-1)
    sq = jnp.where(cand_ok & query_valid[:, None], sq, jnp.inf)

    top_val, arg_top = _top_k_small(sq, k)
    idx = jnp.take_along_axis(cand, arg_top, axis=1)
    return KnnResult(idx=idx.astype(jnp.int32), sqdist=top_val)


def _top_k_small(sq: jnp.ndarray, k: int):
    """Smallest-k along the last axis. Returns (values, indices)."""
    from jax import lax

    neg, idx = lax.top_k(-sq, k)
    return -neg, idx
