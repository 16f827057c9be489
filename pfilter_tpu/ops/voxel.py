"""Voxel-grid kernels: persistence-aware downsampling, crop box, eviction.

TPU-native replacements for the reference's PCL machinery:

- :func:`voxel_downsample_rgbds` replaces both ``pcl::VoxelGrid`` (scan
  downsampling, ref: src/odomEstimationClass.cpp:176-180) and the custom
  ``rgbds`` map re-voxelizer (ref: src/odomEstimationClass.cpp:34-134) —
  per-voxel centroid with per-voxel **max** of the persistence counters
  (r = age, g = observation count).
- :func:`crop_box` replaces ``pcl::CropBox`` (ref: src/odomEstimationClass.cpp:606-623).
- :func:`persistence_keep` is ``extractstablepoint``'s predicate
  (ref: src/odomEstimationClass.cpp:7-25): a point is *evicted* iff
  ``g < r * theta_p  &&  r > k_new  &&  g < theta_max + 1``.
- :func:`age_points` is the per-frame ``r += 2`` aging with the 250/255 cap
  (ref: src/odomEstimationClass.cpp:634-646).

Everything is fixed-capacity: dynamic PCL clouds become padded arrays with a
validity mask; the voxel hash map becomes sort-by-cell-id + segment reduce
(the same sorted layout the reference's rgbds builds at
src/odomEstimationClass.cpp:74).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_INVALID_ID = jnp.iinfo(jnp.int32).max


class PointSet(NamedTuple):
    """A fixed-capacity masked point cloud with persistence counters."""

    xyz: jnp.ndarray  # [N, 3] float32
    rg: jnp.ndarray  # [N, 2] float32 — (r = age rounds, g = observations)
    valid: jnp.ndarray  # [N] bool

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


def empty_pointset(capacity: int) -> PointSet:
    return PointSet(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        rg=jnp.zeros((capacity, 2), jnp.float32),
        valid=jnp.zeros(capacity, bool),
    )


def voxel_ids_dynamic(xyz: jnp.ndarray, valid: jnp.ndarray, leaf: float):
    """Linear voxel ids on a dynamic grid anchored at the cloud minimum,
    mirroring rgbds' min_b_/divb_mul_ indexing
    (ref: src/odomEstimationClass.cpp:43-70).  Invalid points get a sentinel
    id that sorts last."""
    big = jnp.float32(3.0e38)
    guarded = jnp.where(valid[:, None], xyz, big)
    min_b = jnp.floor(jnp.min(guarded, axis=0) / leaf)
    max_b = jnp.floor(jnp.max(jnp.where(valid[:, None], xyz, -big), axis=0) / leaf)
    any_valid = jnp.any(valid)
    min_b = jnp.where(any_valid, min_b, 0.0)
    max_b = jnp.where(any_valid, max_b, 0.0)
    div = (max_b - min_b + 1.0).astype(jnp.int32)
    ijk = (jnp.floor(xyz / leaf) - min_b).astype(jnp.int32)
    ids = ijk[:, 0] + div[0] * (ijk[:, 1] + div[1] * ijk[:, 2])
    return jnp.where(valid, ids, _INVALID_ID)


def voxel_ids_anchored(
    xyz: jnp.ndarray, valid: jnp.ndarray, leaf: float, anchor_t: jnp.ndarray
):
    """Voxel ids on an *absolute* grid (boundaries at integer multiples of
    ``leaf``), packed relative to a 512^3 window centered at ``anchor_t``.

    Unlike :func:`voxel_ids_dynamic` (min-anchored, like the reference), the
    decomposition is independent of which points are present — required by
    the sharded map so every shard agrees on voxel boundaries and a voxel's
    centroid stays inside its voxel (ownership invariant).
    """
    base = jnp.floor(anchor_t / leaf).astype(jnp.int32) - 256
    ijk = jnp.floor(xyz / leaf).astype(jnp.int32) - base
    in_window = jnp.all((ijk >= 0) & (ijk < 512), axis=-1)
    ijk = jnp.clip(ijk, 0, 511)
    ids = ijk[:, 0] * (512 * 512) + ijk[:, 1] * 512 + ijk[:, 2]
    return jnp.where(valid & in_window, ids, _INVALID_ID)


def spatial_hash(xyz: jnp.ndarray, leaf: float) -> jnp.ndarray:
    """Frame-invariant spatial hash of absolute voxel coordinates (classic
    XOR-of-primes).  Used only as a partition function for map sharding —
    collisions are harmless there."""
    ijk = jnp.floor(xyz / leaf).astype(jnp.int32)
    h = (ijk[:, 0] * 73856093) ^ (ijk[:, 1] * 19349663) ^ (ijk[:, 2] * 83492791)
    return h & 0x7FFFFFFF


def voxel_downsample_rgbds_counted(
    points: PointSet, leaf: float, out_cap: int, anchor_t=None
):
    """Per-voxel centroid + max-r + max-g downsample (ref rgbds,
    src/odomEstimationClass.cpp:34-134).

    Output is compacted: valid voxels occupy the first ``count`` slots, in
    ascending voxel-id order.  If the number of occupied voxels exceeds
    ``out_cap``, the highest-id voxels are dropped (capacity should be sized
    so this never binds; see CapacityConfig).

    Returns ``(PointSet, n_dropped)`` where ``n_dropped`` is the number of
    occupied voxels that did NOT fit in ``out_cap`` — the silent-truncation
    counter surfaced in FrameDiag.overflow (the reference's dynamic
    containers cannot overflow; fixed capacities must be observable).
    """
    if anchor_t is None:
        ids = voxel_ids_dynamic(points.xyz, points.valid, leaf)
    else:
        ids = voxel_ids_anchored(points.xyz, points.valid, leaf, anchor_t)
    order = jnp.argsort(ids)
    sid = ids[order]
    sxyz = points.xyz[order]
    srg = points.rg[order]
    svalid = points.valid[order]

    head = jnp.concatenate([jnp.ones(1, bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    n_occupied = jnp.max(jnp.where(svalid, seg, -1)) + 1
    n_dropped = jnp.maximum(n_occupied - out_cap, 0)
    # Invalid points (sentinel id, sorted last) are routed out of range.
    seg = jnp.where(svalid, seg, out_cap)

    ones = svalid.astype(jnp.float32)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=out_cap, indices_are_sorted=True)
    sums = jax.ops.segment_sum(
        sxyz * ones[:, None], seg, num_segments=out_cap, indices_are_sorted=True
    )
    rg_max = jax.ops.segment_max(
        jnp.where(svalid[:, None], srg, -jnp.inf),
        seg,
        num_segments=out_cap,
        indices_are_sorted=True,
    )
    out_valid = cnt > 0
    centroid = sums / jnp.maximum(cnt, 1.0)[:, None]
    rg = jnp.where(out_valid[:, None], rg_max, 0.0)
    return PointSet(xyz=centroid, rg=rg, valid=out_valid), n_dropped


def voxel_downsample_rgbds(
    points: PointSet, leaf: float, out_cap: int, anchor_t=None
) -> PointSet:
    """See :func:`voxel_downsample_rgbds_counted`; drops the overflow count."""
    ds, _ = voxel_downsample_rgbds_counted(points, leaf, out_cap, anchor_t)
    return ds


def crop_box(points: PointSet, center: jnp.ndarray, half_extent: float) -> PointSet:
    """Keep points within a cube of +-half_extent around ``center``
    (ref: src/odomEstimationClass.cpp:606-623, +-100 m around the pose)."""
    inside = jnp.all(jnp.abs(points.xyz - center) <= half_extent, axis=-1)
    return points._replace(valid=points.valid & inside)


def persistence_keep(
    rg: jnp.ndarray, k_new: float, theta_p: float, theta_max: float
) -> jnp.ndarray:
    """The persistence predicate of ``extractstablepoint``
    (ref: src/odomEstimationClass.cpp:12-13): evict iff
    ``g < r*theta_p && r > k_new && g < theta_max + 1``.  Returns keep mask."""
    r, g = rg[..., 0], rg[..., 1]
    evict = (g < r * theta_p) & (r > k_new) & (g < theta_max + 1.0)
    return ~evict


def evict_unstable(
    points: PointSet, k_new: float, theta_p: float, theta_max: float
) -> PointSet:
    return points._replace(
        valid=points.valid & persistence_keep(points.rg, k_new, theta_p, theta_max)
    )


def age_points(points: PointSet, increment: float = 2.0, cap: float = 255.0) -> PointSet:
    """Per-frame aging: ``r = r > 250 ? 255 : r + 2``
    (ref: src/odomEstimationClass.cpp:634-646)."""
    r = points.rg[:, 0]
    r = jnp.where(r > cap - 5.0, cap, r + increment)
    rg = points.rg.at[:, 0].set(jnp.where(points.valid, r, points.rg[:, 0]))
    return points._replace(rg=rg)


def concat_pointsets(a: PointSet, b: PointSet) -> PointSet:
    """Concatenate two fixed-capacity sets (result capacity = sum)."""
    return PointSet(
        xyz=jnp.concatenate([a.xyz, b.xyz], axis=0),
        rg=jnp.concatenate([a.rg, b.rg], axis=0),
        valid=jnp.concatenate([a.valid, b.valid], axis=0),
    )
