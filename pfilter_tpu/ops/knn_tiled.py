"""Tiled brute-force kNN — the Pallas TPU kernel replacing KdTreeFLANN.

Why: the reference's per-query KD-tree lookups (ref: src/odomEstimationClass.cpp:299,447)
map to fine-grained random gathers on TPU, which XLA lowers element-at-a-time
(~500 ms per association pass at KITTI scale — measured).  This kernel turns
kNN into streaming DMA + dense MXU/VPU compute:

- the map is sorted by 2D spatial tile (tile = ``tile_cells`` x 1 m cells,
  row-major over an ``NT x NT`` window anchored at the pose, z unbounded),
- queries are sorted by the same tile id and laid out in 128-aligned per-tile
  slots (TPU DMA offsets along the lane dimension must be 128-aligned),
- one Pallas grid step per query tile: DMA the 3x3-tile halo (three
  *contiguous* slot ranges, one per tile row, 128-aligned over-read) into
  VMEM, compute all query-candidate squared distances with one MXU matmul,
  and extract the top-5 with masked argmin passes — the distance matrix never
  touches HBM.

The kernel returns, per query, the 5 nearest candidate *slot ids* (into the
tile-sorted map arrays) and order-preserving distances (true squared distance
minus |q|^2, a per-row constant; the caller adds it back).  Exactness: the
3x3 halo of >= 4 m tiles covers the 1 m correspondence-gate ball with >= 3 m
of margin; results match exact kNN unless a tile overflows its capacity
(capacities are sized so this does not happen at PFilter map densities).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e30  # plain float: jnp scalars become captured consts in Pallas kernels
_ALIGN = 128  # TPU lane alignment for dynamic DMA offsets
_TQC = 128  # query rows per kernel subtile (= alignment, so offsets stay aligned)


class TiledMap(NamedTuple):
    """A point map sorted by spatial tile, with a transposed coordinate copy
    for the kernel and per-tile slot ranges."""

    xyz: jnp.ndarray  # [CAP, 3] float32, tile-sorted
    rg: jnp.ndarray  # [CAP, 2] float32 persistence counters
    valid: jnp.ndarray  # [CAP] bool
    xyz_t: jnp.ndarray  # [4, CAP + pad] float32 transposed (row 3 = zeros)
    tile_start: jnp.ndarray  # [NT*NT + 1] int32 slot ranges
    origin: jnp.ndarray  # [3] float32 — window anchor (world coords)


def tile_origin_for_pose(pose_t: jnp.ndarray, nt: int, tile_cells: int) -> jnp.ndarray:
    """Anchor the NT x NT tile window (1 m cells) so the pose is centered."""
    tile_size = float(tile_cells)
    half = nt * tile_size / 2.0
    return jnp.floor(pose_t / tile_size) * tile_size - half


def _tile_ids(xyz: jnp.ndarray, valid: jnp.ndarray, origin: jnp.ndarray, nt: int, tile_cells: int):
    ts = float(tile_cells)
    t = jnp.floor((xyz[:, :2] - origin[:2]) / ts).astype(jnp.int32)
    t = jnp.clip(t, 1, nt - 2)  # border ring unused: halo never leaves the window
    tid = t[:, 0] * nt + t[:, 1]
    return jnp.where(valid, tid, nt * nt)


def build_tiled(
    xyz: jnp.ndarray,
    rg: jnp.ndarray,
    valid: jnp.ndarray,
    origin: jnp.ndarray,
    nt: int,
    tile_cells: int,
    tile_cap: int,
) -> TiledMap:
    """Sort points tile-major and compute per-tile ranges (one sort per map
    per frame — the tiled twin of knn.build_grid)."""
    if tile_cap % _ALIGN != 0:
        raise ValueError(f"tile_cap must be a multiple of {_ALIGN}, got {tile_cap}")
    tid = _tile_ids(xyz, valid, origin, nt, tile_cells)
    order = jnp.argsort(tid)
    sx = xyz[order]
    srg = rg[order]
    sv = valid[order]
    stid = tid[order]
    tile_start = jnp.searchsorted(stid, jnp.arange(nt * nt + 1, dtype=jnp.int32)).astype(
        jnp.int32
    )
    pad = 3 * tile_cap + _ALIGN
    cap = xyz.shape[0]
    xyz_t = jnp.full((4, cap + pad), _BIG, jnp.float32)
    # Invalid slots (sorted last) must never look near: leave them at BIG.
    xyz_t = xyz_t.at[:3, :cap].set(jnp.where(sv[None, :], sx.T, _BIG))
    xyz_t = xyz_t.at[3, :].set(0.0)
    return TiledMap(xyz=sx, rg=srg, valid=sv, xyz_t=xyz_t, tile_start=tile_start, origin=origin)


def _knn_kernel(
    # scalar prefetch
    q_start_ref,  # [NT2] i32 — 128-aligned padded query slot starts
    q_cnt_ref,  # [NT2] i32
    c_start_ref,  # [NT2, 3] i32 — true (unaligned) halo range starts
    c_cnt_ref,  # [NT2, 3] i32
    # tensors (HBM)
    qxyz_ref,  # [4, QPAD] f32
    mxyz_ref,  # [4, MCAP+pad] f32
    out_d_ref,  # [8, QPAD] f32
    out_i_ref,  # [8, QPAD] i32
    # scratch
    qbuf,  # VMEM [4, TQC]
    cbuf,  # VMEM [4, 3*WB]
    dbuf,  # VMEM [TQC, 3*WB] f32
    bestd,  # VMEM [8, TQC] f32
    besti,  # VMEM [8, TQC] i32
    sem_q,
    sem_c,
    sem_o,
    *,
    w: int,
    k: int,
):
    t = pl.program_id(0)
    qcnt = q_cnt_ref[t]
    tqc = _TQC
    wb = w + _ALIGN  # per-range buffer width (aligned over-read)

    @pl.when(qcnt > 0)
    def _process():
        # DMA the 3 halo ranges; starts rounded down to the 128 lane boundary.
        def aligned_start(r):
            s = c_start_ref[t, r]
            return pl.multiple_of((s // _ALIGN) * _ALIGN, _ALIGN)

        for r in range(3):
            pltpu.make_async_copy(
                mxyz_ref.at[:, pl.ds(aligned_start(r), wb)],
                cbuf.at[:, pl.ds(r * wb, wb)],
                sem_c.at[r],
            ).start()
        for r in range(3):
            pltpu.make_async_copy(
                mxyz_ref.at[:, pl.ds(aligned_start(r), wb)],
                cbuf.at[:, pl.ds(r * wb, wb)],
                sem_c.at[r],
            ).wait()

        cand = cbuf[:, :]
        cc = jnp.sum(cand[:3] * cand[:3], axis=0, keepdims=True)  # [1, 3WB]
        # Candidate validity + global slot ids per halo range.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * wb), 1)
        off = lane % wb
        rsec = lane // wb
        cnt0, cnt1, cnt2 = c_cnt_ref[t, 0], c_cnt_ref[t, 1], c_cnt_ref[t, 2]
        s0, s1, s2 = c_start_ref[t, 0], c_start_ref[t, 1], c_start_ref[t, 2]
        sec_cnt = jnp.where(rsec == 0, cnt0, jnp.where(rsec == 1, cnt1, cnt2))
        sec_start = jnp.where(rsec == 0, s0, jnp.where(rsec == 1, s1, s2))
        sec_delta = sec_start % _ALIGN  # true range begins here inside the buffer
        col_ok = (off >= sec_delta) & (off < sec_delta + sec_cnt)  # [1, 3WB]
        col_gid = (sec_start - sec_delta) + off  # aligned base + buffer offset

        n_sub = pl.cdiv(qcnt, tqc)

        def sub_body(s, _):
            qoff = pl.multiple_of(q_start_ref[t] + s * tqc, _ALIGN)
            cq = pltpu.make_async_copy(qxyz_ref.at[:, pl.ds(qoff, tqc)], qbuf, sem_q)
            cq.start()
            cq.wait()

            qc = jax.lax.dot_general(
                qbuf[:, :],
                cand,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TQC, 3WB]
            # |q|^2 is constant per query row: dropped here (order-
            # preserving); the caller adds it back.  Mask AFTER the -2qc term
            # so out-of-range columns (DMA overread, sentinels) cannot win.
            dbuf[:, :] = jnp.where(col_ok, cc - 2.0 * qc, _BIG)

            for j in range(k):
                m = jnp.min(dbuf[:, :], axis=1)  # [TQC]
                am = jnp.argmin(dbuf[:, :], axis=1)  # [TQC]
                sel = jax.lax.broadcasted_iota(jnp.int32, (tqc, 3 * wb), 1) == am[:, None]
                gi = jnp.max(jnp.where(sel, col_gid, -1), axis=1)
                bestd[j, :] = m
                besti[j, :] = gi
                dbuf[:, :] = jnp.where(sel, _BIG, dbuf[:, :])

            for j in range(k, 8):
                bestd[j, :] = jnp.full((tqc,), _BIG, jnp.float32)
                besti[j, :] = jnp.zeros((tqc,), jnp.int32)

            co = pltpu.make_async_copy(bestd, out_d_ref.at[:, pl.ds(qoff, tqc)], sem_o)
            co.start()
            co.wait()
            co2 = pltpu.make_async_copy(besti, out_i_ref.at[:, pl.ds(qoff, tqc)], sem_o)
            co2.start()
            co2.wait()
            return 0

        jax.lax.fori_loop(0, n_sub, sub_body, 0)


class TiledKnnResult(NamedTuple):
    idx: jnp.ndarray  # [Q, K] int32 slot ids into the tiled map arrays
    sqdist: jnp.ndarray  # [Q, K] float32 true squared distances (inf-padded)


@functools.partial(
    jax.jit, static_argnames=("nt", "tile_cells", "tile_cap", "tqc", "k", "interpret")
)
def query_tiled(
    tmap: TiledMap,
    q_xyz: jnp.ndarray,
    q_valid: jnp.ndarray,
    nt: int,
    tile_cells: int,
    tile_cap: int,
    tqc: int = _TQC,  # kept for API compat; kernel always uses 128-row subtiles
    k: int = 5,
    interpret: bool = False,
) -> TiledKnnResult:
    """Exact 5-NN of each query against the tiled map (see module docstring)."""
    del tqc
    q = q_xyz.shape[0]
    nt2 = nt * nt
    w = 3 * tile_cap
    wb = w + _ALIGN

    # ---- host-side (traced, cheap): sort queries by tile, build 128-aligned
    # per-tile slots, and compute halo ranges ----
    qtid = _tile_ids(q_xyz, q_valid, tmap.origin, nt, tile_cells)
    order = jnp.argsort(qtid)
    sq_xyz = q_xyz[order]
    sq_tid = qtid[order]
    bounds = jnp.searchsorted(sq_tid, jnp.arange(nt2 + 1, dtype=jnp.int32)).astype(jnp.int32)
    q_cnt = bounds[1:] - bounds[:-1]
    padded_cnt = ((q_cnt + _TQC - 1) // _TQC) * _TQC
    q_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_cnt)[:-1].astype(jnp.int32)]
    )
    qpad = q + _TQC * nt2  # worst case: every tile occupied
    # Scatter sorted queries into their aligned slots.
    ranks = jnp.arange(q, dtype=jnp.int32) - bounds[jnp.clip(sq_tid, 0, nt2)]
    slot = jnp.where(sq_tid < nt2, q_start[jnp.clip(sq_tid, 0, nt2 - 1)] + ranks, qpad)
    qxyz_t = jnp.full((4, qpad + 1), 0.0, jnp.float32)
    qxyz_t = qxyz_t.at[:3, slot].set(sq_xyz.T, mode="drop")
    qxyz_t = qxyz_t[:, :qpad]

    # Candidate ranges per query tile: for each of 3 tile rows (tx-1..tx+1),
    # the contiguous slots of tiles (·, ty-1..ty+1).
    tids = jnp.arange(nt2, dtype=jnp.int32)
    tx, ty = tids // nt, tids % nt
    c_starts, c_cnts = [], []
    for dr in (-1, 0, 1):
        row = jnp.clip(tx + dr, 0, nt - 1)
        lo = row * nt + jnp.clip(ty - 1, 0, nt - 1)
        hi = row * nt + jnp.clip(ty + 1, 0, nt - 1) + 1
        start = tmap.tile_start[lo]
        cnt = jnp.minimum(tmap.tile_start[hi] - start, w)
        c_starts.append(start)
        c_cnts.append(cnt)
    c_start = jnp.stack(c_starts, -1).astype(jnp.int32)  # [NT2, 3]
    c_cnt = jnp.stack(c_cnts, -1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nt2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, _TQC), jnp.float32),
            pltpu.VMEM((4, 3 * wb), jnp.float32),
            pltpu.VMEM((_TQC, 3 * wb), jnp.float32),
            pltpu.VMEM((8, _TQC), jnp.float32),
            pltpu.VMEM((8, _TQC), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_knn_kernel, w=w, k=k)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((8, qpad), jnp.float32),
            jax.ShapeDtypeStruct((8, qpad), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(q_start, q_cnt, c_start, c_cnt, qxyz_t, tmap.xyz_t)

    # ---- gather per-query results back (original order) + true distances ----
    safe_slot = jnp.minimum(slot, qpad - 1)
    d_sorted = out_d[:k, safe_slot].T  # [Qsorted, k], missing |q|^2 term
    i_sorted = out_i[:k, safe_slot].T
    qq = jnp.sum(sq_xyz * sq_xyz, axis=-1, keepdims=True)
    d_true = d_sorted + qq
    d_true = jnp.where(d_sorted >= _BIG * 0.5, jnp.inf, d_true)

    inv = jnp.zeros(q, jnp.int32).at[order].set(jnp.arange(q, dtype=jnp.int32))
    d_out = d_true[inv]
    i_out = jnp.clip(i_sorted[inv], 0, tmap.xyz.shape[0] - 1)
    d_out = jnp.where(q_valid[:, None], d_out, jnp.inf)
    return TiledKnnResult(idx=i_out, sqdist=d_out)


def query_tiled_reference(tmap: TiledMap, q_xyz, q_valid, k: int = 5):
    """Brute-force reference (same interface) for tests."""
    mx = tmap.xyz
    d = jnp.sum((q_xyz[:, None] - mx[None]) ** 2, -1)
    d = jnp.where(tmap.valid[None, :], d, jnp.inf)
    d = jnp.where(q_valid[:, None], d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, k)
    return TiledKnnResult(idx=idx.astype(jnp.int32), sqdist=-neg)
