"""Radius-neighborhood PCA moments — Pallas kernel for the BPF classifier.

TPU-native replacement for the reference's per-point radius kNN + PCL PCA
(ref: include/preProcess.hpp:200-247, 283-324): each non-ground point gathers
neighbors within 1 m and eigendecomposes their covariance to compute
linearity/planarity and principal/normal directions.

Instead of gathering neighbor lists (random access), the kernel accumulates
*moments* over the query's tile halo with a single MXU matmul per tile:

  M = W @ F, where W[i,j] = 1{dist(q_i, c_j)^2 < r^2} and
  F[j] = [1, x, y, z, xx, yy, zz, xy, xz, yz] of candidate j,

which yields per-query neighbor count, mean and second moments; the
covariance eigendecomposition then runs batched in XLA.  True squared
distances come out of the same matmul via the augmented-coordinates trick
(q' = [q, |q|^2, 1], c' = [-2c, 1, |c|^2], dist = q'.c').

Both matmuls run at ``Precision.HIGHEST`` and all coordinates are recentered
to the tile center inside the kernel (the host adds the center back to the
mean; the scatter covariance is translation-invariant): without this the
MXU's bf16 passes and the |c|^2-scale cancellations destroy both the radius
test and the covariance — same failure mode as the kNN kernel
(see ops/knn_tiled.py).

Divergence from the reference: PCL's radiusSearch caps neighbors at the 25
*nearest* within the radius (ref: :218); the moment formulation uses *all*
points within the radius — a denser, order-free estimate of the same local
covariance.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfilter_tpu.ops import knn_tiled
from pfilter_tpu.ops.knn_tiled import _ALIGN, _CHUNK, _TQC, _tile_ids

_NMOM = 16  # padded moment rows: [cnt, x, y, z, xx, yy, zz, xy, xz, yz, 0...]


class PCAMoments(NamedTuple):
    count: jnp.ndarray  # [Q] neighbor count within radius
    mean: jnp.ndarray  # [Q, 3]
    cov: jnp.ndarray  # [Q, 3, 3] (scatter covariance, unnormalized)


def _pca_kernel(
    q_start_ref,
    q_cnt_ref,
    c_start_ref,  # [NT2*3]
    c_cnt_ref,  # [NT2*3]
    ctr_ref,  # [NT2*3] f32 per-tile recentering point
    qxyz_ref,  # [4, QPAD]
    mxyz_ref,  # [4, MCAP+pad]
    out_ref,  # [16, QPAD] f32 moments
    qbuf,  # VMEM [8, TQC]
    cbuf,  # VMEM [4, 3*WB]
    cchunk,  # VMEM [8, CHUNK] augmented candidate chunk
    fchunk,  # VMEM [16, CHUNK] moment-feature chunk
    mom,  # VMEM [16, TQC]
    sem_q,
    sem_c,
    sem_o,
    *,
    w: int,
    radius_sq: float,
):
    """Per query tile: DMA the 3-row halo, then accumulate the moment matmul
    over 128-lane candidate chunks GUARDED by each halo row's actual
    occupancy — compute scales with real point density, not the static
    3*tile_cap capacity (the unguarded full-width version spent ~15x the
    MXU work on empty lanes; same chunking as the kNN kernel)."""
    t = pl.program_id(0)
    qcnt = q_cnt_ref[t]
    tqc = _TQC
    wb = w + _ALIGN

    @pl.when(qcnt > 0)
    def _process():
        def aligned_start(r):
            s = c_start_ref[3 * t + r]
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

        cx, cy, cz = ctr_ref[3 * t], ctr_ref[3 * t + 1], ctr_ref[3 * t + 2]
        cnt0, cnt1, cnt2 = c_cnt_ref[3 * t], c_cnt_ref[3 * t + 1], c_cnt_ref[3 * t + 2]
        s0, s1, s2 = c_start_ref[3 * t], c_start_ref[3 * t + 1], c_start_ref[3 * t + 2]
        sec_cnts = (cnt0, cnt1, cnt2)
        sec_deltas = (s0 % _ALIGN, s1 % _ALIGN, s2 % _ALIGN)

        n_sub = pl.cdiv(qcnt, tqc)
        ll = jax.lax.broadcasted_iota(jnp.int32, (1, _CHUNK), 1)

        def sub_body(s, _):
            qoff = pl.multiple_of(q_start_ref[t] + s * tqc, _ALIGN)
            cq = pltpu.make_async_copy(qxyz_ref.at[:, pl.ds(qoff, tqc)], qbuf.at[0:4], sem_q)
            cq.start()
            cq.wait()
            qx = qbuf[0:1, :] - cx
            qy = qbuf[1:2, :] - cy
            qz = qbuf[2:3, :] - cz
            qq = qx * qx + qy * qy + qz * qz
            qbuf[0:1, :] = qx
            qbuf[1:2, :] = qy
            qbuf[2:3, :] = qz
            qbuf[3:4, :] = qq
            qbuf[4:5, :] = jnp.ones_like(qq)
            qbuf[5:8, :] = jnp.zeros((3, tqc), jnp.float32)

            mom[:, :] = jnp.zeros((_NMOM, tqc), jnp.float32)

            for r in range(3):
                delta_r = sec_deltas[r]
                cnt_r = sec_cnts[r]
                for cl in range(wb // _CHUNK):

                    @pl.when(cl * _CHUNK < delta_r + cnt_r)
                    def _chunk(r=r, cl=cl, delta_r=delta_r, cnt_r=cnt_r):
                        cofs = r * wb + cl * _CHUNK
                        x = cbuf[0:1, pl.ds(cofs, _CHUNK)] - cx
                        y = cbuf[1:2, pl.ds(cofs, _CHUNK)] - cy
                        z = cbuf[2:3, pl.ds(cofs, _CHUNK)] - cz
                        cc = x * x + y * y + z * z
                        # Augmented candidates: dist = [q,|q|^2,1].[-2c,1,|c|^2]
                        cchunk[0:1, :] = -2.0 * x
                        cchunk[1:2, :] = -2.0 * y
                        cchunk[2:3, :] = -2.0 * z
                        cchunk[3:4, :] = jnp.ones_like(cc)
                        cchunk[4:5, :] = cc
                        cchunk[5:8, :] = jnp.zeros((3, _CHUNK), jnp.float32)

                        off = cl * _CHUNK + ll
                        ok = (off >= delta_r) & (off < delta_r + cnt_r)
                        okf = ok.astype(jnp.float32)
                        fchunk[0:1, :] = okf
                        fchunk[1:2, :] = x * okf
                        fchunk[2:3, :] = y * okf
                        fchunk[3:4, :] = z * okf
                        fchunk[4:5, :] = x * x * okf
                        fchunk[5:6, :] = y * y * okf
                        fchunk[6:7, :] = z * z * okf
                        fchunk[7:8, :] = x * y * okf
                        fchunk[8:9, :] = x * z * okf
                        fchunk[9:10, :] = y * z * okf
                        fchunk[10:16, :] = jnp.zeros((6, _CHUNK), jnp.float32)

                        dist = jax.lax.dot_general(
                            qbuf[:, :],
                            cchunk[:, :],
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # [TQC, CHUNK] true squared distances
                        wmask = (dist < radius_sq).astype(jnp.float32)

                        mom[:, :] = mom[:, :] + jax.lax.dot_general(
                            fchunk[:, :],
                            wmask,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # [16, TQC]

            co = pltpu.make_async_copy(mom, out_ref.at[:, pl.ds(qoff, tqc)], sem_o)
            co.start()
            co.wait()
            return 0

        jax.lax.fori_loop(0, n_sub, sub_body, 0)


@functools.partial(
    jax.jit, static_argnames=("nt", "tile_cells", "tile_cap", "radius", "interpret")
)
def radius_pca_moments(
    tmap: knn_tiled.TiledMap,
    q_xyz: jnp.ndarray,
    q_valid: jnp.ndarray,
    nt: int,
    tile_cells: int,
    tile_cap: int,
    radius: float = 1.0,
    interpret: bool = False,
) -> PCAMoments:
    """Neighbor-count/mean/covariance within ``radius`` for every query,
    against a tiled point set (usually the scan itself)."""
    q = q_xyz.shape[0]
    nt2 = nt * nt
    w = 3 * tile_cap
    wb = w + _ALIGN

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
    qpad = q + _TQC * nt2
    ranks = jnp.arange(q, dtype=jnp.int32) - bounds[jnp.clip(sq_tid, 0, nt2)]
    slot = jnp.where(sq_tid < nt2, q_start[jnp.clip(sq_tid, 0, nt2 - 1)] + ranks, qpad)
    qxyz_t = jnp.zeros((4, qpad + 1), jnp.float32)
    qxyz_t = qxyz_t.at[:3, slot].set(sq_xyz.T, mode="drop")
    qxyz_t = qxyz_t[:, :qpad]

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
    c_start = jnp.stack(c_starts, -1).astype(jnp.int32).reshape(-1)
    c_cnt = jnp.stack(c_cnts, -1).astype(jnp.int32).reshape(-1)

    ctr = knn_tiled._tile_centers(tmap.origin, nt, tile_cells)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nt2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((8, _TQC), jnp.float32),
            pltpu.VMEM((4, 3 * wb), jnp.float32),
            pltpu.VMEM((8, _CHUNK), jnp.float32),
            pltpu.VMEM((_NMOM, _CHUNK), jnp.float32),
            pltpu.VMEM((_NMOM, _TQC), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_pca_kernel, w=w, radius_sq=float(radius * radius))
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((_NMOM, qpad), jnp.float32),),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(q_start, q_cnt, c_start, c_cnt, ctr, qxyz_t, tmap.xyz_t)

    safe_slot = jnp.minimum(slot, qpad - 1)
    m_sorted = out[:10, safe_slot].T  # [Qsorted, 10]
    inv = jnp.zeros(q, jnp.int32).at[order].set(jnp.arange(q, dtype=jnp.int32))
    m = m_sorted[inv]
    m = jnp.where(q_valid[:, None], m, 0.0)

    cnt = m[:, 0]
    safe_n = jnp.maximum(cnt, 1.0)
    # Moments are tile-local (kernel recentering).  The scatter covariance is
    # translation-invariant, so compute it from the *local* mean and second
    # moments, then add the query's tile center back for the returned mean.
    mean_local = m[:, 1:4] / safe_n[:, None]
    xx, yy, zz, xy, xz, yz = m[:, 4], m[:, 5], m[:, 6], m[:, 7], m[:, 8], m[:, 9]
    second = jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        -2,
    )
    cov = second - safe_n[:, None, None] * mean_local[:, :, None] * mean_local[:, None, :]
    ctr_q = ctr.reshape(nt2, 3)[jnp.clip(qtid, 0, nt2 - 1)]
    mean = mean_local + jnp.where(q_valid[:, None], ctr_q, 0.0)
    return PCAMoments(count=cnt, mean=mean, cov=cov)


def radius_pca_moments_reference(tmap: knn_tiled.TiledMap, q_xyz, q_valid, radius=1.0):
    """Brute-force reference for tests."""
    d = jnp.sum((q_xyz[:, None] - tmap.xyz[None]) ** 2, -1)
    w = (d < radius * radius) & tmap.valid[None, :] & q_valid[:, None]
    wf = w.astype(jnp.float32)
    cnt = wf.sum(1)
    safe_n = jnp.maximum(cnt, 1.0)
    mean = (wf @ tmap.xyz) / safe_n[:, None]
    second = jnp.einsum("qm,mi,mj->qij", wf, tmap.xyz, tmap.xyz)
    cov = second - safe_n[:, None, None] * mean[:, :, None] * mean[:, None, :]
    return PCAMoments(count=cnt, mean=mean, cov=cov)
