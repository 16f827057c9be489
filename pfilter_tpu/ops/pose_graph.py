"""Windowed pose-graph smoother over the last K scan-matched poses.

The reference has no smoothing back-end at all — each frame's pose is the
raw scan-to-map GN result (ref: src/odomEstimationClass.cpp:229-282), so a
frame with degenerate geometry (a corridor constrains nothing along-track; a
facade-only BPF frame barely constrains z) injects its full error into the
trajectory AND the map.  This module is the windowed back-end SURVEY.md §5/§7
step 9 calls for, sized to the problem: K recent poses, each anchored to its
scan-match result by the 6x6 information matrix H that the per-frame GN
ALREADY computes (psum-reduced across map shards in the sharded path), plus
constant-velocity smoothness factors.  Directions the scan measured well
(large H eigenvalues) stay pinned; directions it measured badly are filled
in by the motion model.

Formulation.  Per window slot i we optimize a tangent increment
xi_i = (omega_i, upsilon_i) applied around the anchor pose A_i as

    X_i = ( exp_q(omega_i) * A_i.q ,  A_i.t + upsilon_i )

— rotation left-multiplied, translation additive.  This matches the
convention of the scan-match H up to the GN re-centering lever arm (the GN
runs re-centered at the predicted translation, so |t_local| is bounded by
the per-frame motion, a few meters; the omega/upsilon cross terms it omits
are O(|t_local|)).

Cost:  sum_i  xi_i^T H_i xi_i                      (anchors)
     + sum_i  || log( rel_i^{-1} rel_{i+1} ) ||^2_W (constant-velocity)

with rel_i = X_i^{-1} X_{i+1} and W = diag(w_rot I3, w_xy, w_xy, w_z).
The cost is a small near-quadratic (6K dims, K ~ 8): Newton steps with the
autodiff Hessian + Tikhonov damping converge in 2-3 iterations.  The whole
solve is a few thousand FLOPs — noise next to one kNN pass — and purely
replicated arithmetic, so it is shard-safe without any extra collective
(every shard holds the same window and computes the same correction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pfilter_tpu.ops import se3


def _apply_xi(xi: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray):
    """xi [K,6] = (omega, upsilon) around anchors (q [K,4], t [K,3])."""
    dq = se3.exp_se3(xi)  # uses omega for q; upsilon handled separately
    qn = se3.quat_normalize(se3.quat_mul(dq.q, q))
    return qn, t + xi[:, 3:]


def _window_cost(
    xi: jnp.ndarray,
    q: jnp.ndarray,
    t: jnp.ndarray,
    anchor_h: jnp.ndarray,
    valid: jnp.ndarray,
    w_rot: float,
    w_xy: float,
    w_z: float,
) -> jnp.ndarray:
    k = q.shape[0]
    qn, tn = _apply_xi(xi, q, t)

    # Anchor factors: xi^T H xi, invalid slots contribute nothing.
    e_anchor = jnp.einsum("ki,kij,kj->k", xi, anchor_h, xi)
    cost = jnp.sum(jnp.where(valid, e_anchor, 0.0))

    # Constant-velocity factors over consecutive valid triples.
    poses = se3.Pose(q=qn, t=tn)
    pa = se3.Pose(q=qn[:-1], t=tn[:-1])
    pb = se3.Pose(q=qn[1:], t=tn[1:])
    rel = se3.pose_compose(se3.pose_inverse(pa), pb)  # [K-1]
    acc = se3.log_se3(
        se3.pose_compose(
            se3.pose_inverse(se3.Pose(q=rel.q[:-1], t=rel.t[:-1])),
            se3.Pose(q=rel.q[1:], t=rel.t[1:]),
        )
    )  # [K-2, 6]
    w = jnp.array([w_rot, w_rot, w_rot, w_xy, w_xy, w_z], jnp.float32)
    tri_ok = valid[:-2] & valid[1:-1] & valid[2:]
    e_cv = jnp.sum(acc * acc * w, axis=-1)
    cost = cost + jnp.sum(jnp.where(tri_ok, e_cv, 0.0))
    del poses, k
    return cost


def smooth_window(
    q: jnp.ndarray,  # [K,4] anchor quaternions (oldest..newest)
    t: jnp.ndarray,  # [K,3]
    anchor_h: jnp.ndarray,  # [K,6,6] scan-match information
    valid: jnp.ndarray,  # [K] — leading slots may be empty while filling
    w_rot: float = 400.0,
    w_xy: float = 25.0,
    w_z: float = 100.0,
    iters: int = 3,
    damping: float = 1.0e-3,
):
    """Solve the windowed pose graph; returns corrected (q [K,4], t [K,3]).

    Weights are information-scale (1/sigma^2): w_rot=400 ~ sigma 0.05 rad of
    inter-frame rotation CHANGE, w_xy=25 ~ sigma 0.2 m of along-path
    acceleration, w_z=100 ~ sigma 0.1 m vertical — loose enough for real
    vehicle dynamics, tight enough to carry degenerate directions."""
    kdim = q.shape[0] * 6

    def cost_flat(x):
        return _window_cost(
            x.reshape(-1, 6), q, t, anchor_h, valid, w_rot, w_xy, w_z
        )

    grad_f = jax.grad(cost_flat)
    hess_f = jax.hessian(cost_flat)

    def body(_, x):
        g = grad_f(x)
        h = hess_f(x)
        # Jacobi-preconditioned solve: anchor information spans ~1e10 (rot
        # blocks of dense scan matches) down to ~0 (a BPF frame's z), far
        # beyond fp32 Cholesky's conditioning range — unscaled solves emit
        # NaN poses (observed: BPF city run dropped every frame).  Scaling
        # to unit diagonal makes the damping meaningful per-direction, and
        # it is exactly the per-direction flavor we want: well-measured
        # directions keep their stiffness, blind ones get the motion model.
        d = jnp.sqrt(jnp.clip(jnp.diagonal(h), 1e-8, None))
        hn = h / d[:, None] / d[None, :] + damping * jnp.eye(kdim, dtype=x.dtype)
        y = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(hn), g / d)
        return x - y / d

    x = jax.lax.fori_loop(0, iters, body, jnp.zeros(kdim, jnp.float32))
    xi = x.reshape(-1, 6)
    # Never move invalid slots.
    xi = jnp.where(valid[:, None], xi, 0.0)
    return _apply_xi(xi, q, t)


def smoothed_newest(
    pg_q, pg_t, pg_h, pg_valid, raw_pose: se3.Pose, pgc, max_correction_m: float = 1.0
) -> se3.Pose:
    """Smooth the window and return the newest corrected pose, guarded: a
    non-finite or implausibly large correction (fp32 Hessian pathologies do
    occur on sparse-feature frames) falls back to the raw scan-match pose —
    the smoother must never be able to break a pipeline that works without
    it."""
    sm_q, sm_t = smooth_window(
        pg_q,
        pg_t,
        pg_h * pgc.anchor_scale,
        pg_valid,
        w_rot=pgc.w_rot,
        w_xy=pgc.w_xy,
        w_z=pgc.w_z,
        iters=pgc.iters,
        damping=pgc.damping,
    )
    nq, nt = sm_q[-1], sm_t[-1]
    ok = (
        jnp.all(jnp.isfinite(nq))
        & jnp.all(jnp.isfinite(nt))
        & (jnp.linalg.norm(jnp.where(jnp.isfinite(nt), nt - raw_pose.t, jnp.inf)) < max_correction_m)
        & (jnp.abs(jnp.linalg.norm(jnp.where(jnp.isfinite(nq), nq, 0.0)) - 1.0) < 0.1)
    )
    return se3.Pose(
        q=jnp.where(ok, nq, raw_pose.q),
        t=jnp.where(ok, nt, raw_pose.t),
    )


def push_window(wq, wt, wh, wvalid, q, t, h):
    """Shift the window left and append the newest (pose, information)."""
    wq = jnp.concatenate([wq[1:], q[None]], 0)
    wt = jnp.concatenate([wt[1:], t[None]], 0)
    wh = jnp.concatenate([wh[1:], h[None]], 0)
    wvalid = jnp.concatenate([wvalid[1:], jnp.ones(1, bool)], 0)
    return wq, wt, wh, wvalid
