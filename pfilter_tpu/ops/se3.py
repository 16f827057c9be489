"""SE(3) geometry kernels: quaternions, se(3) exponential map, point transforms.

TPU-native equivalent of the reference's Ceres local parameterization and
helpers (ref: src/lidarOptimization.cpp:80-156 — ``PoseSE3Parameterization``,
``getTransformFromSe3``, ``skew``).  Everything is pure jnp, fp32, batched,
and differentiable; poses are (quaternion wxyz, translation) pairs.

Conventions
-----------
- Quaternions are stored ``[w, x, y, z]`` (Eigen's constructor order).
- The se(3) tangent is ``[omega(3), upsilon(3)]`` — rotation first, matching
  the reference's Jacobian layout (ref: src/lidarOptimization.cpp:34-41).
- Pose update is a *left* perturbation: ``q+ = dq * q``, ``t+ = dq * t + dt``
  (ref: src/lidarOptimization.cpp:91-92), consistent with point Jacobians
  ``d(T p)/d xi = [-skew(T p) | I]``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Pose(NamedTuple):
    """A rigid transform: x_world = rotate(q, x_body) + t."""

    q: jnp.ndarray  # [..., 4] quaternion wxyz (unit)
    t: jnp.ndarray  # [..., 3]


def identity_pose(dtype=jnp.float32) -> Pose:
    return Pose(q=jnp.array([1.0, 0.0, 0.0, 0.0], dtype), t=jnp.zeros(3, dtype))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Batched skew-symmetric matrix of ``[..., 3]`` vectors (ref: src/lidarOptimization.cpp:145-156)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions, batched."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors ``v [..., 3]`` by quaternions ``q [..., 4]`` (wxyz).

    Uses the 2-cross-product form (cheaper than building the matrix):
    ``v + 2 w (u x v) + 2 u x (u x v)`` with u = q.xyz.
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion -> [..., 3, 3] rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
        ],
        -2,
    )


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation matrix -> wxyz quaternion (branch-free Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically largest pivot.
    qw = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        -1,
    )
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0)], -1),
            jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1)], -1),
            jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2)], -1),
            jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3], -1),
        ],
        -2,
    )
    idx = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def exp_se3(xi: jnp.ndarray) -> Pose:
    """se(3) exponential: tangent ``[omega, upsilon]`` -> (q, t).

    Matches ``getTransformFromSe3`` (ref: src/lidarOptimization.cpp:106-143),
    including the small-angle Taylor branch, but written branch-free with
    ``jnp.where`` so it jits and batches.
    """
    omega = xi[..., :3]
    upsilon = xi[..., 3:]
    theta_sq = jnp.sum(omega * omega, -1, keepdims=True)
    small = theta_sq < 1e-12
    # Double-where: keep sqrt away from 0 on the non-Taylor path so reverse-
    # and forward-mode gradients stay finite at xi == 0.
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    half = 0.5 * theta

    # q = [cos(theta/2), sin(theta/2)/theta * omega]
    w = jnp.where(small, 1.0 - theta_sq / 8.0 + theta_sq * theta_sq / 384.0, jnp.cos(half))
    imag = jnp.where(
        small,
        0.5 - theta_sq / 48.0 + theta_sq * theta_sq / 3840.0,
        jnp.sin(half) / theta,
    )
    q = jnp.concatenate([w, imag * omega], -1)

    # t = V(omega) upsilon, V = I + (1-cos)/th^2 Om + (th - sin)/th^3 Om^2
    om = skew(omega)
    om2 = om @ om
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    b = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / (safe_sq * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), om.shape)
    V = eye + a[..., None] * om + b[..., None] * om2
    t = jnp.einsum("...ij,...j->...i", V, upsilon)
    return Pose(q=q, t=t)


def log_se3(pose: Pose) -> jnp.ndarray:
    """Inverse of :func:`exp_se3` — returns ``[omega, upsilon]``."""
    q = quat_normalize(pose.q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn_sq = jnp.sum(v * v, -1, keepdims=True)
    small_v = vn_sq < 1e-14
    vn = jnp.sqrt(jnp.where(small_v, 1.0, vn_sq))
    theta = 2.0 * jnp.arctan2(jnp.where(small_v, 0.0, vn), w[..., None])
    omega = v * jnp.where(small_v, 2.0, theta / vn)
    theta_sq = jnp.sum(omega * omega, -1, keepdims=True)
    small = theta_sq < 1e-12
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    om = skew(omega)
    om2 = om @ om
    # V^{-1} = I - 1/2 Om + (1/th^2 - (1+cos)/(2 th sin)) Om^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - theta * jnp.cos(theta * 0.5) / (2.0 * jnp.sin(theta * 0.5))) / safe_sq,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), om.shape)
    Vinv = eye - 0.5 * om + coef[..., None] * om2
    upsilon = jnp.einsum("...ij,...j->...i", Vinv, pose.t)
    return jnp.concatenate([omega, upsilon], -1)


def pose_compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b (apply b first, then a)."""
    return Pose(q=quat_normalize(quat_mul(a.q, b.q)), t=quat_rotate(a.q, b.t) + a.t)


def pose_inverse(p: Pose) -> Pose:
    qinv = quat_conj(p.q)
    return Pose(q=qinv, t=-quat_rotate(qinv, p.t))


def pose_update_left(delta_xi: jnp.ndarray, p: Pose) -> Pose:
    """Left-multiplicative update: exp(delta) ∘ p with the reference's
    translation rule ``t+ = dq t + dt`` (ref: src/lidarOptimization.cpp:91-92)."""
    d = exp_se3(delta_xi)
    return Pose(q=quat_normalize(quat_mul(d.q, p.q)), t=quat_rotate(d.q, p.t) + d.t)


def transform_points(p: Pose, xyz: jnp.ndarray) -> jnp.ndarray:
    """Apply a single pose to ``[..., 3]`` points (ref ``pointAssociateToMap``,
    src/odomEstimationClass.cpp:162-174).  Broadcasts q/t over leading dims."""
    return quat_rotate(p.q, xyz) + p.t


def constant_velocity_predict(odom: Pose, last_odom: Pose) -> Pose:
    """odom * (last_odom^-1 * odom) (ref: src/odomEstimationClass.cpp:235)."""
    return pose_compose(odom, pose_compose(pose_inverse(last_odom), odom))
