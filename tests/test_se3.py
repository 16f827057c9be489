"""Unit tests for SE(3) geometry kernels (pfilter_tpu.ops.se3).

Covers the reference's Ceres-parameterization semantics
(src/lidarOptimization.cpp:80-143): exp map, left-perturbation update, and
pose algebra, validated against numpy/finite-difference ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfilter_tpu.ops import se3


def random_pose(rng):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0, np.pi * 0.9)
    q = np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis]).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32) * 5.0
    return se3.Pose(q=jnp.array(q), t=jnp.array(t))


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    p = random_pose(rng)
    v = jnp.array(rng.normal(size=(17, 3)).astype(np.float32))
    R = se3.quat_to_matrix(p.q)
    np.testing.assert_allclose(se3.quat_rotate(p.q, v), v @ np.asarray(R).T, rtol=1e-5, atol=1e-5)


def test_matrix_quat_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        p = random_pose(rng)
        q2 = se3.matrix_to_quat(se3.quat_to_matrix(p.q))
        # Sign-canonical comparison
        q1 = np.asarray(p.q)
        if q1[0] < 0:
            q1 = -q1
        np.testing.assert_allclose(q2, q1, atol=2e-5)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    xi = jnp.array(rng.normal(size=(32, 6)).astype(np.float32)) * 0.7
    pose = se3.exp_se3(xi)
    xi2 = se3.log_se3(pose)
    np.testing.assert_allclose(xi2, xi, rtol=2e-4, atol=2e-4)


def test_exp_small_angle():
    xi = jnp.array([1e-9, -2e-9, 1e-9, 0.5, -0.2, 0.1], jnp.float32)
    p = se3.exp_se3(xi)
    np.testing.assert_allclose(p.q, [1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(p.t, [0.5, -0.2, 0.1], atol=1e-6)


def test_exp_matches_reference_formula():
    """Cross-check exp against rotation about z by 90 deg + translation."""
    theta = np.pi / 2
    xi = jnp.array([0, 0, theta, 1.0, 0.0, 0.0], jnp.float32)
    p = se3.exp_se3(xi)
    np.testing.assert_allclose(p.q, [np.cos(theta / 2), 0, 0, np.sin(theta / 2)], atol=1e-6)
    # V upsilon for pure z-rotation: x' = (sin th)/th * x + (1-cos th)/th * y-dir cross
    expect_t = np.array([np.sin(theta) / theta, (1 - np.cos(theta)) / theta, 0.0])
    np.testing.assert_allclose(p.t, expect_t, atol=1e-6)


def test_compose_inverse_identity():
    rng = np.random.default_rng(3)
    p = random_pose(rng)
    e = se3.pose_compose(p, se3.pose_inverse(p))
    np.testing.assert_allclose(np.abs(e.q[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(e.t, 0.0, atol=1e-5)


def test_transform_points_compose():
    rng = np.random.default_rng(4)
    a, b = random_pose(rng), random_pose(rng)
    pts = jnp.array(rng.normal(size=(9, 3)).astype(np.float32))
    ab = se3.pose_compose(a, b)
    np.testing.assert_allclose(
        se3.transform_points(ab, pts),
        se3.transform_points(a, se3.transform_points(b, pts)),
        rtol=1e-4,
        atol=1e-4,
    )


def test_left_update_matches_reference_plus():
    """PoseSE3Parameterization::Plus: q+ = dq q ; t+ = dq t + dt
    (ref: src/lidarOptimization.cpp:80-95)."""
    rng = np.random.default_rng(5)
    p = random_pose(rng)
    xi = jnp.array(rng.normal(size=6).astype(np.float32)) * 0.1
    d = se3.exp_se3(xi)
    updated = se3.pose_update_left(xi, p)
    np.testing.assert_allclose(updated.q, se3.quat_normalize(se3.quat_mul(d.q, p.q)), atol=1e-6)
    np.testing.assert_allclose(updated.t, se3.quat_rotate(d.q, p.t) + d.t, atol=1e-6)


def test_constant_velocity_prediction():
    """odom_pred = odom * (last^-1 * odom) (ref: src/odomEstimationClass.cpp:235)."""
    rng = np.random.default_rng(6)
    last = random_pose(rng)
    step = se3.exp_se3(jnp.array(rng.normal(size=6).astype(np.float32)) * 0.05)
    odom = se3.pose_compose(last, step)
    pred = se3.constant_velocity_predict(odom, last)
    expect = se3.pose_compose(odom, step)
    np.testing.assert_allclose(pred.q, expect.q, atol=1e-5)
    np.testing.assert_allclose(pred.t, expect.t, atol=1e-4)


def test_jit_and_vmap():
    rng = np.random.default_rng(7)
    xi = jnp.array(rng.normal(size=(8, 6)).astype(np.float32))
    jitted = jax.jit(se3.exp_se3)
    vm = jax.vmap(lambda x: se3.exp_se3(x))
    np.testing.assert_allclose(jitted(xi).q, vm(xi).q, atol=1e-6)


def test_devices_virtual_mesh():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
