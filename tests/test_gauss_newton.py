"""Tests for the batched Gauss-Newton registration core.

Key checks (SURVEY.md §4): analytic Jacobians vs autodiff/finite differences
(the reference's Jacobians are analytic too, src/lidarOptimization.cpp:30-43,
64-76 — here we verify ours against ground truth rather than trusting
transcription), and full pose recovery on synthetic correspondences.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pfilter_tpu.ops import gauss_newton as gn
from pfilter_tpu.ops import se3


def _random_pose(rng, angle_scale=0.5, trans_scale=2.0):
    xi = np.concatenate(
        [rng.normal(size=3) * angle_scale, rng.normal(size=3) * trans_scale]
    ).astype(np.float32)
    return se3.exp_se3(jnp.array(xi))


def test_edge_jacobian_matches_autodiff():
    rng = np.random.default_rng(0)
    pose = _random_pose(rng)
    m = 16
    pts = jnp.array(rng.normal(size=(m, 3)).astype(np.float32) * 3)
    pa = jnp.array(rng.normal(size=(m, 3)).astype(np.float32) * 3)
    pb = pa + jnp.array(rng.normal(size=(m, 3)).astype(np.float32))

    r, j = gn.edge_residual_jacobian(pose, pts, pa, pb)

    def f(xi):
        r2, _ = gn.edge_residual_jacobian(se3.pose_update_left(xi, pose), pts, pa, pb)
        return r2

    j_auto = jax.jacfwd(f)(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_auto), rtol=2e-3, atol=2e-4)


def test_surf_jacobian_matches_autodiff():
    rng = np.random.default_rng(1)
    pose = _random_pose(rng)
    m = 16
    pts = jnp.array(rng.normal(size=(m, 3)).astype(np.float32) * 3)
    n = rng.normal(size=(m, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n = jnp.array(n)
    d = jnp.array(rng.normal(size=m).astype(np.float32))

    r, j = gn.surf_residual_jacobian(pose, pts, n, d)

    def f(xi):
        r2, _ = gn.surf_residual_jacobian(se3.pose_update_left(xi, pose), pts, n, d)
        return r2

    j_auto = jax.jacfwd(f)(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_auto), rtol=2e-3, atol=2e-4)


def test_fit_lines():
    rng = np.random.default_rng(2)
    m = 8
    centers = rng.normal(size=(m, 3)).astype(np.float32) * 5
    dirs = rng.normal(size=(m, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    offsets = np.linspace(-0.5, 0.5, 5)
    neigh = centers[:, None] + offsets[None, :, None] * dirs[:, None]
    neigh = neigh + rng.normal(size=neigh.shape).astype(np.float32) * 0.005
    pa, pb, ok = gn.fit_lines(jnp.array(neigh), 3.0, 0.1)
    assert bool(jnp.all(ok))
    got_dir = np.array(pa - pb)
    got_dir /= np.linalg.norm(got_dir, axis=1, keepdims=True)
    cos = np.abs((got_dir * dirs).sum(-1))
    assert np.all(cos > 0.999)
    # blobs (no dominant direction) must be rejected
    blob = rng.normal(size=(m, 5, 3)).astype(np.float32) * 0.3
    _, _, ok2 = gn.fit_lines(jnp.array(blob), 3.0, 0.1)
    assert not bool(jnp.all(ok2))


def test_fit_planes():
    rng = np.random.default_rng(3)
    m = 8
    normals = rng.normal(size=(m, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    centers = rng.normal(size=(m, 3)).astype(np.float32) * 5
    # 5 points per plane
    neigh = np.zeros((m, 5, 3), np.float32)
    for i in range(m):
        u = np.cross(normals[i], [0, 0, 1.0])
        if np.linalg.norm(u) < 1e-3:
            u = np.cross(normals[i], [0, 1.0, 0])
        u /= np.linalg.norm(u)
        v = np.cross(normals[i], u)
        ab = rng.normal(size=(5, 2)).astype(np.float32)
        neigh[i] = centers[i] + ab[:, :1] * u + ab[:, 1:] * v
    n, d, ok = gn.fit_planes(jnp.array(neigh), 0.2)
    assert bool(jnp.all(ok))
    cos = np.abs((np.asarray(n) * normals).sum(-1))
    assert np.all(cos > 0.999)
    resid = np.abs((np.asarray(n) * centers).sum(-1) + np.asarray(d))
    assert np.all(resid < 1e-3)
    # non-planar neighborhoods rejected
    blob = rng.normal(size=(m, 5, 3)).astype(np.float32) * 2
    _, _, ok2 = gn.fit_planes(jnp.array(blob), 0.2)
    assert not bool(jnp.all(ok2))


def test_gn_recovers_pose():
    """Full GN loop: recover a known SE(3) transform from synthetic
    plane + line factors (the Ceres-replacement acceptance test)."""
    rng = np.random.default_rng(4)
    true_pose = _random_pose(rng, angle_scale=0.15, trans_scale=0.5)

    # surf factors: random planes, scan points that land on them under true_pose
    ms = 64
    n = rng.normal(size=(ms, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    p_world = rng.normal(size=(ms, 3)).astype(np.float32) * 8
    d = -(n * p_world).sum(-1)
    pts_surf = np.asarray(se3.transform_points(se3.pose_inverse(true_pose), jnp.array(p_world)))

    # edge factors: random lines, scan points on them under true_pose
    me = 64
    la = rng.normal(size=(me, 3)).astype(np.float32) * 8
    ld = rng.normal(size=(me, 3)).astype(np.float32)
    ld /= np.linalg.norm(ld, axis=1, keepdims=True)
    t_on = rng.normal(size=(me, 1)).astype(np.float32)
    p_on_line = la + t_on * ld
    pts_edge = np.asarray(se3.transform_points(se3.pose_inverse(true_pose), jnp.array(p_on_line)))

    surf = gn.Correspondences(
        kind="surf",
        points=jnp.array(pts_surf),
        geom_a=jnp.array(n),
        geom_b=jnp.stack([jnp.array(d), jnp.zeros(ms), jnp.zeros(ms)], -1),
        weight=jnp.ones(ms),
        valid=jnp.ones(ms, bool),
    )
    edge = gn.Correspondences(
        kind="edge",
        points=jnp.array(pts_edge),
        geom_a=jnp.array(la),
        geom_b=jnp.array(la + 0.2 * ld),
        weight=jnp.ones(me),
        valid=jnp.ones(me, bool),
    )

    pose = se3.identity_pose()
    for _ in range(10):
        pose, _ = gn.gn_iteration(pose, [edge, surf], huber_delta=0.1, damping=1e-4)

    np.testing.assert_allclose(np.asarray(pose.t), np.asarray(true_pose.t), atol=2e-3)
    dq = se3.quat_mul(se3.quat_conj(pose.q), true_pose.q)
    assert abs(float(dq[0])) > 0.999999


def test_masked_factors_ignored():
    """Invalid rows must not influence the step."""
    rng = np.random.default_rng(5)
    ms = 32
    n = np.tile(np.array([[0, 0, 1.0]], np.float32), (ms, 1))
    pts = rng.normal(size=(ms, 3)).astype(np.float32)
    pts[:, 2] = 0.3  # all 0.3 above plane z=0 -> optimal shift z -= 0.3
    garbage = pts.copy()
    garbage[:, 2] = 99.0
    all_pts = np.concatenate([pts, garbage])
    valid = np.concatenate([np.ones(ms, bool), np.zeros(ms, bool)])
    surf = gn.Correspondences(
        kind="surf",
        points=jnp.array(all_pts),
        geom_a=jnp.array(np.tile(n, (2, 1))),
        geom_b=jnp.zeros((2 * ms, 3)),
        weight=jnp.ones(2 * ms),
        valid=jnp.array(valid),
    )
    pose = se3.identity_pose()
    for _ in range(8):
        pose, _ = gn.gn_iteration(pose, [surf], huber_delta=10.0, damping=1e-5)
    assert abs(float(pose.t[2]) + 0.3) < 1e-3


def test_minmax_normalizer_matches_reference():
    """observeMean transcription (ref: src/odomEstimationClass.cpp:136-160)."""
    vals = np.array([3.0, 7.0, 5.0, 11.0], np.float64)
    expect = vals.copy()
    mn, mx = expect.min(), expect.max()
    expect = np.abs((expect - mn) / (mx - mn) - 1.0) * 2.0
    expect = np.maximum(expect, 0.1)
    got = gn.minmax_normalize_weights(
        jnp.array(vals, jnp.float32), jnp.ones(4, bool), floor=0.1
    )
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6)
    # degenerate: all equal -> weight 1
    got2 = gn.minmax_normalize_weights(jnp.full(4, 5.0), jnp.ones(4, bool), floor=0.1)
    np.testing.assert_allclose(np.asarray(got2), 1.0)
