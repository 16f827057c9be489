"""Windowed pose-graph smoother (ops/pose_graph.py): fixed-point, noise
rejection, degenerate-direction fill-in, and end-to-end pipeline tracking
with the smoother enabled (single-chip and sharded n_map=1 equivalence)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pfilter_tpu.ops import pose_graph, se3

K = 8


def _chain(n, step_t=(1.0, 0.0, 0.0), yaw_rate=0.02):
    """A smooth constant-velocity pose chain."""
    qs, ts = [], []
    q = np.array([1.0, 0, 0, 0], np.float32)
    t = np.zeros(3, np.float32)
    for i in range(n):
        qs.append(q.copy())
        ts.append(t.copy())
        dq = np.array([np.cos(yaw_rate / 2), 0, 0, np.sin(yaw_rate / 2)], np.float32)
        q = np.asarray(se3.quat_mul(jnp.asarray(dq), jnp.asarray(q)))
        t = t + np.asarray(se3.quat_rotate(jnp.asarray(q), jnp.asarray(np.array(step_t, np.float32))))
    return np.stack(qs), np.stack(ts)


def _strong_h():
    return jnp.broadcast_to(1e4 * jnp.eye(6, dtype=jnp.float32), (K, 6, 6))


def test_consistent_window_is_fixed_point():
    """A window that already satisfies constant velocity with strong anchors
    must come back (numerically) unchanged."""
    q, t = _chain(K)
    sq, st = pose_graph.smooth_window(
        jnp.asarray(q), jnp.asarray(t), _strong_h(), jnp.ones(K, bool)
    )
    np.testing.assert_allclose(np.asarray(st), t, atol=2e-3)
    dq = np.abs(np.asarray(sq) - q).max()
    assert dq < 2e-3, dq


def test_noisy_anchor_pulled_to_motion_model():
    """One weakly-anchored, heavily-perturbed pose in a smooth chain is pulled
    back toward the constant-velocity interpolation of its neighbors."""
    q, t = _chain(K, yaw_rate=0.0)
    t_noisy = t.copy()
    t_noisy[4] += np.array([0.0, 0.6, 0.4], np.float32)  # 0.7 m off-chain
    h = np.broadcast_to(1e4 * np.eye(6, dtype=np.float32), (K, 6, 6)).copy()
    h[4] = 1e-2 * np.eye(6)  # this frame measured almost nothing
    sq, st = pose_graph.smooth_window(
        jnp.asarray(q), jnp.asarray(t_noisy), jnp.asarray(h), jnp.ones(K, bool),
        iters=5,
    )
    err_before = np.linalg.norm(t_noisy[4] - t[4])
    err_after = np.linalg.norm(np.asarray(st)[4] - t[4])
    assert err_after < 0.2 * err_before, (err_before, err_after)
    # Well-anchored poses barely move.
    others = [i for i in range(K) if i != 4]
    assert np.abs(np.asarray(st)[others] - t[others]).max() < 5e-2


def test_degenerate_direction_filled():
    """Frames that measured z well at the window start pin value+slope; later
    frames blind in z (facade-only BPF geometry) are carried by the
    constant-velocity model instead of their noisy anchors — with
    acceleration-penalty smoothness, two pinned frames determine the whole z
    line up to the anchor noise."""
    q, t = _chain(K, yaw_rate=0.0)
    t_noisy = t.copy()
    rng = np.random.default_rng(0)
    z_noise = rng.normal(0, 0.3, K).astype(np.float32)
    z_noise[:2] = 0.0  # the two well-measured frames are accurate
    t_noisy[:, 2] += z_noise
    h = np.zeros((K, 6, 6), np.float32)
    for i in range(K):
        hz = 1e4 if i < 2 else 1e-3
        h[i] = np.diag([1e4, 1e4, 1e4, 1e4, 1e4, hz])
    sq, st = pose_graph.smooth_window(
        jnp.asarray(q), jnp.asarray(t_noisy), jnp.asarray(h), jnp.ones(K, bool),
        iters=5,
    )
    z_err_before = np.abs(t_noisy[2:, 2] - t[2:, 2]).mean()
    z_err_after = np.abs(np.asarray(st)[2:, 2] - t[2:, 2]).mean()
    assert z_err_after < 0.3 * z_err_before, (z_err_before, z_err_after)
    np.testing.assert_allclose(np.asarray(st)[:, 0], t_noisy[:, 0], atol=2e-2)


def test_partial_window_valid_mask():
    """Invalid (still-filling) slots are never moved and don't disturb the
    valid suffix."""
    q, t = _chain(K)
    valid = np.zeros(K, bool)
    valid[K - 3 :] = True
    sq, st = pose_graph.smooth_window(
        jnp.asarray(q), jnp.asarray(t), _strong_h(), jnp.asarray(valid)
    )
    np.testing.assert_allclose(np.asarray(st)[:5], t[:5], atol=1e-6)
    assert np.all(np.isfinite(np.asarray(sq)))


def test_pipeline_with_smoother_tracks():
    """End-to-end: the smoother on the small-world pipeline must not break
    tracking (and its state threads through checkpoints of the pytree)."""
    from pfilter_tpu.pipeline import ESPipeline
    from pfilter_tpu.utils import metrics, synthetic
    from tests.test_es_odometry import small_config

    cfg = small_config()
    cfg = cfg.replace(pose_graph=dataclasses.replace(cfg.pose_graph, enabled=True, window=6))
    world = synthetic.make_world(seed=5, corridor_len=50.0)
    poses = synthetic.make_trajectory(6, speed=0.7)
    xyz, valid = synthetic.render_sequence(world, poses, cfg.lidar, n_azimuth=900, noise=0.004)
    pipe = ESPipeline(cfg=cfg)
    for i in range(6):
        pipe.process_frame(np.asarray(xyz[i]), np.asarray(valid[i]))
    q, t = pipe.trajectory
    gt = metrics.poses_to_matrices(np.asarray(poses.q), np.asarray(poses.t))
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    est = metrics.poses_to_matrices(q, t)
    ate = metrics.ate_rmse(gt, est)
    assert ate < 0.25, ate
    assert pipe.n_dropped == 0


def test_sharded_smoother_matches_single():
    """n_map=2 sharded step with the smoother on matches single-chip."""
    from pfilter_tpu.parallel import es_sharded, mesh as meshlib
    from pfilter_tpu.pipeline import ESPipeline
    from pfilter_tpu.utils import synthetic
    from tests.test_es_odometry import small_config

    cfg = small_config()
    cfg = cfg.replace(pose_graph=dataclasses.replace(cfg.pose_graph, enabled=True, window=6))
    world = synthetic.make_world(seed=5, corridor_len=50.0)
    poses = synthetic.make_trajectory(5, speed=0.7)
    xyz, valid = synthetic.render_sequence(world, poses, cfg.lidar, n_azimuth=900, noise=0.004)

    pipe = ESPipeline(cfg=cfg)
    for i in range(5):
        pipe.process_frame(jnp.asarray(xyz[i]), jnp.asarray(valid[i]))
    _, t_single = pipe.trajectory

    mesh = meshlib.make_mesh(1, 2)
    state = es_sharded.init_sharded_state(cfg, 1, 2)
    first = es_sharded.make_sharded_step(cfg, mesh, first=True)
    step = es_sharded.make_sharded_step(cfg, mesh, first=False)
    traj = []
    for i in range(5):
        xb, mb = jnp.asarray(xyz[i])[None], jnp.asarray(valid[i])[None]
        state, _ = (first if i == 0 else step)(state, xb, mb)
        traj.append(np.asarray(state.pose.t[0]))
    err = np.linalg.norm(np.stack(traj) - t_single, axis=1)
    assert err.max() < 5e-2, err
