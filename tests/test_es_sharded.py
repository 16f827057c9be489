"""Tests for the sharded ES pipeline on the virtual 8-device CPU mesh
(2 sequences x 4 map shards), including single-chip equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfilter_tpu.models import es_odometry
from pfilter_tpu.parallel import es_sharded, mesh as meshlib
from pfilter_tpu.pipeline import ESPipeline
from pfilter_tpu.utils import synthetic

from tests.test_es_odometry import small_config


@pytest.fixture(scope="module")
def scans():
    cfg = small_config()
    world = synthetic.make_world(seed=3, corridor_len=60.0)
    n_frames = 5
    poses = synthetic.make_trajectory(n_frames, speed=0.8)
    xyz, valid = synthetic.render_sequence(world, poses, cfg.lidar, n_azimuth=900, noise=0.005)
    # Pad to scan capacity.
    cap = cfg.capacity.scan_points
    xyz_p = np.zeros((n_frames, cap, 3), np.float32)
    msk_p = np.zeros((n_frames, cap), bool)
    n = xyz.shape[1]
    xyz_p[:, :n] = np.asarray(xyz)
    msk_p[:, :n] = np.asarray(valid)
    return cfg, xyz_p, msk_p


def _run_sharded(cfg, xyz_frames, mask_frames, n_seq, n_map):
    mesh = meshlib.make_mesh(n_seq, n_map)
    state = es_sharded.init_sharded_state(cfg, n_seq, n_map)
    first = es_sharded.make_sharded_step(cfg, mesh, first=True)
    step = es_sharded.make_sharded_step(cfg, mesh, first=False)
    traj = []
    for i in range(xyz_frames.shape[1]):
        xb = jnp.asarray(xyz_frames[:, i])
        mb = jnp.asarray(mask_frames[:, i])
        if i == 0:
            state, diag = first(state, xb, mb)
        else:
            state, diag = step(state, xb, mb)
        traj.append(np.asarray(state.pose.t))
    return np.stack(traj, axis=1), state  # [n_seq, F, 3]


def test_sharded_matches_single_chip(scans):
    cfg, xyz, mask = scans
    n_frames = len(xyz)

    # Single-chip baseline.
    pipe = ESPipeline(cfg=cfg)
    for i in range(n_frames):
        pipe.process_frame(jnp.asarray(xyz[i]), jnp.asarray(mask[i]))
    _, t_single = pipe.trajectory

    # 2 seq x 4 map shards, same sequence in both rows.
    xyz_b = np.stack([xyz, xyz])  # [2, F, N, 3]
    mask_b = np.stack([mask, mask])
    traj, state = _run_sharded(cfg, xyz_b, mask_b, n_seq=2, n_map=4)

    # Both sequence rows identical.
    np.testing.assert_allclose(traj[0], traj[1], atol=1e-5)
    # Sharded result tracks the single-chip result (fp order/ownership differ
    # slightly; the trajectory must agree to millimeters over these frames).
    err = np.linalg.norm(traj[0] - t_single, axis=1)
    assert err.max() < 5e-2, f"sharded vs single-chip divergence: {err}"


def test_distinct_sequences_track_their_own_baselines(scans):
    """Two DIFFERENT worlds in the two seq rows: each row must match its own
    single-chip run (a shared-schedule or window-mixing bug across the seq
    axis would be invisible with identical rows, VERDICT r3 weak #6)."""
    cfg, xyz_a, mask_a = scans

    # Second, different world: different seed and geometry.
    world_b = synthetic.make_world(seed=11, corridor_len=45.0)
    n_frames = xyz_a.shape[0]
    poses_b = synthetic.make_trajectory(n_frames, speed=0.6)
    xyz_b_r, valid_b = synthetic.render_sequence(
        world_b, poses_b, cfg.lidar, n_azimuth=900, noise=0.005
    )
    cap = cfg.capacity.scan_points
    xyz_b = np.zeros((n_frames, cap, 3), np.float32)
    mask_b = np.zeros((n_frames, cap), bool)
    n = xyz_b_r.shape[1]
    xyz_b[:, :n] = np.asarray(xyz_b_r)
    mask_b[:, :n] = np.asarray(valid_b)

    singles = []
    for xyz, mask in ((xyz_a, mask_a), (xyz_b, mask_b)):
        pipe = ESPipeline(cfg=cfg)
        for i in range(n_frames):
            pipe.process_frame(jnp.asarray(xyz[i]), jnp.asarray(mask[i]))
        singles.append(pipe.trajectory[1])

    xyz_rows = np.stack([xyz_a, xyz_b])
    mask_rows = np.stack([mask_a, mask_b])
    traj, _ = _run_sharded(cfg, xyz_rows, mask_rows, n_seq=2, n_map=4)

    # The two rows MUST differ (different worlds) ...
    assert np.linalg.norm(traj[0][-1] - traj[1][-1]) > 1e-3
    # ... and each must track its own single-chip baseline.
    for row, t_single in enumerate(singles):
        err = np.linalg.norm(traj[row] - t_single, axis=1)
        assert err.max() < 5e-2, f"seq row {row} diverged from its baseline: {err}"


def test_sharded_map_partition(scans):
    """Shards hold disjoint hash-owned subsets; union size is sensible."""
    cfg, xyz, mask = scans
    xyz_b = xyz[None]
    mask_b = mask[None]
    traj, state = _run_sharded(cfg, xyz_b, mask_b, n_seq=1, n_map=4)
    # state leaves: [1, CAP, ...] sharded over map; fetch and check validity.
    surf_valid = np.asarray(state.surf_map.valid[0])
    assert surf_valid.sum() > 1000
    # Per-shard counts: each 1/4 block holds some points (hash spreads them).
    blocks = surf_valid.reshape(4, -1)
    assert (blocks.sum(axis=1) > 50).all(), blocks.sum(axis=1)
