"""Checkpoint/resume: a resumed engine must continue bit-identically."""

import numpy as np
import jax.numpy as jnp
import pytest

from pfilter_tpu.models import es_odometry
from pfilter_tpu.ops import features as fops
from pfilter_tpu.utils import checkpoint, synthetic, metrics
from tests.test_es_odometry import small_config


def test_roundtrip_and_resume(tmp_path):
    cfg = small_config()
    world = synthetic.make_world(seed=3, corridor_len=60.0)
    poses = synthetic.make_trajectory(6, speed=0.8)
    xyz, valid = synthetic.render_sequence(world, poses, cfg.lidar, n_azimuth=720, noise=0.004)

    def extract(i):
        return fops.extract_features(
            jnp.asarray(xyz[i]), jnp.asarray(valid[i]), cfg.lidar, cfg.features, cfg.capacity
        )

    state = es_odometry.init_state(cfg)
    state = es_odometry.first_frame(state, extract(0), cfg)
    for i in (1, 2, 3):
        state, _ = es_odometry.es_step(state, extract(i), cfg)

    checkpoint.save_state(tmp_path / "ckpt", state, step=3, extra={"seq": "synthetic"})
    template = es_odometry.init_state(cfg)
    template = es_odometry.first_frame(template, extract(0), cfg)
    restored, meta = checkpoint.restore_state(tmp_path / "ckpt", template)
    assert meta["step"] == 3
    np.testing.assert_array_equal(np.asarray(restored.pose.t), np.asarray(state.pose.t))
    np.testing.assert_array_equal(
        np.asarray(restored.surf_map.valid), np.asarray(state.surf_map.valid)
    )

    # Continue both for 2 more frames: identical trajectories.
    for i in (4, 5):
        state, _ = es_odometry.es_step(state, extract(i), cfg)
        restored, _ = es_odometry.es_step(restored, extract(i), cfg)
    np.testing.assert_array_equal(np.asarray(state.pose.t), np.asarray(restored.pose.t))
    np.testing.assert_array_equal(np.asarray(state.pose.q), np.asarray(restored.pose.q))


def test_shape_mismatch_rejected(tmp_path):
    cfg = small_config()
    state = es_odometry.init_state(cfg)
    checkpoint.save_state(tmp_path / "ckpt", state)
    from dataclasses import replace

    cfg2 = replace(cfg, capacity=replace(cfg.capacity, edge_map_points=8192))
    template = es_odometry.init_state(cfg2)
    with pytest.raises(ValueError):
        checkpoint.restore_state(tmp_path / "ckpt", template)
