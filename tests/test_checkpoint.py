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


def test_missing_pg_leaves_backfilled(tmp_path):
    """A pre-pose-graph checkpoint (no pg_* leaves) restores with the
    template's init pg window instead of hard-failing (ADVICE r3)."""
    import json

    import numpy as np

    cfg = small_config()
    state = es_odometry.init_state(cfg)
    state = state._replace(pose=state.pose._replace(t=jnp.ones(3)))
    checkpoint.save_state(tmp_path / "ckpt", state, step=7)

    # Strip the pg_* leaves from the stored npz to simulate an old checkpoint.
    p = tmp_path / "ckpt" / "state.npz"
    with np.load(p) as z:
        kept = {k: z[k] for k in z.files if not k.startswith("pg_")}
    np.savez_compressed(p, **kept)
    meta_p = tmp_path / "ckpt" / "meta.json"
    meta = json.loads(meta_p.read_text())
    meta["leaf_names"] = [n for n in meta["leaf_names"] if not n.startswith("pg_")]
    meta["n_leaves"] = len(meta["leaf_names"])
    meta_p.write_text(json.dumps(meta))

    template = es_odometry.init_state(cfg)
    restored, rmeta = checkpoint.restore_state(tmp_path / "ckpt", template)
    assert sorted(rmeta["restored_from_template"]) == ["pg_h", "pg_q", "pg_t", "pg_valid"]
    np.testing.assert_array_equal(np.asarray(restored.pose.t), np.ones(3))
    np.testing.assert_array_equal(np.asarray(restored.pg_valid), np.asarray(template.pg_valid))


def test_window_resize_backfills_pg(tmp_path):
    """Changing pose_graph.window resizes pg_* — restore falls back to the
    template's (empty) window for those leaves and keeps everything else."""
    from dataclasses import replace

    cfg = small_config()
    state = es_odometry.init_state(cfg)
    state = state._replace(pose=state.pose._replace(t=2.0 * jnp.ones(3)))
    checkpoint.save_state(tmp_path / "ckpt", state)

    cfg2 = replace(cfg, pose_graph=replace(cfg.pose_graph, window=cfg.pose_graph.window + 3))
    template = es_odometry.init_state(cfg2)
    restored, meta = checkpoint.restore_state(tmp_path / "ckpt", template)
    assert sorted(meta["restored_from_template"]) == ["pg_h", "pg_q", "pg_t", "pg_valid"]
    assert restored.pg_q.shape[0] == cfg.pose_graph.window + 3
    np.testing.assert_array_equal(np.asarray(restored.pose.t), 2.0 * np.ones(3))


def test_legacy_positional_checkpoint_restores(tmp_path):
    """leaf_{i} positional checkpoints (pre-named format) still restore."""
    import json

    import numpy as np

    cfg = small_config()
    state = es_odometry.init_state(cfg)
    checkpoint.save_state(tmp_path / "ckpt", state, step=2)

    # Rewrite as the legacy positional format.
    import jax

    leaves, _ = jax.tree.flatten(state)
    p = tmp_path / "ckpt" / "state.npz"
    np.savez_compressed(p, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    meta_p = tmp_path / "ckpt" / "meta.json"
    meta = json.loads(meta_p.read_text())
    del meta["leaf_names"]
    meta["n_leaves"] = len(leaves)
    meta_p.write_text(json.dumps(meta))

    restored, rmeta = checkpoint.restore_state(tmp_path / "ckpt", es_odometry.init_state(cfg))
    assert rmeta["step"] == 2
    np.testing.assert_array_equal(np.asarray(restored.pose.q), np.asarray(state.pose.q))
