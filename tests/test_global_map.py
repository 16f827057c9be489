"""Tiled global map (C9) tests: insertion, per-cell downsampling, cell reuse."""

import jax.numpy as jnp
import numpy as np

from pfilter_tpu.models.global_map import CELL_SIZE, GlobalMap


def _scan(rng, n, spread=40.0):
    xyz = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(0, 5, size=n)
    return jnp.asarray(xyz), jnp.ones(n, bool)


def test_insert_and_get():
    rng = np.random.default_rng(0)
    gm = GlobalMap(max_cells=64, cell_cap=4096, resolution=0.4)
    xyz, valid = _scan(rng, 5000)
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    gm.update(q, t, xyz, valid)
    m = gm.get_map()
    assert 100 < len(m) <= 5000
    # All map points near some input point (downsampling moves <= leaf).
    d = np.abs(m[:, None] - np.asarray(xyz)[None]).max(-1).min(1)
    assert d.max() < 0.4


def test_voxel_dedup_across_frames():
    """Re-inserting the same static scene must not grow the map."""
    rng = np.random.default_rng(1)
    gm = GlobalMap(max_cells=64, cell_cap=4096, resolution=0.4)
    xyz, valid = _scan(rng, 3000)
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    gm.update(q, t, xyz, valid)
    n1 = len(gm.get_map())
    gm.update(q, t, xyz, valid)
    n2 = len(gm.get_map())
    assert abs(n2 - n1) <= 0.02 * n1


def test_pose_transform_applied():
    rng = np.random.default_rng(2)
    gm = GlobalMap(max_cells=64, cell_cap=4096, resolution=0.4)
    xyz = jnp.asarray(rng.uniform(-5, 5, size=(500, 3)).astype(np.float32))
    valid = jnp.ones(500, bool)
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.asarray([200.0, 0.0, 0.0], jnp.float32)
    gm.update(q, t, xyz, valid)
    m = gm.get_map()
    assert np.abs(m[:, 0] - 200.0).max() < 6.0


def test_cells_grow_along_trajectory():
    rng = np.random.default_rng(3)
    gm = GlobalMap(max_cells=128, cell_cap=2048, resolution=0.4)
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    for i in range(4):
        xyz, valid = _scan(rng, 2000, spread=30.0)
        t = jnp.asarray([i * CELL_SIZE, 0.0, 0.0], jnp.float32)
        gm.update(q, t, xyz, valid)
    m = gm.get_map()
    # Map spans the whole trajectory.
    assert m[:, 0].min() < 0 and m[:, 0].max() > 3 * CELL_SIZE


def test_run_sequence_global_map_artifact(tmp_path):
    """run_kitti --global-map end-to-end: driver feeds pose + scan into the
    tiled map and saves npz/PLY artifacts (ref laserMappingNode was built but
    never launched; here the map path is wired and tested)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import numpy as np

    from tests.test_es_odometry import small_config
    from pfilter_tpu.utils import synthetic
    from run_kitti import run_sequence

    cfg = small_config()
    world = synthetic.make_world(seed=3, corridor_len=40.0)
    poses = synthetic.make_trajectory(3, speed=0.8)
    xyz, valid = synthetic.render_sequence(world, poses, cfg.lidar, n_azimuth=600, noise=0.004)
    scans = [np.asarray(xyz[i])[np.asarray(valid[i])] for i in range(3)]
    res = run_sequence(cfg, scans, None, tmp_path, "t", global_map_stride=1)
    assert res["frames"] == 3
    data = np.load(tmp_path / "t_map.npz")
    pts = data["xyz"]
    assert len(pts) > 1000
    assert np.isfinite(pts).all()
    assert (tmp_path / "t_map.ply").exists()
