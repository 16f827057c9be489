"""Ground-truth provenance channel (round 5 instrumentation): the renderer's
mover-origin mask must ride the exact voxel pipeline the persistence
counters use, surface as per-frame contamination counts, and leave the
estimated trajectory bit-identical (it is a diagnostic, not an input to the
pose).  Also covers the dynamics-bearing worlds the persistence study runs
on (make_highway_world, mover-speed parameterization)."""

import numpy as np
import pytest

from pfilter_tpu.pipeline import ESPipeline
from pfilter_tpu.utils import synthetic

from tests.test_es_odometry import small_config


@pytest.fixture(scope="module")
def mover_scene():
    cfg = small_config()
    world = synthetic.make_world(seed=3, corridor_len=80.0, n_movers=6)
    n_frames = 8
    poses = synthetic.make_ramp_trajectory(n_frames, speed=1.0)
    # Start amid the movers so their returns land at side bearings (straight
    # ahead they fall in the ring-end curvature margin and never become
    # features — the reference's extractor skips the same +-5 window).
    ts = np.asarray(poses.t).copy()
    ts[:, 0] += 38.0
    poses = synthetic.se3.Pose(q=poses.q, t=ts.astype(np.float32))
    frames = []
    for i in range(n_frames):
        xyz, valid, mover = synthetic.render_scan(
            synthetic.se3.Pose(q=poses.q[i], t=poses.t[i]), world, cfg.lidar,
            256, noise=0.005, seed=0, t_time=i, return_mover=True,
        )
        frames.append((np.asarray(xyz), np.asarray(valid), np.asarray(mover)))
    return cfg, frames


def test_renderer_mover_mask(mover_scene):
    cfg, frames = mover_scene
    for xyz, valid, mover in frames:
        n_m = int((mover & valid).sum())
        assert n_m > 0, "movers should produce returns"
        assert n_m < 0.2 * valid.sum(), "movers should be a minority"
        # Mover returns sit above ground and inside the corridor.
        pts = xyz[mover & valid]
        assert pts.shape[1] == 3


def test_contamination_counts_and_pose_invariance(mover_scene):
    cfg, frames = mover_scene
    pipe = ESPipeline(cfg=cfg, provenance=True)
    for xyz, valid, mover in frames:
        pipe.process_frame(xyz, valid, mover)
    pipe.flush()
    contam = np.stack([r.contam for r in pipe.records])
    assert contam.shape[1] == 2
    assert contam.sum() > 0, "mover-origin points must reach the map"
    # Map rg carries the third channel; contaminated points are a minority.
    surf = pipe.state.surf_map
    assert surf.rg.shape[1] == 3
    last = pipe.records[-1]
    assert contam[-1].sum() < 0.5 * (last.edge_map_size + last.surf_map_size)

    # The provenance channel must not perturb the estimate: the same frames
    # without it yield a bit-identical trajectory.
    pipe0 = ESPipeline(cfg=cfg, provenance=False)
    for xyz, valid, _ in frames:
        pipe0.process_frame(xyz, valid)
    pipe0.flush()
    q1, t1 = pipe.trajectory
    q0, t0 = pipe0.trajectory
    np.testing.assert_array_equal(t1, t0)
    np.testing.assert_array_equal(q1, q0)


def test_highway_world_geometry():
    w = synthetic.make_highway_world(length=300.0, n_traffic=30)
    # Guardrails + posts + markers + gantry posts give real along-track
    # structure (without the posts the empty highway is degenerate and
    # tracking collapses — measured, see docs/persistence_accuracy.md).
    assert w.poles.shape[0] > 120
    assert w.movers.shape[0] == 30
    # No movers in the ego lane (|y| >= 1.2): the ego would clip through
    # slower boxes and rays cast from inside an AABB return garbage.
    assert (np.abs(w.movers[:, 1]) > 1.2).all()
    # Traffic direction matches lane side (oncoming on -y).
    oncoming = w.movers[:, 1] < 0
    assert (w.movers[oncoming, 2] < 0).all()
    assert (w.movers[~oncoming, 2] > 0).all()


def test_city_world_mover_speed_param():
    w = synthetic.make_city_world(seed=7, n_movers=40, mover_speed=(0.1, 2.5))
    sp = np.abs(w.movers[:, 2]) + np.abs(w.movers[:, 3])
    assert (sp >= 0.1 - 1e-6).all() and (sp <= 2.5 + 1e-6).all()
    assert w.movers.shape[0] == 40
