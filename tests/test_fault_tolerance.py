"""Host-loop fault tolerance: a corrupt scan must not poison the trajectory
(SURVEY.md §5 — the reference's only resilience is dropping stale queue
messages; a bad frame kills tracking)."""

import numpy as np
import jax.numpy as jnp

from pfilter_tpu.pipeline import ESPipeline
from pfilter_tpu.utils import synthetic, metrics
from tests.test_es_odometry import small_config


def test_corrupt_frame_dropped():
    cfg = small_config()
    world = synthetic.make_world(seed=3, corridor_len=60.0)
    n = 6
    poses = synthetic.make_trajectory(n, speed=0.8)
    xyz, valid = synthetic.render_sequence(world, poses, cfg.lidar, n_azimuth=720, noise=0.004)

    pipe = ESPipeline(cfg=cfg, max_jump_m=3.0)
    for i in range(3):
        pipe.process_frame(np.asarray(xyz[i]), np.asarray(valid[i]))
    t_before = pipe.records[-1].pose_t

    # A garbage scan: random points everywhere (no coherent structure).
    rng = np.random.default_rng(0)
    garbage = rng.uniform(-500, 500, size=(xyz.shape[1], 3)).astype(np.float32)
    pipe.process_frame(garbage, np.asarray(valid[0]))

    # Either the step survived with a small pose change or it was dropped;
    # in both cases the pose must stay finite and near the pre-fault pose.
    t_after = pipe.records[-1].pose_t
    assert np.isfinite(t_after).all()
    assert np.linalg.norm(t_after - t_before) < 3.0

    # Recovery: feeding the real next frames keeps tracking.
    for i in (3, 4, 5):
        pipe.process_frame(np.asarray(xyz[i]), np.asarray(valid[i]))
    t_final = pipe.records[-1].pose_t
    assert np.isfinite(t_final).all()
