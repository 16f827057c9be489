"""End-to-end BPF pipeline test: ground removal -> DCVC -> PCA classify ->
beam/pillar/facade scan-to-map odometry on the synthetic corridor world
(the TPU twin of the reference's default launch path,
launch/pfilter_kitti.launch:5-10 with featurePreExtract=1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pfilter_tpu.config import (
    CapacityConfig,
    LidarConfig,
    OdometryConfig,
    PipelineConfig,
)
from pfilter_tpu.models import bpf_frontend, bpf_odometry
from pfilter_tpu.utils import metrics, synthetic


def small_config():
    # 32 beams: the BPF pipeline needs beam/pillar feature density a 16-beam
    # scan of a sparse synthetic world cannot provide (the reference runs it
    # on HDL-64 KITTI data); 16-beam coverage is exercised by the ES tests.
    return PipelineConfig(
        mode="bpf",
        lidar=LidarConfig(num_lines=32, min_distance=1.0, max_distance=60.0),
        odometry=OdometryConfig(map_resolution=0.4, max_outer_iters=8),
        capacity=CapacityConfig(
            scan_points=40960,
            ring_points=1536,
            edge_points=4096,
            surf_points=40960,
            ds_edge_points=4096,
            ds_surf_points=16384,
            edge_map_points=32768,
            surf_map_points=131072,
        ),
    )


@pytest.fixture(scope="module")
def bpf_run():
    cfg = small_config()
    world = synthetic.make_world(seed=5, corridor_len=60.0)
    n_frames = 8
    poses = synthetic.make_trajectory(n_frames, speed=0.8)
    xyz, valid = synthetic.render_sequence(world, poses, cfg.lidar, n_azimuth=1200, noise=0.004)
    gt = metrics.poses_to_matrices(np.asarray(poses.q), np.asarray(poses.t))
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)

    masks_per_frame = []
    fr0 = None
    for i in range(n_frames):
        fr = bpf_frontend.run_frontend(jnp.asarray(xyz[i]), jnp.asarray(valid[i]), cfg)
        if i == 0:
            fr0 = fr
        masks_per_frame.append(
            {"beam": fr.beam_mask, "pillar": fr.pillar_mask, "facade": fr.facade_mask}
        )
    return cfg, gt, xyz, valid, masks_per_frame, fr0


def test_frontend_masks_sane(bpf_run):
    cfg, _, xyz, valid, masks, fr = bpf_run
    g = np.asarray(fr.ground_mask)
    ng = np.asarray(fr.nonground_mask)
    v = np.asarray(valid[0])
    z = np.asarray(xyz[0])[:, 2]
    # A 16-beam scan over a street scene sees plenty of ground.
    assert g.sum() > 0.2 * v.sum()
    # Ground points are low (sensor at 1.73 m, ground at z=-1.73 sensor frame
    # is transformed out; here scans are in sensor frame: ground z ~ -1.73).
    assert np.abs(z[g] - z[g].mean()).mean() < 0.5
    assert not (g & ng).any()
    # Facades dominate the classified features in a corridor of buildings.
    fm = np.asarray(masks[0]["facade"])
    pm = np.asarray(masks[0]["pillar"])
    assert (fm & ~g).sum() > 200
    assert pm.sum() > 10  # poles exist
    # Default config routes ground into the facade (plane-cost) channel —
    # the z-constraint the reference's BPF preprocessing throws away
    # (PCAClassifyConfig.ground_as_facade).  Line channels never get ground.
    assert (fm & g).sum() == g.sum()
    assert not (pm & g).any()


def test_frontend_reference_faithful_split(bpf_run):
    """ground_as_facade=False restores the reference's channel split
    (src/additionNode.cpp:24-27): no classified point is ground."""
    import dataclasses

    cfg, _, xyz, valid, _, fr_def = bpf_run
    cfg_rf = cfg.replace(pca=dataclasses.replace(cfg.pca, ground_as_facade=False))
    fr = bpf_frontend.run_frontend(jnp.asarray(xyz[0]), jnp.asarray(valid[0]), cfg_rf)
    g = np.asarray(fr.ground_mask)
    for m in (fr.beam_mask, fr.pillar_mask, fr.facade_mask):
        assert not (np.asarray(m) & g).any()
    # And the non-ground facade content is identical to the default mode's.
    np.testing.assert_array_equal(
        np.asarray(fr.facade_mask), np.asarray(fr_def.facade_mask) & ~np.asarray(fr_def.ground_mask)
    )


def test_bpf_tracks_trajectory(bpf_run):
    cfg, gt, xyz, valid, masks, _ = bpf_run
    state = bpf_odometry.init_state(cfg)
    state = bpf_odometry.first_frame(state, jnp.asarray(xyz[0]), masks[0], cfg)
    est_q, est_t = [np.array([1.0, 0, 0, 0])], [np.zeros(3)]
    for i in range(1, gt.shape[0]):
        state, diag = bpf_odometry.bpf_step(state, jnp.asarray(xyz[i]), masks[i], cfg)
        est_q.append(np.asarray(state.pose.q))
        est_t.append(np.asarray(state.pose.t))
        assert int(np.asarray(diag.n_corr).sum()) > 50, f"frame {i}: too few correspondences"
    est = metrics.poses_to_matrices(np.stack(est_q), np.stack(est_t))
    ate = metrics.ate_rmse(gt, est)
    # 8 frames x 0.8 m: sub-2-decimeter tracking.  ground_as_facade=True
    # (the r4 default) measures 0.160 m here vs ~0.15 before — accepted:
    # the same change takes the 150-frame city circuit from 2.87% drift
    # (z-ATE 4.52 m, unconstrained-z ratchet) to 0.355% (z-ATE 0.63 m);
    # see tools/out/diag_bpf_ground.json vs diagnose_bpf.json.
    assert ate < 0.2, f"BPF ATE {ate:.3f} m"


def test_bpf_merged_map(bpf_run):
    cfg, gt, xyz, valid, masks, _ = bpf_run
    state = bpf_odometry.init_state(cfg)
    state = bpf_odometry.first_frame(state, jnp.asarray(xyz[0]), masks[0], cfg)
    merged = bpf_odometry.merged_map(state)
    n = int(np.asarray(merged.valid).sum())
    per = [
        int(np.asarray(m.valid).sum())
        for m in (state.beam_map, state.pillar_map, state.facade_map)
    ]
    assert n == sum(per)
