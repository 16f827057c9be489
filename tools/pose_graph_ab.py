"""Pose-graph smoother A/B on the degenerate canyon world (VERDICT r3 #6).

The city-circuit bench is geometrically rich, so the windowed smoother
(ops/pose_graph.py) measured drift-neutral there.  Its claimed value is the
degenerate case: a featureless urban canyon where scan matching has ZERO
along-track information and the pose must coast on the motion model.  This
tool drives a straight run through ``synthetic.make_canyon_world`` with the
smoother off vs on and reports along-track drift.  Also runs the rich
corridor world as a control (the smoother must not hurt where scan matching
is healthy).

Usage: python tools/pose_graph_ab.py [--frames 120] [--cpu]
Writes tools/out/pose_graph_ab.json.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--azimuth", type=int, default=1800)
    ap.add_argument("--speed", type=float, default=1.5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pfilter_tpu.config import kitti_config
    from pfilter_tpu.pipeline import ESPipeline
    from pfilter_tpu.utils import metrics, synthetic

    base = kitti_config()
    out = {"frames": args.frames, "worlds": {}}

    length = args.frames * args.speed + 40.0
    worlds = {
        "canyon": synthetic.make_canyon_world(length=length),
        "canyon_control": synthetic.make_canyon_world(length=length, cross_every=20.0),
    }

    for wname, world in worlds.items():
        # Ramp from rest: a cold start INSIDE along-track-ambiguous geometry
        # is unsolvable for any odometry (nothing ever measures the speed);
        # KITTI sequences start from rest too.
        poses = synthetic.make_ramp_trajectory(args.frames, speed=args.speed)
        gt = metrics.poses_to_matrices(np.asarray(poses.q), np.asarray(poses.t))
        gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
        cap = base.capacity.scan_points

        render = jax.jit(
            lambda q, t, i, _w=world: synthetic.render_scan(
                synthetic.se3.Pose(q=q, t=t), _w, base.lidar, args.azimuth,
                noise=0.008, seed=0, t_time=i,
            )
        )
        rows = {}
        for enabled in (False, True):
            cfg = base.replace(
                pose_graph=dataclasses.replace(base.pose_graph, enabled=enabled)
            )
            pipe = ESPipeline(cfg=cfg, sync=False, fetch_lag=4)
            t0 = time.perf_counter()
            for i in range(args.frames):
                xyz, valid = render(poses.q[i], poses.t[i], jnp.float32(i))
                n = xyz.shape[0]
                pipe.process_frame(
                    jnp.pad(xyz, ((0, cap - n), (0, 0))), jnp.pad(valid, (0, cap - n))
                )
            pipe.flush()
            q, t = pipe.trajectory
            est = metrics.poses_to_matrices(q, t)
            d = est[:, :3, 3] - gt[:, :3, 3]
            drift = metrics.kitti_drift(gt, est, lengths=(100.0,), step=10)
            rows["on" if enabled else "off"] = {
                "wall_s": round(time.perf_counter() - t0, 1),
                "drift_t_pct": round(drift["t_err_pct"], 4),
                "ate_rmse_m": round(metrics.ate_rmse(gt, est), 4),
                "along_track_final_err_m": round(float(d[-1, 0]), 3),
                "along_track_rmse_m": round(float(np.sqrt(np.mean(d[:, 0] ** 2))), 4),
                "lateral_rmse_m": round(float(np.sqrt(np.mean(d[:, 1] ** 2))), 4),
                "n_dropped": pipe.n_dropped,
            }
            print(wname, "pose_graph", "on" if enabled else "off", rows["on" if enabled else "off"], flush=True)
        out["worlds"][wname] = rows

    path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "out", "pose_graph_ab.json"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
