"""Benchmark: ES odometry frames/sec + KITTI-protocol drift on a synthetic
HDL-64 city circuit.

The reference's headline budget is real-time 10 Hz HDL-64 odometry
(launch/pfilter_kitti.launch:55, BASELINE.md).  No KITTI data ships in this
environment, so the bench ray-casts a KITTI-like city-block world — building
facades with eave ledges, corner walls, poles, foliage clutter, and *moving*
box objects (dynamic outliers) — and drives a ~1 km loop with 90-degree
turns.  Drift is scored with the official KITTI odometry protocol (segment
lengths 100..800 m, start every 10 frames), matching how the reference's
0.7833% baseline was computed.

Prints ONE JSON line:
  {"metric": "frames_per_sec_es64", "value": <fps>, "unit": "fps",
   "vs_baseline": <fps/10.0>, ...extras}
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=700)
    ap.add_argument("--azimuth", type=int, default=1800)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    ap.add_argument("--speed", type=float, default=1.5, help="meters per frame")
    ap.add_argument(
        "--mode",
        default="es",
        choices=("es", "bpf"),
        help="es = ring-feature pipeline (headline metric); bpf = "
        "ground-seg/DCVC/PCA beam-pillar-facade pipeline",
    )
    ap.add_argument("--set", action="append", default=[], help="dotted config override k=v")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pfilter_tpu.config import apply_dotted_overrides, kitti_config
    from pfilter_tpu.pipeline import BPFPipeline, ESPipeline
    from pfilter_tpu.utils import metrics, synthetic

    cfg = kitti_config()
    if args.set:
        cfg = apply_dotted_overrides(cfg, args.set)
    world = synthetic.make_city_world(seed=7)
    poses = synthetic.make_loop_trajectory(args.frames, speed=args.speed)

    # Render on device, frame by frame (keeps memory flat); frame index
    # advances the dynamic movers.
    render = jax.jit(
        lambda q, t, i: synthetic.render_scan(
            synthetic.se3.Pose(q=q, t=t),
            world,
            cfg.lidar,
            args.azimuth,
            noise=0.008,
            seed=0,
            t_time=i,
        )
    )

    # Async host loop: dispatch runs ahead of the device, diagnostics are
    # fetched with a lag — per-frame wall time is pure device throughput,
    # with host work and tunnel round trips hidden behind compute.
    if args.mode == "bpf":
        pipe = BPFPipeline(cfg=cfg.replace(mode="bpf"), sync=False, fetch_lag=4)
    else:
        pipe = ESPipeline(cfg=cfg, sync=False, fetch_lag=4)
    cap = cfg.capacity.scan_points

    def padded(xyz, valid):
        n = xyz.shape[0]
        if n >= cap:
            return xyz[:cap], valid[:cap]
        return (
            jnp.pad(xyz, ((0, cap - n), (0, 0))),
            jnp.pad(valid, (0, cap - n)),
        )

    def feed(i):
        xyz, valid = render(poses.q[i], poses.t[i], jnp.float32(i))
        pipe.process_frame(*padded(xyz, valid))

    t_wall0 = time.perf_counter()
    for i in range(args.warmup):
        feed(i)
    pipe.flush()  # compile + fill; steady-state timing starts clean
    t_steady0 = time.perf_counter()
    for i in range(args.warmup, args.frames):
        feed(i)
    pipe.flush()
    steady_s = time.perf_counter() - t_steady0
    total_s = time.perf_counter() - t_wall0
    n_steady = args.frames - args.warmup
    steady = np.array([steady_s / n_steady * 1e3])
    fps = n_steady / steady_s

    # Drift vs ground truth (relative to first frame), official KITTI
    # protocol: segment lengths 100..800 m where the path affords them,
    # start frames every 10 (metrics.KITTI_LENGTHS / step=10 defaults).
    q, t = pipe.trajectory
    gt = metrics.poses_to_matrices(np.asarray(poses.q), np.asarray(poses.t))
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    est = metrics.poses_to_matrices(q, t)
    path_len = metrics.trajectory_distances(gt)[-1]
    lengths = tuple(l for l in metrics.KITTI_LENGTHS if l <= path_len * 0.8) or (
        50.0,
        100.0,
    )
    drift = metrics.kitti_drift(gt, est, lengths=lengths, step=10)
    ate = metrics.ate_rmse(gt, est)

    result = {
        "metric": f"frames_per_sec_{args.mode}64",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 10.0, 3),
        "mean_ms_per_frame": round(float(np.mean(steady)), 3),
        "drift_t_pct": round(drift["t_err_pct"], 4),
        "drift_r_deg_per_m": round(drift["r_err_deg_per_m"], 6),
        "ate_rmse_m": round(ate, 4),
        "frames": args.frames,
        "path_len_m": round(float(path_len), 1),
        "protocol_lengths_m": [int(l) for l in lengths],
        "n_segments": drift["n_segments"],
        "n_frames_dropped": pipe.n_dropped,
        "total_wall_s": round(total_s, 2),
        "overflow_total": pipe.overflow_total,
        "device": str(jax.devices()[0]),
    }
    if args.mode == "es":
        result["surf_map_size"] = pipe.records[-1].surf_map_size
        result["edge_map_size"] = pipe.records[-1].edge_map_size
    else:
        result["map_sizes"] = [int(x) for x in pipe.records[-1].map_sizes]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
