"""BPF accuracy diagnosis: per-channel yields, correspondences, and error
decomposition on the synthetic city circuit.

VERDICT r3 #3: BPF drift (2.74%) is 6.5x worse than ES (0.42%) on the same
world, while the reference's BPF path *beats* its ES path on KITTI
(config/config.yaml:22-48).  Before tuning anything, measure:

  - per-frame beam/pillar/facade feature yields (the reference gates its
    update on beam>10 && pillar>10 && facade>50 map points,
    ref: src/odomEstimationClass.cpp:722 — chronically starved channels
    under-constrain the pose),
  - per-channel correspondence counts actually entering the GN solve,
  - drift decomposition by axis (beams constrain z, pillars constrain xy,
    facades constrain their normal direction — a starved channel shows up
    as one axis drifting),
  - the same numbers for ES on the same frames, as the healthy baseline.

Usage:  python tools/diagnose_bpf.py [--frames 150] [--mode bpf|es|both]
Writes tools/out/diagnose_bpf.json and prints a summary table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--azimuth", type=int, default=1800)
    ap.add_argument("--speed", type=float, default=1.5)
    ap.add_argument("--mode", default="bpf", choices=("bpf", "es", "both"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--set", action="append", default=[], help="dotted config override k=v")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
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
    cap = cfg.capacity.scan_points

    @jax.jit
    def render_one(q, t, i):
        xyz, valid = synthetic.render_scan(
            synthetic.se3.Pose(q=q, t=t), world, cfg.lidar, args.azimuth,
            noise=0.008, seed=0, t_time=i,
        )
        n = xyz.shape[0]
        if n >= cap:
            return xyz[:cap], valid[:cap]
        return jnp.pad(xyz, ((0, cap - n), (0, 0))), jnp.pad(valid, (0, cap - n))

    frames = [
        render_one(poses.q[i], poses.t[i], jnp.float32(i)) for i in range(args.frames)
    ]

    gt = metrics.poses_to_matrices(np.asarray(poses.q), np.asarray(poses.t))
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)

    out = {"frames": args.frames, "overrides": args.set}

    def axis_errors(q, t):
        est = metrics.poses_to_matrices(q, t)
        d = est[:, :3, 3] - gt[:, :3, 3]
        return {
            "ate_rmse_m": metrics.ate_rmse(gt, est),
            "ate_x_rmse": float(np.sqrt(np.mean(d[:, 0] ** 2))),
            "ate_y_rmse": float(np.sqrt(np.mean(d[:, 1] ** 2))),
            "ate_z_rmse": float(np.sqrt(np.mean(d[:, 2] ** 2))),
            "final_err_m": [round(float(v), 3) for v in d[-1]],
            "drift_t_pct": metrics.kitti_drift(gt, est, lengths=(100.0, 200.0), step=10)["t_err_pct"],
        }

    if args.mode in ("bpf", "both"):
        pipe = BPFPipeline(cfg=cfg.replace(mode="bpf"), sync=True)
        yields = []
        t0 = time.perf_counter()
        for i, (xyz, valid) in enumerate(frames):
            beam, pillar, facade, _ = pipe._frontend(xyz, valid)
            yields.append(
                [int(beam.sum()), int(pillar.sum()), int(facade.sum()), int(valid.sum())]
            )
            pipe.process_frame(xyz, valid)
        pipe.flush()
        q, t = pipe.trajectory
        yields = np.asarray(yields)
        n_corr = np.stack([r.n_corr for r in pipe.records[1:]])
        map_sizes = np.stack([r.map_sizes for r in pipe.records[1:]])
        bpf = {
            "wall_s": round(time.perf_counter() - t0, 1),
            "yield_mean": [float(v) for v in yields.mean(0)],
            "yield_min": [int(v) for v in yields.min(0)],
            "corr_mean": [float(v) for v in n_corr.mean(0)],
            "corr_min": [int(v) for v in n_corr.min(0)],
            "corr_p10": [float(v) for v in np.percentile(n_corr, 10, axis=0)],
            "map_mean": [float(v) for v in map_sizes.mean(0)],
            "map_final": [int(v) for v in map_sizes[-1]],
            "n_dropped": pipe.n_dropped,
            "overflow_total": pipe.overflow_total,
            **axis_errors(q, t),
        }
        out["bpf"] = bpf
        print("BPF  yields beam/pillar/facade mean:", bpf["yield_mean"][:3],
              "min:", bpf["yield_min"][:3])
        print("BPF  corr mean:", bpf["corr_mean"], "p10:", bpf["corr_p10"], "min:", bpf["corr_min"])
        print("BPF  maps mean:", bpf["map_mean"], "final:", bpf["map_final"])
        print("BPF  ate xyz:", bpf["ate_x_rmse"], bpf["ate_y_rmse"], bpf["ate_z_rmse"],
              "drift:", bpf["drift_t_pct"])

    if args.mode in ("es", "both"):
        pipe = ESPipeline(cfg=cfg, sync=True)
        t0 = time.perf_counter()
        for xyz, valid in frames:
            pipe.process_frame(xyz, valid)
        pipe.flush()
        q, t = pipe.trajectory
        ne = np.asarray([r.n_edge_corr for r in pipe.records[1:]])
        ns = np.asarray([r.n_surf_corr for r in pipe.records[1:]])
        es = {
            "wall_s": round(time.perf_counter() - t0, 1),
            "edge_corr_mean": float(ne.mean()),
            "surf_corr_mean": float(ns.mean()),
            "map_final": [int(pipe.records[-1].edge_map_size), int(pipe.records[-1].surf_map_size)],
            "n_dropped": pipe.n_dropped,
            **axis_errors(q, t),
        }
        out["es"] = es
        print("ES   corr edge/surf mean:", es["edge_corr_mean"], es["surf_corr_mean"])
        print("ES   ate xyz:", es["ate_x_rmse"], es["ate_y_rmse"], es["ate_z_rmse"],
              "drift:", es["drift_t_pct"])

    path = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)), "out", "diagnose_bpf.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
