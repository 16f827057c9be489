"""Ablation harness: residual weighting A/B and the PFilter persistence
claim, on the KITTI-protocol city circuit.

Configs run (all on the same rendered scan stream):

- ``w0``:   kitti params, weighting off           (weightType 0)
- ``w2``:   kitti params, sparsity weighting      (reference launch default,
            launch/pfilter_kitti.launch:8)
- ``w1``/``w12``: observe / mean weighting        (--full only)
- ``floam``: persistence filtering disabled (k_new=theta_p=theta_max=0) —
  the FLOAM-equivalent ablation (README.md:44) under the kitti preset's
  TIGHT capacities.  Without eviction the live map exceeds them (measured
  max 24k edge / 105.7k surf vs caps 16384/65536 on the city circuit), so
  this row documents the overflow a persistence-free map forces on a
  static-shape engine.
- ``floam_sized``: the fair fps comparison (VERDICT r3 #5) — floam params
  with capacities raised to hold its MEASURED occupancy (edge 65536,
  surf 262144, tile caps 512/768; occupancy probe: edge max 24,001, surf
  max 105,723 at 150 frames, overflow 0).  The paper's -20.9% frame-time
  claim (README.md:2) translated to static shapes: persistence eviction is
  what lets every capacity-proportional cost (sort, merge, kNN tiles,
  scatter) run on arrays ~4x smaller.  ``persistence_summary.speedup``
  reports fps(kitti-tight) / fps(floam_sized).

Writes a JSON dict (--out) keyed by config with fps / drift / ATE /
final map sizes / overflow.
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--azimuth", type=int, default=1800)
    ap.add_argument("--speed", type=float, default=1.5)
    ap.add_argument("--full", action="store_true", help="also run w1 / w12")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pfilter_tpu.config import kitti_config
    from pfilter_tpu.pipeline import ESPipeline
    from pfilter_tpu.utils import metrics, synthetic

    base = kitti_config()
    world = synthetic.make_city_world(seed=7)
    poses = synthetic.make_loop_trajectory(args.frames, speed=args.speed)
    render = jax.jit(
        lambda q, t, i: synthetic.render_scan(
            synthetic.se3.Pose(q=q, t=t), world, base.lidar, args.azimuth,
            noise=0.008, seed=0, t_time=i,
        )
    )

    gt = metrics.poses_to_matrices(np.asarray(poses.q), np.asarray(poses.t))
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    path_len = metrics.trajectory_distances(gt)[-1]
    lengths = tuple(l for l in metrics.KITTI_LENGTHS if l <= path_len * 0.8) or (50.0, 100.0)

    def variant(name):
        if name.startswith("floam"):
            cfg = base.replace(
                odometry=dataclasses.replace(
                    base.odometry, k_new=0.0, theta_p=0.0, theta_max=0.0, weight_type=0
                )
            )
            if name == "floam_sized":
                cfg = cfg.replace(
                    capacity=dataclasses.replace(
                        cfg.capacity,
                        edge_map_points=65536,
                        surf_map_points=262144,
                        edge_tile_cap=512,
                        surf_tile_cap=768,
                    )
                )
            return cfg
        wt = int(name[1:])
        return base.replace(odometry=dataclasses.replace(base.odometry, weight_type=wt))

    names = ["w0", "w2", "floam", "floam_sized"] + (["w1", "w12"] if args.full else [])
    results = {}
    for name in names:
        cfg = variant(name)
        pipe = ESPipeline(cfg=cfg, sync=False, fetch_lag=4)
        cap = cfg.capacity.scan_points

        def feed(i):
            xyz, valid = render(poses.q[i], poses.t[i], jnp.float32(i))
            n = xyz.shape[0]
            pipe.process_frame(
                jnp.pad(xyz, ((0, cap - n), (0, 0))), jnp.pad(valid, (0, cap - n))
            )

        for i in range(args.warmup):
            feed(i)
        pipe.flush()
        t0 = time.perf_counter()
        for i in range(args.warmup, args.frames):
            feed(i)
        pipe.flush()
        steady = time.perf_counter() - t0

        q, t = pipe.trajectory
        est = metrics.poses_to_matrices(q, t)
        drift = metrics.kitti_drift(gt, est, lengths=lengths, step=10)
        last = pipe.records[-1]
        results[name] = {
            "fps": round((args.frames - args.warmup) / steady, 2),
            "drift_t_pct": round(drift["t_err_pct"], 4),
            "drift_r_deg_per_m": round(drift["r_err_deg_per_m"], 6),
            "ate_rmse_m": round(metrics.ate_rmse(gt, est), 4),
            "map_points": int(last.edge_map_size + last.surf_map_size),
            "overflow_total": pipe.overflow_total,
            "n_dropped": pipe.n_dropped,
        }
        print(name, results[name], flush=True)

    if "w0" in results and "floam_sized" in results:
        results["persistence_summary"] = {
            "map_ratio_pfilter_vs_floam": round(
                results["w0"]["map_points"] / max(results["floam_sized"]["map_points"], 1), 3
            ),
            "drift_delta_pct_points": round(
                results["w0"]["drift_t_pct"] - results["floam_sized"]["drift_t_pct"], 4
            ),
            # The static-shape translation of the paper's -20.9% frame time
            # (README.md:2): persistence keeps occupancy inside caps ~4x
            # smaller, and every capacity-proportional cost follows.
            "speedup_pfilter_vs_floam_sized": round(
                results["w0"]["fps"] / max(results["floam_sized"]["fps"], 1e-9), 3
            ),
            "floam_tightcap_overflow": results.get("floam", {}).get("overflow_total"),
        }

    out = {
        "frames": args.frames,
        "path_len_m": round(float(path_len), 1),
        "protocol_lengths_m": [int(l) for l in lengths],
        "device": None,
        "results": results,
    }
    import jax as _jax

    out["device"] = str(_jax.devices()[0])
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
