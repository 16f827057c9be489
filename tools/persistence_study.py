"""Persistence-filter accuracy study: mover contamination + theta sweeps.

The reference's headline claim is that persistence filtering *improves*
accuracy 9.4% over FLOAM while cutting 20.9% frame time
(ref: /root/reference/README.md:2-3).  Round 4 measured the accuracy half
inverted on the pinned bench world (floam 0.2202% vs persistence 0.3043%,
ABLATION_r04.json) — but that world carries only 12 movers over a 1.2 km
loop, so the clutter the filter exists to evict barely occurs.  This tool
provides the evidence the claim needs (VERDICT r4 #1):

(a) **Ground-truth contamination curves**: the renderer knows which returns
    hit dynamic movers (synthetic.render_scan(return_mover=True)); the
    pipeline's provenance channel (ESPipeline(provenance=True)) max-merges
    that bit through the exact voxel pipeline the persistence counters ride,
    so every frame reports how many surviving map points are mover-origin.
    FLOAM-mode accumulates them; persistence-mode must evict them.

(b) **A/B at equal capacities** on a dynamics-stressed world (--movers /
    --slow): persistence (kitti thetas) vs floam (filtering off), both at
    floam-sized capacities so neither overflow nor capacity asymmetry can
    explain the outcome.

(c) **theta_p / k_new / theta_max sweep** (--sweep) — the same parameter
    sweep the reference runs (ref: /root/reference/runkitti.py:161-213).

Drift protocol matches the pinned bench (lengths 100-300 m, start every 10
frames) so numbers compare against BENCH/ABLATION history.
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FLOAM_CAPS = dict(
    edge_map_points=65536,
    surf_map_points=262144,
    edge_tile_cap=512,
    surf_tile_cap=768,
)


def build_world(args, synthetic):
    """Returns (world, poses).  Worlds: the pinned bench city grid, its
    dynamics-stressed variant, and the sparse-static highway (where the
    reference's own KITTI gains concentrate — see make_highway_world)."""
    if args.world == "bench":
        world = synthetic.make_city_world(seed=7)
        return world, synthetic.make_loop_trajectory(args.frames, speed=args.speed)
    if args.world == "dyn":
        # Dynamics-stressed variant of the same grid: heavier traffic with a
        # crawling-speed floor (lingering movers are the hardest case for
        # eviction — they look semi-stable for many frames).
        world = synthetic.make_city_world(
            seed=7, n_movers=args.movers, mover_speed=(args.slow, 2.5)
        )
        return world, synthetic.make_loop_trajectory(args.frames, speed=args.speed)
    if args.world == "highway":
        speed = 2.0 if args.speed == 1.5 else args.speed  # highway cruise
        world = synthetic.make_highway_world(
            length=args.frames * speed + 120.0,
            n_traffic=args.movers,
            jam_frac=args.jam_frac,
        )
        return world, synthetic.make_ramp_trajectory(args.frames, speed=speed)
    raise SystemExit(f"unknown world {args.world}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--azimuth", type=int, default=1800)
    ap.add_argument("--speed", type=float, default=1.5)
    ap.add_argument("--world", default="dyn", choices=("bench", "dyn", "highway"))
    ap.add_argument("--movers", type=int, default=96)
    ap.add_argument("--slow", type=float, default=0.1, help="mover speed floor (m/frame)")
    ap.add_argument("--jam-frac", type=float, default=0.25, help="highway: crawling-traffic fraction")
    ap.add_argument("--noise", type=float, default=0.008, help="range noise sigma (m); KITTI-realistic ~0.02")
    ap.add_argument("--configs", default="pers,floam")
    ap.add_argument("--sweep", action="store_true", help="theta sweep instead of A/B")
    ap.add_argument("--theta-p", default="0.2,0.3,0.4,0.5,0.6")
    ap.add_argument("--k-new", default="0,4")
    ap.add_argument("--theta-max", default="75")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pfilter_tpu.config import kitti_config
    from pfilter_tpu.pipeline import ESPipeline
    from pfilter_tpu.utils import metrics, synthetic

    base = kitti_config()
    # Equal capacities for every row: floam-mode occupancy needs the big
    # caps, and giving persistence the same ones removes the capacity
    # asymmetry from the accuracy comparison.
    base = base.replace(capacity=dataclasses.replace(base.capacity, **FLOAM_CAPS))
    world, poses = build_world(args, synthetic)
    cap = base.capacity.scan_points

    def log(msg):
        print(f"[study] {msg}", file=sys.stderr, flush=True)

    @jax.jit
    def render_one(q, t, i):
        xyz, valid, mover = synthetic.render_scan(
            synthetic.se3.Pose(q=q, t=t), world, base.lidar, args.azimuth,
            noise=args.noise, seed=0, t_time=i, return_mover=True,
        )
        n = xyz.shape[0]
        if n >= cap:
            return xyz[:cap], valid[:cap], mover[:cap], (mover & valid).sum()
        pad = cap - n
        return (
            jnp.pad(xyz, ((0, pad), (0, 0))),
            jnp.pad(valid, (0, pad)),
            jnp.pad(mover, (0, pad)),
            (mover & valid).sum(),
        )

    log(f"rendering {args.frames} frames ({args.world} world, "
        f"{world.movers.shape[0]} movers)")
    t0 = time.perf_counter()
    frames_dev = [
        render_one(poses.q[i], poses.t[i], jnp.float32(i)) for i in range(args.frames)
    ]
    frames_dev[-1][0].block_until_ready()
    scan_mover = [int(f[3]) for f in frames_dev]
    log(f"rendered in {time.perf_counter()-t0:.1f}s; "
        f"mover returns/frame mean {np.mean(scan_mover):.0f} "
        f"max {max(scan_mover)}")

    gt = metrics.poses_to_matrices(np.asarray(poses.q), np.asarray(poses.t))
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    path_len = metrics.trajectory_distances(gt)[-1]
    lengths = tuple(
        float(l) for l in (100.0, 200.0, 300.0) if l <= path_len * 0.8
    ) or (50.0, 100.0)

    def run_cfg(cfg, tag):
        pipe = ESPipeline(cfg=cfg, provenance=True, sync=False, fetch_lag=4)
        for i in range(args.warmup):
            pipe.process_frame(frames_dev[i][0], frames_dev[i][1], frames_dev[i][2])
        pipe.flush()
        t0 = time.perf_counter()
        for i in range(args.warmup, args.frames):
            pipe.process_frame(frames_dev[i][0], frames_dev[i][1], frames_dev[i][2])
        pipe.flush()
        steady = time.perf_counter() - t0
        q, t = pipe.trajectory
        est = metrics.poses_to_matrices(q, t)
        drift = metrics.kitti_drift(gt, est, lengths=lengths, step=10)
        contam = np.stack([r.contam for r in pipe.records])  # [F, 2]
        maps = np.array(
            [r.edge_map_size + r.surf_map_size for r in pipe.records]
        )
        res = {
            "fps": round((args.frames - args.warmup) / steady, 2),
            "drift_t_pct": round(drift["t_err_pct"], 4),
            "drift_r_deg_per_m": round(drift["r_err_deg_per_m"], 6),
            "ate_rmse_m": round(metrics.ate_rmse(gt, est), 4),
            "map_points_final": int(maps[-1]),
            "map_points_mean": int(maps[args.warmup:].mean()),
            "contam_final": [int(x) for x in contam[-1]],
            "contam_mean": [round(float(x), 1) for x in contam[args.warmup:].mean(0)],
            "contam_max": [int(x) for x in contam.max(0)],
            # decimated curve for the artifact (every 10th frame, [edge+surf])
            "contam_curve": [int(x) for x in contam.sum(1)[::10]],
            "overflow_total": pipe.overflow_total,
            "n_dropped": pipe.n_dropped,
        }
        log(f"{tag}: {res['fps']} fps, drift {res['drift_t_pct']}%, "
            f"contam final {res['contam_final']} mean {res['contam_mean']}")
        return res

    def variant(name, theta_p=None, k_new=None, theta_max=None):
        """``pers``/``floam``: filter on/off at weight_type 0 (isolates the
        eviction mechanism).  ``pers_w1``/``pers_w2``/``pers_w12``: the full
        PFilter *system* — persistence + weighted residuals (the paper's
        +9.4% is system-vs-FLOAM; weighting is how persistence data reaches
        the optimizer, ref launch default weighttype=2,
        launch/pfilter_kitti.launch:8)."""
        o = base.odometry
        wt = 0
        if name == "floam":
            o = dataclasses.replace(o, k_new=0.0, theta_p=0.0, theta_max=0.0)
        elif name.startswith("floam_w"):
            # Control: weighting WITHOUT the filter — isolates whether an
            # accuracy win comes from eviction or from the weighting alone.
            o = dataclasses.replace(o, k_new=0.0, theta_p=0.0, theta_max=0.0)
            wt = int(name[7:])
        elif name == "pers":
            pass  # kitti defaults (k_new=0, theta_p=0.4, theta_max=75)
        elif name.startswith("pers_w"):
            wt = int(name[6:])
        elif name == "sweep":
            o = dataclasses.replace(
                o, theta_p=theta_p, k_new=k_new, theta_max=theta_max
            )
        else:
            raise SystemExit(f"unknown config {name}")
        return base.replace(odometry=dataclasses.replace(o, weight_type=wt))

    results = {}
    if args.sweep:
        tps = [float(x) for x in args.theta_p.split(",")]
        kns = [float(x) for x in args.k_new.split(",")]
        tms = [float(x) for x in args.theta_max.split(",")]
        for tm in tms:
            for kn in kns:
                for tp in tps:
                    tag = f"tp{tp}_kn{kn:g}_tm{tm:g}"
                    results[tag] = run_cfg(
                        variant("sweep", theta_p=tp, k_new=kn, theta_max=tm), tag
                    )
                    results[tag]["params"] = {
                        "theta_p": tp, "k_new": kn, "theta_max": tm
                    }
    else:
        for name in args.configs.split(","):
            results[name] = run_cfg(variant(name), name)
        if "pers" in results and "floam" in results:
            results["summary"] = {
                "drift_delta_pct_points": round(
                    results["pers"]["drift_t_pct"] - results["floam"]["drift_t_pct"], 4
                ),
                "pers_wins_accuracy": bool(
                    results["pers"]["drift_t_pct"] <= results["floam"]["drift_t_pct"]
                ),
                "contam_ratio_floam_over_pers_final": round(
                    sum(results["floam"]["contam_final"])
                    / max(sum(results["pers"]["contam_final"]), 1),
                    2,
                ),
                "map_ratio_pers_over_floam": round(
                    results["pers"]["map_points_mean"]
                    / max(results["floam"]["map_points_mean"], 1),
                    3,
                ),
            }

    import jax as _jax

    out = {
        "world": args.world,
        "n_movers": int(world.movers.shape[0]),
        "mover_speed_floor": args.slow if args.world == "dyn" else 0.5,
        "noise_m": args.noise,
        "frames": args.frames,
        "path_len_m": round(float(path_len), 1),
        "protocol_lengths_m": [int(l) for l in lengths],
        "scan_mover_returns_mean": round(float(np.mean(scan_mover)), 1),
        "equal_capacities": FLOAM_CAPS,
        "device": str(_jax.devices()[0]),
        "results": results,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
