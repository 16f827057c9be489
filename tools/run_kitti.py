#!/usr/bin/env python
"""KITTI sequence runner + parameter sweep — the in-repo replacement for the
reference's ``runkitti.py`` + external evaluation tool
(ref: runkitti.py:86-213): runs the ES or BPF pipeline over KITTI odometry
sequences (or the synthetic corridor when no dataset is present), writes
KITTI-format trajectories and JSONL per-frame diagnostics, and scores drift
in-process.

Examples:
  python tools/run_kitti.py --root /data/kitti --sequence 07
  python tools/run_kitti.py --root /data/kitti --sequence 00 --mode bpf \\
      --set odometry.theta_p=0.4 --set odometry.k_new=0
  python tools/run_kitti.py --synthetic --frames 100          # no dataset
  python tools/run_kitti.py --root /data/kitti --sweep theta_p=0.2,0.4,0.6 \\
      --sequence 07                                           # param sweep
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_sequence(cfg, scans, gt_mats, out_dir: Path, tag: str, global_map_stride: int = 0):
    import jax

    from pfilter_tpu.pipeline import make_pipeline
    from pfilter_tpu.utils import checkpoint, metrics

    pipe = make_pipeline(cfg)
    gm = None
    if global_map_stride > 0:
        from pfilter_tpu.models.global_map import GlobalMap

        gm = GlobalMap(resolution=cfg.odometry.map_resolution)

    t0 = time.perf_counter()
    n = 0
    for scan in scans:
        xyz = scan[:, :3] if scan.shape[1] >= 4 else scan
        xyz = np.ascontiguousarray(xyz, np.float32)
        rec = pipe.process_frame(xyz)
        # Global visualization map (ref laserMappingNode consumed /odom +
        # the filtered cloud, src/laserMappingNode.cpp:51-136; here the
        # synced FrameRecord pose + a strided scan feed the tiled map).
        if gm is not None and rec is not None and n % global_map_stride == 0:
            sub = xyz[:: max(1, len(xyz) // 30000)]
            gm.update(
                np.asarray(rec.pose_q),
                np.asarray(rec.pose_t),
                sub,
                np.ones(len(sub), bool),
            )
        n += 1
    wall = time.perf_counter() - t0

    q, t = pipe.trajectory
    est = metrics.poses_to_matrices(q, t)
    out_dir.mkdir(parents=True, exist_ok=True)
    metrics.save_kitti_format(out_dir / f"{tag}.txt", est)
    checkpoint.save_trajectory(out_dir / f"{tag}_frames.jsonl", pipe.records)
    if gm is not None:
        pts = gm.get_map()
        np.savez_compressed(out_dir / f"{tag}_map.npz", xyz=pts)
        _save_ply(out_dir / f"{tag}_map.ply", pts)

    ms = [r.ms for r in pipe.records[max(1, n // 10) :]]
    result = {
        "tag": tag,
        "frames": n,
        "fps": round(n / wall, 2),
        "mean_ms": round(float(np.mean(ms)), 2),
        "overflow_total": pipe.overflow_total,
        "device": str(jax.devices()[0]),
    }
    if gt_mats is not None and len(gt_mats) >= n:
        gt = np.einsum("ij,njk->nik", np.linalg.inv(gt_mats[0]), gt_mats[:n])
        drift = metrics.kitti_drift(gt, est)
        result.update(
            drift_t_pct=round(drift["t_err_pct"], 4),
            drift_r_deg_per_m=round(drift["r_err_deg_per_m"], 6),
            ate_rmse_m=round(metrics.ate_rmse(gt, est), 4),
        )
    return result


def _save_ply(path: Path, pts: np.ndarray) -> None:
    """ASCII PLY (the standard viewer format for the /map artifact)."""
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\nend_header\n"
        )
        np.savetxt(f, pts, fmt="%.3f")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", help="KITTI odometry root (sequences/, poses/)")
    ap.add_argument("--sequence", default="07")
    ap.add_argument("--preset", default="kitti")
    ap.add_argument("--mode", choices=("es", "bpf"), default=None)
    ap.add_argument("--config", help="YAML config overrides", default=None)
    ap.add_argument("--set", action="append", default=[], help="dotted override k=v")
    ap.add_argument("--sweep", action="append", default=[], help="param=v1,v2,... (odometry.*)")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--frames", type=int, default=0, help="limit frames (0 = all)")
    ap.add_argument("--synthetic", action="store_true", help="synthetic world instead of KITTI")
    ap.add_argument(
        "--global-map",
        type=int,
        nargs="?",
        const=5,
        default=0,
        metavar="STRIDE",
        help="build the tiled global map from every STRIDE-th frame (default "
        "5 when given bare) and save {tag}_map.npz/.ply",
    )
    args = ap.parse_args()

    from pfilter_tpu.config import load_config

    base_overrides = list(args.set)
    if args.mode:
        base_overrides.append(f"mode={args.mode}")

    sweep_axes = []
    for s in args.sweep:
        name, _, vals = s.partition("=")
        if "." not in name:
            name = f"odometry.{name}"
        sweep_axes.append((name, vals.split(",")))

    def configs():
        if not sweep_axes:
            yield "run", base_overrides
            return
        import itertools

        for combo in itertools.product(*(v for _, v in sweep_axes)):
            ov = base_overrides + [f"{n}={v}" for (n, _), v in zip(sweep_axes, combo)]
            tag = "_".join(f"{n.split('.')[-1]}{v}" for (n, _), v in zip(sweep_axes, combo))
            yield tag, ov

    out_dir = Path(args.out)
    results = []
    for tag, overrides in configs():
        cfg = load_config(args.preset, yaml_path=args.config, cli_overrides=overrides)
        if args.synthetic:
            from pfilter_tpu.utils import metrics as m
            from pfilter_tpu.utils import synthetic

            n_frames = args.frames or 60
            world = synthetic.make_world(seed=7, corridor_len=n_frames * 1.5 + 60.0)
            poses = synthetic.make_trajectory(n_frames, speed=1.5)
            xyz, valid = synthetic.render_sequence(world, poses, cfg.lidar, n_azimuth=1800)
            scans = (np.asarray(xyz[i])[np.asarray(valid[i])] for i in range(n_frames))
            gt = m.poses_to_matrices(np.asarray(poses.q), np.asarray(poses.t))
        else:
            from pfilter_tpu.utils import kitti

            seq = kitti.KittiSequence(args.root, args.sequence)
            gt = seq.gt_velodyne

            def scan_iter():
                for i, s in enumerate(seq.scans()):
                    if args.frames and i >= args.frames:
                        return
                    yield s

            scans = scan_iter()
        res = run_sequence(
            cfg, scans, gt, out_dir, f"{args.sequence}_{tag}",
            global_map_stride=args.global_map,
        )
        print(json.dumps(res), flush=True)
        results.append(res)

    if len(results) > 1:
        best = min(results, key=lambda r: r.get("drift_t_pct", r.get("ate_rmse_m", 1e9)))
        print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
