"""Weak-scaling benchmark for sharded map registration.

Measures the north-star scaling metric (BASELINE.md: >= 70% weak-scaling
efficiency on map registration across >= 2 workers): per-shard map block size
is held constant while the shard count n_map grows, so the total registered
map grows linearly with devices and perfect scaling keeps the per-step time
flat.  Efficiency(n) = T(1) / T(n).

Only ONE real TPU chip exists in this environment, so the measurement is
split into the pieces one chip can measure honestly:

- ``--platform tpu``: (a) sharded-vs-single parity at n_map=1 (the cost of
  the shard_map program structure, with the tiled Pallas kNN), and (b) the
  *per-shard compute* time at the per-shard load weak scaling implies — the
  shard program's map block size is constant by construction, so compute
  time per step is flat and the only scaling loss is collective traffic.
  The report combines measured per-step compute with the analytically exact
  per-step all_gather/psum byte volume (it grows ~linearly in n_map) and an
  ICI-bandwidth window to bound projected efficiency.
- ``--platform cpu``: an ``--xla_force_host_platform_device_count`` virtual
  mesh for structural validation.  All virtual devices timeshare one host
  CPU, so wall time grows with TOTAL work across shards — the printed
  ``virtual_mesh_walltime_note`` makes explicit that this tier validates
  compilation/execution of the collective program, not real-hardware
  efficiency.  Uses knn_impl=grid (XLA-native) so the timed program is
  compiled code, not the Pallas interpreter.

Writes one JSON dict (see --out) with per-n_map step times and projections.

Replaces (at scale) the reference's single-process registration
(src/odomEstimationClass.cpp:229-282); sharding design in
pfilter_tpu/parallel/es_sharded.py.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=("cpu", "tpu"))
    ap.add_argument("--n-maps", default="1,2,4,8")
    ap.add_argument("--frames", type=int, default=12, help="timed steps per config")
    # Warmup must outlast the opt_count decay (max_outer_iters frames): early
    # frames run up to 12 outer iterations vs 2 at steady state, so a short
    # warmup times a mixture of decaying costs and the single/sharded split
    # becomes noise-dominated (this produced the bogus 0.53 structure
    # efficiency in SCALING_r02's first cut).
    ap.add_argument("--warmup", type=int, default=12)
    ap.add_argument("--block-points", type=int, default=32768, help="surf map points per shard")
    ap.add_argument("--scan-points", type=int, default=32768)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    n_maps = [int(x) for x in args.n_maps.split(",")]

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        need = max(n_maps)
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={max(8, need)}"
            ).strip()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from pfilter_tpu.config import CapacityConfig, LidarConfig, OdometryConfig, PipelineConfig
    from pfilter_tpu.parallel import es_sharded, mesh as meshlib
    from pfilter_tpu.utils import synthetic

    def make_cfg(n_map: int) -> PipelineConfig:
        """Weak scaling: per-shard block size constant -> total capacity ∝ n."""
        impl = "grid" if args.platform == "cpu" else "tiled"
        return PipelineConfig(
            lidar=LidarConfig(num_lines=64, min_distance=3.0, max_distance=90.0),
            odometry=OdometryConfig(map_resolution=0.4),
            capacity=CapacityConfig(
                scan_points=args.scan_points,
                edge_points=8192,
                surf_points=args.scan_points,
                ds_edge_points=2048,
                ds_surf_points=8192,
                edge_map_points=(args.block_points // 4) * n_map,
                surf_map_points=args.block_points * n_map,
                knn_impl=impl,
            ),
        )

    # One synthetic scan stream reused for every config: a dense urban world
    # so the maps actually fill their blocks.
    lidar = LidarConfig(num_lines=64, min_distance=3.0, max_distance=90.0)
    world = synthetic.make_world(seed=11, corridor_len=120.0)
    n_frames = args.warmup + args.frames
    poses = synthetic.make_trajectory(n_frames, speed=1.2)
    render = jax.jit(
        lambda q, t: synthetic.render_scan(
            synthetic.se3.Pose(q=q, t=t), world, lidar, 900, noise=0.008, seed=0
        )
    )

    def padded(xyz, valid, cap):
        n = xyz.shape[0]
        if n >= cap:
            return xyz[:cap], valid[:cap]
        return jnp.pad(xyz, ((0, cap - n), (0, 0))), jnp.pad(valid, (0, cap - n))

    def run_config(cfg, n_map):
        """Time the sharded step (1 x n_map mesh) over the scan stream.
        Frames are dispatched asynchronously (JAX dispatch runs ahead of the
        device) and completion is forced once at the end — per-frame time is
        pure device throughput, not tunnel round trips."""
        mesh = meshlib.make_mesh(1, n_map)
        state = es_sharded.init_sharded_state(cfg, 1, n_map)
        first = es_sharded.make_sharded_step(cfg, mesh, first=True)
        step = es_sharded.make_sharded_step(cfg, mesh, first=False)
        cap = cfg.capacity.scan_points
        diag = None
        t0 = None
        for i in range(n_frames):
            xyz, valid = render(poses.q[i], poses.t[i])
            xb, mb = padded(xyz, valid, cap)
            xb, mb = xb[None], mb[None]
            if i == 0:
                state, diag = first(state, xb, mb)
            else:
                state, diag = step(state, xb, mb)
            if i == args.warmup - 1:
                fetch_scalar(state.pose.t)  # drain warmup + compile
                t0 = time.perf_counter()
        fetch_scalar(state.pose.t)
        mean_s = (time.perf_counter() - t0) / (n_frames - args.warmup)
        return mean_s, diag

    def fetch_scalar(x):
        # block_until_ready is unreliable over the TPU tunnel; fetch a value.
        float(np.asarray(x)[0, 0])

    def comm_bytes_per_step(cfg, n_map, outer_iters=2):
        """Exact per-device all_gather receive volume per odometry step (the
        only traffic that grows with n_map; the psum'd 6x6 GN blocks are
        constant ~0.2 KB).  See es_sharded._sharded_associate."""
        k = cfg.capacity.knn_k
        total = 0
        for q in (cfg.capacity.ds_edge_points, cfg.capacity.ds_surf_points):
            merge = n_map * q * k * (4 + 12 + 8 + 4)  # sqdist,nxyz,nrg,idx
            route = q * k * (4 + 4 + 1)  # shard5, lidx5, matched (gathered Qs->Q)
            wb = q * 8  # scan_rg writebacks
            total += merge + route + wb
        return outer_iters * total

    out = {
        "platform": args.platform,
        "device": str(jax.devices()[0]),
        "block_points_per_shard": args.block_points,
        "frames": args.frames,
    }

    def run_single(cfg):
        """Single-chip baseline measured under the IDENTICAL loop structure
        as run_config (one fused extract+step program per frame, async
        dispatch, same warmup, completion forced once by a scalar fetch).
        SCALING_r04's structure efficiency came out >1.0 because this side
        was measured through ESPipeline — two dispatches per frame plus
        per-frame record bookkeeping the sharded loop never paid (VERDICT r4
        weak #4); with matched loops the shard_map program can only be
        equal-or-slower."""
        from pfilter_tpu.models import es_odometry
        from pfilter_tpu.ops import features as fops

        def fused_first(state, xyz, mask):
            feat = fops.extract_features(xyz, mask, cfg.lidar, cfg.features, cfg.capacity)
            return es_odometry.first_frame(state, feat, cfg)

        def fused_step(state, xyz, mask):
            feat = fops.extract_features(xyz, mask, cfg.lidar, cfg.features, cfg.capacity)
            return es_odometry.es_step(state, feat, cfg)

        first = jax.jit(fused_first)
        step = jax.jit(fused_step)
        state = es_odometry.init_state(cfg)
        cap = cfg.capacity.scan_points
        t0 = None
        for i in range(n_frames):
            xyz, valid = render(poses.q[i], poses.t[i])
            xb, mb = padded(xyz, valid, cap)
            if i == 0:
                state = first(state, xb, mb)
            else:
                state, _ = step(state, xb, mb)
            if i == args.warmup - 1:
                float(np.asarray(state.pose.t)[0])
                t0 = time.perf_counter()
        float(np.asarray(state.pose.t)[0])
        return (time.perf_counter() - t0) / (n_frames - args.warmup)

    if args.platform == "tpu":
        # (a) single-chip (non-sharded) baseline on the same stream, same
        # loop structure as the sharded measurement below.
        cfg1 = make_cfg(1)
        single_ms = run_single(cfg1) * 1e3

        # (b) sharded 1x1: the same program under shard_map (tiled kernel).
        mean_s, diag = run_config(cfg1, 1)
        shard_ms = mean_s * 1e3

        # (c) weak-scaling projection: per-shard compute is constant by
        # construction (block size fixed); the added cost at n shards is the
        # all_gather volume, which is exact arithmetic, over an ICI-bandwidth
        # window (TPU v5e: ~45 GB/s usable per direction per link; 10 GB/s
        # as a pessimistic multi-hop/congested bound).
        proj = {}
        for n in n_maps:
            extra = comm_bytes_per_step(cfg1, n) - comm_bytes_per_step(cfg1, 1)
            for bw, label in ((45e9, "ici_45GBps"), (10e9, "ici_10GBps")):
                t_n = shard_ms + extra / bw * 1e3
                proj.setdefault(str(n), {})[label] = round(shard_ms / t_n, 3)
            proj[str(n)]["comm_MB_per_step"] = round(comm_bytes_per_step(cfg1, n) / 1e6, 2)
        out.update(
            knn_impl="tiled",
            single_chip_ms=round(single_ms, 2),
            sharded_1x1_ms=round(shard_ms, 2),
            shard_structure_efficiency=round(single_ms / shard_ms, 3),
            weak_scaling_projection=proj,
            note=(
                "one real chip: per-shard compute measured, comm volume exact,"
                " efficiency projected over an ICI bandwidth window."
                " Methodology: single-chip and sharded-1x1 use IDENTICAL"
                " loops (one fused extract+step dispatch per frame, same"
                " warmup/frames/fetch policy, same pre-rendered stream), so"
                " structure efficiency = single/sharded is the pure cost of"
                " the shard_map program structure and must be <= 1.0"
            ),
        )
    else:
        results = {}
        for n_map in n_maps:
            if n_map > len(jax.devices()):
                print(f"skip n_map={n_map}: only {len(jax.devices())} devices")
                continue
            cfg = make_cfg(n_map)
            mean_s, diag = run_config(cfg, n_map)
            results[n_map] = {
                "mean_ms_per_step": round(mean_s * 1e3, 2),
                "surf_map_points_total": int(jax.device_get(diag.surf_map_size)[0]),
                "surf_map_capacity_total": cfg.capacity.surf_map_points,
                "total_work_ratio_vs_n1": None,
            }
            print(f"n_map={n_map}: {results[n_map]}")
        base = min(results)
        for n_map, r in results.items():
            r["total_work_ratio_vs_n1"] = round(
                r["mean_ms_per_step"] / results[base]["mean_ms_per_step"], 3
            )
        out.update(
            knn_impl="grid",
            results={str(k): v for k, v in sorted(results.items())},
            virtual_mesh_walltime_note=(
                "all virtual devices timeshare one host CPU: wall time grows"
                " with TOTAL work across shards, so this tier validates the"
                " collective program's compilation/execution, not"
                " real-hardware efficiency (see platform=tpu projection)"
            ),
        )

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
