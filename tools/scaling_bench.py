"""Weak-scaling benchmark for sharded map registration.

Measures the north-star scaling metric (BASELINE.md: >= 70% weak-scaling
efficiency on map registration across >= 2 workers): per-shard map block size
is held constant while the shard count n_map grows, so the total registered
map grows linearly with devices and perfect scaling keeps the per-step time
flat.  Efficiency(n) = T(1) / T(n).

Two execution tiers (one real TPU chip is available in this environment):

- ``--platform cpu`` (default): an ``--xla_force_host_platform_device_count``
  virtual mesh.  Collectives compile to XLA's real all_gather/psum lowering,
  so the *structural* scaling cost (comm volume, merge width) is measured,
  but absolute times are host times.  Uses knn_impl=grid (XLA-native) so the
  timed program is compiled code, not the Pallas interpreter.
- ``--platform tpu``: the single real chip, n_map=1 only — measures sharded
  vs single-chip parity of the tiled Pallas path (the overhead of the
  shard_map program structure itself).

Writes one JSON dict (see --out) with per-n_map step times and efficiencies.

Replaces (at scale) the reference's single-process registration
(src/odomEstimationClass.cpp:229-282); sharding design in
pfilter_tpu/parallel/es_sharded.py.
"""

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=("cpu", "tpu"))
    ap.add_argument("--n-maps", default="1,2,4,8")
    ap.add_argument("--frames", type=int, default=12, help="timed steps per config")
    ap.add_argument("--warmup", type=int, default=3)
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

    results = {}
    for n_map in n_maps:
        if n_map > len(jax.devices()):
            print(f"skip n_map={n_map}: only {len(jax.devices())} devices")
            continue
        cfg = make_cfg(n_map)
        mesh = meshlib.make_mesh(1, n_map)
        state = es_sharded.init_sharded_state(cfg, 1, n_map)
        first = es_sharded.make_sharded_step(cfg, mesh, first=True)
        step = es_sharded.make_sharded_step(cfg, mesh, first=False)

        cap = cfg.capacity.scan_points
        times = []
        for i in range(n_frames):
            xyz, valid = render(poses.q[i], poses.t[i])
            xb, mb = padded(xyz, valid, cap)
            xb, mb = xb[None], mb[None]
            t0 = time.perf_counter()
            if i == 0:
                state, diag = first(state, xb, mb)
            else:
                state, diag = step(state, xb, mb)
            jax.block_until_ready(state.pose.t)
            dt = time.perf_counter() - t0
            if i >= args.warmup:
                times.append(dt)
        mean_ms = float(np.mean(times) * 1e3)
        results[n_map] = {
            "mean_ms_per_step": round(mean_ms, 2),
            "p50_ms": round(float(np.percentile(times, 50) * 1e3), 2),
            "surf_map_points_total": int(jax.device_get(diag.surf_map_size)[0]),
            "surf_map_capacity_total": cfg.capacity.surf_map_points,
        }
        print(f"n_map={n_map}: {results[n_map]}")

    base = min(results)
    for n_map, r in results.items():
        r["weak_scaling_efficiency"] = round(
            results[base]["mean_ms_per_step"] / r["mean_ms_per_step"], 3
        )

    out = {
        "platform": args.platform,
        "device": str(jax.devices()[0]),
        "knn_impl": "grid" if args.platform == "cpu" else "tiled",
        "block_points_per_shard": args.block_points,
        "frames": args.frames,
        "results": {str(k): v for k, v in sorted(results.items())},
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
