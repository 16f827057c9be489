#!/usr/bin/env python
"""Diagnose the sharded (n_map=1) vs single-chip step overhead.

SCALING_r02 measured sharded_1x1 at ~0.53x the single-chip speed; this tool
compares the two compiled programs directly — wall time AND XLA cost
analysis (flops / bytes accessed) — to locate where the structural overhead
lives, and times the sharded step with its stages isolated.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--block-points", type=int, default=32768)
    ap.add_argument("--scan-points", type=int, default=32768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pfilter_tpu.config import CapacityConfig, LidarConfig, OdometryConfig, PipelineConfig
    from pfilter_tpu.models import es_odometry
    from pfilter_tpu.ops import features as fops
    from pfilter_tpu.parallel import es_sharded, mesh as meshlib
    from pfilter_tpu.utils import synthetic

    cfg = PipelineConfig(
        lidar=LidarConfig(num_lines=64, min_distance=3.0, max_distance=90.0),
        odometry=OdometryConfig(map_resolution=0.4),
        capacity=CapacityConfig(
            scan_points=args.scan_points,
            edge_points=8192,
            surf_points=args.scan_points,
            ds_edge_points=2048,
            ds_surf_points=8192,
            edge_map_points=args.block_points // 4,
            surf_map_points=args.block_points,
            knn_impl="tiled",
        ),
    )

    lidar = cfg.lidar
    world = synthetic.make_world(seed=11, corridor_len=120.0)
    poses = synthetic.make_trajectory(8, speed=1.2)
    render = jax.jit(
        lambda q, t: synthetic.render_scan(
            synthetic.se3.Pose(q=q, t=t), world, lidar, 900, noise=0.008, seed=0
        )
    )

    cap = cfg.capacity.scan_points

    def padded(xyz, valid):
        n = xyz.shape[0]
        if n >= cap:
            return xyz[:cap], valid[:cap]
        return jnp.pad(xyz, ((0, cap - n), (0, 0))), jnp.pad(valid, (0, cap - n))

    def force(x):
        leaves = jax.tree.leaves(x)
        return float(np.asarray(leaves[0]).reshape(-1)[0])

    def timeit(name, f, *a):
        r = f(*a)
        force(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(*a)
            force(r)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name}: {dt:.2f} ms", flush=True)
        return r

    def cost(name, f, *a):
        c = jax.jit(f).lower(*a).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        print(
            f"{name}: flops={c.get('flops', 0) / 1e9:.3f} G  "
            f"bytes={c.get('bytes accessed', 0) / 1e6:.1f} MB",
            flush=True,
        )

    # -------- single-chip program: extract + es_step fused (block_fn twin)
    def single_fn(state, xyz, mask):
        feat = fops.extract_features(xyz, mask, cfg.lidar, cfg.features, cfg.capacity)
        return es_odometry.es_step(state, feat, cfg)

    xyz0, valid0 = render(poses.q[0], poses.t[0])
    xb, mb = padded(xyz0, valid0)
    state1 = es_odometry.init_state(cfg)
    feat0 = jax.jit(
        lambda x, m: fops.extract_features(x, m, cfg.lidar, cfg.features, cfg.capacity)
    )(xb, mb)
    state1 = jax.jit(lambda s, f: es_odometry.first_frame(s, f, cfg))(state1, feat0)
    # run a couple of frames so maps are populated
    single = jax.jit(single_fn)
    for i in range(1, 4):
        x, v = padded(*render(poses.q[i], poses.t[i]))
        state1, _ = single(state1, x, v)

    cost("single es_step", single_fn, state1, xb, mb)
    timeit("single es_step", lambda s: single(s, xb, mb), state1)

    # -------- sharded 1x1 program
    mesh = meshlib.make_mesh(1, 1)
    stateS = es_sharded.init_sharded_state(cfg, 1, 1)
    firstS = es_sharded.make_sharded_step(cfg, mesh, first=True)
    stepS = es_sharded.make_sharded_step(cfg, mesh, first=False)
    stateS, _ = firstS(stateS, xb[None], mb[None])
    for i in range(1, 4):
        x, v = padded(*render(poses.q[i], poses.t[i]))
        stateS, _ = stepS(stateS, x[None], v[None])

    c = stepS.lower(stateS, xb[None], mb[None]).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    print(
        f"sharded 1x1 step: flops={c.get('flops', 0) / 1e9:.3f} G  "
        f"bytes={c.get('bytes accessed', 0) / 1e6:.1f} MB",
        flush=True,
    )
    timeit("sharded 1x1 step", lambda s: stepS(s, xb[None], mb[None]), stateS)


if __name__ == "__main__":
    main()
