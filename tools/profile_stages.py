#!/usr/bin/env python
"""Per-stage device timing of the ES odometry frame at KITTI scale.

Forces completion by pulling a scalar from every result (block_until_ready
alone has proven unreliable over remote-device tunnels).  Each stage compiles
once; timings are steady-state means.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def force(x):
    leaves = [l for l in __import__("jax").tree.leaves(x)]
    return float(np.asarray(leaves[0]).reshape(-1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", default="all", help="comma list: extract,ds,build,sort,query,gn,merge,step")
    args = ap.parse_args()
    want = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    from pfilter_tpu.config import kitti_config
    from pfilter_tpu.models import es_odometry, map_state
    from pfilter_tpu.ops import features as fops
    from pfilter_tpu.ops import knn_tiled, voxel

    cfg = kitti_config()
    cap = cfg.capacity
    rng = np.random.default_rng(0)

    def timeit(name, f, *a):
        """Batch-dispatch timing: the device queue serializes the iters and
        completion is forced ONCE — a per-iteration fetch would add the
        ~34 ms host<->device tunnel round trip to every sample."""
        r = f(*a)
        force(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(*a)
        force(r)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name}: {dt:.2f} ms", flush=True)
        return r

    N = cap.scan_points
    xyz = jnp.asarray(rng.uniform(-60, 60, (N, 3)).astype(np.float32))
    mask = jnp.ones(N, bool)

    if want & {"all", "extract"}:
        extract = jax.jit(
            lambda x, m: fops.extract_features(x, m, cfg.lidar, cfg.features, cfg.capacity)
        )
        timeit(f"extract({cap.scan_points//1024}k)", extract, xyz, mask)

    M = cap.surf_map_points
    mxyz = jnp.asarray(rng.uniform(-100, 100, (M, 3)).astype(np.float32))
    mrg = jnp.zeros((M, 2), jnp.float32)
    mv = jnp.ones(M, bool)
    build = jax.jit(lambda x, r, v: map_state.build_index(x, r, v, jnp.zeros(3), cfg, "surf"))
    grid = build(mxyz, mrg, mv)
    if want & {"all", "build"}:
        timeit(f"build_index({M//1024}k)", build, mxyz, mrg, mv)

    Q = cap.ds_surf_points
    q = jnp.asarray(rng.uniform(-90, 90, (Q, 3)).astype(np.float32))
    qv = jnp.ones(Q, bool)
    sortq = jax.jit(
        lambda q, v: knn_tiled.sort_queries(q, v, grid.origin, cap.knn_tiles, cap.tile_cells)
    )
    qs = sortq(q, qv)
    sq = q[qs.order]
    if want & {"all", "sort"}:
        timeit(f"sort_queries({Q//1024}k)", sortq, q, qv)

    if want & {"all", "query"}:
        f5 = jax.jit(
            lambda g, s, b: knn_tiled.query_tiled_sorted(
                g, s, b, cap.knn_tiles, cap.tile_cells, cap.surf_tile_cap, k=5
            )
        )
        timeit(f"query_kernel({Q//1024}k q, {M//1024}k map)", f5, grid, sq, qs.bounds)

    if want & {"all", "ds"}:
        sx = jnp.asarray(rng.uniform(-90, 90, (cap.surf_points, 3)).astype(np.float32))
        sv = jnp.ones(cap.surf_points, bool)
        ds = jax.jit(
            lambda x, v: voxel.voxel_downsample_rgbds(
                voxel.PointSet(x, jnp.zeros((cap.surf_points, 2), jnp.float32), v),
                0.8,
                cap.ds_surf_points,
            )
        )
        timeit(f"rgbds({cap.surf_points//1024}k->{cap.ds_surf_points//1024}k)", ds, sx, sv)

    if want & {"all", "merge"}:
        merge = jax.jit(
            lambda g, w, r, v: map_state.merge_scan_into_index(
                g, w, r, v, jnp.zeros(3), 0.8, cfg, "surf"
            )[0]
        )
        timeit(f"merge({M//1024}k+{Q//1024}k)", merge, grid, q, jnp.zeros((Q, 2), jnp.float32), qv)

    if want & {"all", "step"}:
        extract = jax.jit(
            lambda x, m: fops.extract_features(x, m, cfg.lidar, cfg.features, cfg.capacity)
        )
        feat = extract(xyz, mask)
        state = es_odometry.init_state(cfg)
        first = jax.jit(lambda s, f: es_odometry.first_frame(s, f, cfg))
        state = first(state, feat)
        step = jax.jit(lambda s, f: es_odometry.es_step(s, f, cfg))
        timeit("es_step(full frame)", step, state, feat)


if __name__ == "__main__":
    main()
