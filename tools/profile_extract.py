#!/usr/bin/env python
"""Sub-stage device timing of feature extraction at KITTI scale."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from pfilter_tpu.config import kitti_config
    from pfilter_tpu.ops import features as fops

    cfg = kitti_config()
    cap = cfg.capacity
    rng = np.random.default_rng(0)
    N = cap.scan_points
    xyz = jnp.asarray(rng.uniform(-60, 60, (N, 3)).astype(np.float32))
    mask = jnp.ones(N, bool)

    def timeit(name, f, *a, iters=10):
        r = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = jax.block_until_ready(f(*a))
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms", flush=True)
        return r

    bin_fn = jax.jit(lambda x, m: fops.bin_rings(x, m, cfg.lidar, cap))
    grid = timeit("bin_rings", bin_fn, xyz, mask)

    curv_fn = jax.jit(lambda g: fops.ring_curvature(g, cfg.features))
    timeit("curvature", curv_fn, grid)

    reach_fn = jax.jit(lambda g: fops._suppression_reach(g, cfg.features))
    timeit("suppression_reach", reach_fn, grid)

    full_fn = jax.jit(lambda x, m: fops.extract_features(x, m, cfg.lidar, cfg.features, cap))
    timeit("extract_full", full_fn, xyz, mask)

    # ring_ids + argsort alone (the suspected hot part of bin_rings)
    ids_fn = jax.jit(lambda x, m: fops.ring_ids(x, m, cfg.lidar))
    timeit("ring_ids", ids_fn, xyz, mask)
    sort_fn = jax.jit(lambda r: jnp.argsort(r, stable=True))
    ring, _ = ids_fn(xyz, mask)
    timeit("argsort(131k)", sort_fn, ring)


if __name__ == "__main__":
    main()
