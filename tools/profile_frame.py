#!/usr/bin/env python
"""Realistic per-stage profile of the ES frame on the bench's city world.

Methodology: run the pipeline for --settle frames so map occupancy reaches
its steady state, then time each stage by dispatching it --iters times
back-to-back and blocking ONCE at the end — per-dispatch tunnel round trips
(tens of ms on a remote device) never pollute the numbers.

Stages timed on the REAL steady-state inputs (not full-capacity random
clouds, which overstate sort/scatter costs by the capacity/occupancy ratio).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--settle", type=int, default=30)
    ap.add_argument("--azimuth", type=int, default=1800)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pfilter_tpu.config import kitti_config
    from pfilter_tpu.models import es_odometry, map_state
    from pfilter_tpu.ops import features as fops
    from pfilter_tpu.ops import se3, voxel
    from pfilter_tpu.pipeline import ESPipeline
    from pfilter_tpu.utils import synthetic

    cfg = kitti_config()
    cap = cfg.capacity
    world = synthetic.make_city_world(seed=7)
    poses = synthetic.make_loop_trajectory(args.settle + 1, speed=1.5)

    npts = cap.scan_points

    @jax.jit
    def render_one(q, t, i):
        xyz, valid = synthetic.render_scan(
            synthetic.se3.Pose(q=q, t=t), world, cfg.lidar, args.azimuth,
            noise=0.008, seed=0, t_time=i,
        )
        n = xyz.shape[0]
        return jnp.pad(xyz, ((0, npts - n), (0, 0))), jnp.pad(valid, (0, npts - n))

    frames = [render_one(poses.q[i], poses.t[i], jnp.float32(i)) for i in range(args.settle + 1)]
    frames[-1][0].block_until_ready()
    print("rendered", file=sys.stderr, flush=True)

    pipe = ESPipeline(cfg=cfg, sync=False, fetch_lag=4)
    for i in range(args.settle):
        pipe.process_frame(*frames[i])
    pipe.flush()
    state = pipe.state
    print(
        f"settled: edge_map={int(np.asarray(state.edge_map.valid.sum()))} "
        f"surf_map={int(np.asarray(state.surf_map.valid.sum()))}",
        file=sys.stderr, flush=True,
    )

    xyz_d, mask_d = frames[args.settle]
    extract = pipe._extract
    step = pipe._step
    feat = extract(xyz_d, mask_d)
    jax.block_until_ready(feat)

    results = {}

    def timeit(name, fn, *a):
        out = fn(*a)  # ensure compiled
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = None
        for _ in range(args.iters):
            outs = fn(*a)
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        results[name] = round(dt, 2)
        print(f"{name}: {dt:.2f} ms", file=sys.stderr, flush=True)
        return out

    timeit("extract", extract, xyz_d, mask_d)
    timeit("es_step", step, state, feat)

    # --- sub-stages of es_step on the same steady inputs -------------------
    o = cfg.odometry

    pred = se3.constant_velocity_predict(state.pose, state.last_pose)

    @jax.jit
    def stage_downsample(feat):
        e_xyz, e_valid = es_odometry._compact(feat.xyz, feat.edge_mask, cap.edge_points)
        s_xyz, s_valid = es_odometry._compact(feat.xyz, feat.surf_mask, cap.surf_points)
        ds_edge, _ = voxel.voxel_downsample_rgbds_counted(
            voxel.PointSet(e_xyz, jnp.zeros((cap.edge_points, 2), jnp.float32), e_valid),
            o.map_resolution, cap.ds_edge_points,
        )
        ds_surf, _ = voxel.voxel_downsample_rgbds_counted(
            voxel.PointSet(s_xyz, jnp.zeros((cap.surf_points, 2), jnp.float32), s_valid),
            o.map_resolution * 2.0, cap.ds_surf_points,
        )
        return ds_edge, ds_surf

    ds_edge, ds_surf = timeit("  downsample", stage_downsample, feat)

    @jax.jit
    def stage_sort(ds_edge, ds_surf):
        e_sort = map_state.sort_queries_for_index(
            state.edge_map, se3.transform_points(pred, ds_edge.xyz), ds_edge.valid, cfg, "edge")
        s_sort = map_state.sort_queries_for_index(
            state.surf_map, se3.transform_points(pred, ds_surf.xyz), ds_surf.valid, cfg, "surf")
        return e_sort, s_sort

    e_sort, s_sort = timeit("  query_sort", stage_sort, ds_edge, ds_surf)

    se_xyz = ds_edge.xyz[e_sort.order]
    ss_xyz = ds_surf.xyz[s_sort.order]
    se_val = ds_edge.valid[e_sort.order]
    ss_val = ds_surf.valid[s_sort.order]
    center = pred.t
    pose0 = se3.Pose(q=pred.q, t=jnp.zeros(3, jnp.float32))

    @jax.jit
    def stage_knn_edge(sxyz):
        qw = se3.transform_points(pose0, sxyz) + center
        return map_state.query_index_presorted(state.edge_map, qw, e_sort.bounds, cfg, "edge")

    @jax.jit
    def stage_knn_surf(sxyz):
        qw = se3.transform_points(pose0, sxyz) + center
        return map_state.query_index_presorted(state.surf_map, qw, s_sort.bounds, cfg, "surf")

    timeit("  knn_edge(8k q)", stage_knn_edge, se_xyz)
    timeit("  knn_surf(32k q)", stage_knn_surf, ss_xyz)

    @jax.jit
    def stage_assoc_edge(sxyz, sval):
        a = es_odometry._associate(
            "edge", state.edge_map, state.edge_map.rg, pose0, center, sxyz, sval,
            jnp.zeros((sxyz.shape[0], 2), jnp.float32), cfg, qsort_bounds=e_sort.bounds)
        return a.valid.sum(), a.geom_a

    @jax.jit
    def stage_assoc_surf(sxyz, sval):
        a = es_odometry._associate(
            "surf", state.surf_map, state.surf_map.rg, pose0, center, sxyz, sval,
            jnp.zeros((sxyz.shape[0], 2), jnp.float32), cfg, qsort_bounds=s_sort.bounds)
        return a.valid.sum(), a.geom_a

    timeit("  assoc_edge(knn+fit+gate)", stage_assoc_edge, se_xyz, se_val)
    timeit("  assoc_surf(knn+fit+gate)", stage_assoc_surf, ss_xyz, ss_val)

    # GN-only: build factors once, time the 4-iteration inner loop.
    from pfilter_tpu.ops import gauss_newton as gn

    ea = es_odometry._associate(
        "edge", state.edge_map, state.edge_map.rg, pose0, center, se_xyz, se_val,
        jnp.zeros((se_xyz.shape[0], 2), jnp.float32), cfg, qsort_bounds=e_sort.bounds)
    sa = es_odometry._associate(
        "surf", state.surf_map, state.surf_map.rg, pose0, center, ss_xyz, ss_val,
        jnp.zeros((ss_xyz.shape[0], 2), jnp.float32), cfg, qsort_bounds=s_sort.bounds)

    @jax.jit
    def stage_gn(q, t):
        pose = se3.Pose(q=q, t=t)
        factors = [
            gn.Correspondences(kind="edge", points=se_xyz, geom_a=ea.geom_a,
                               geom_b=ea.geom_b, weight=jnp.ones_like(ea.valid, jnp.float32),
                               valid=ea.valid),
            gn.Correspondences(kind="surf", points=ss_xyz, geom_a=sa.geom_a,
                               geom_b=sa.geom_b, weight=jnp.ones_like(sa.valid, jnp.float32),
                               valid=sa.valid),
        ]

        def inner(_, p):
            np_, _ = gn.gn_iteration(p, factors, o.huber_delta, o.gn_damping)
            return np_

        out = jax.lax.fori_loop(0, o.inner_gn_iters, inner, pose)
        return out.q, out.t

    timeit("  gn_4iters", stage_gn, pose0.q, pose0.t)

    pose_fin = se3.Pose(q=pred.q, t=pred.t)
    ew = se3.transform_points(pose_fin, ds_edge.xyz)
    sw = se3.transform_points(pose_fin, ds_surf.xyz)

    @jax.jit
    def stage_merge_edge(ew):
        m, d = map_state.merge_scan_into_index(
            state.edge_map, ew, ds_edge.rg, ds_edge.valid, pose_fin.t,
            o.map_resolution, cfg, "edge")
        return m.valid.sum(), d

    @jax.jit
    def stage_merge_surf(sw):
        m, d = map_state.merge_scan_into_index(
            state.surf_map, sw, ds_surf.rg, ds_surf.valid, pose_fin.t,
            o.map_resolution * 2.0, cfg, "surf")
        return m.valid.sum(), d

    timeit("  merge_edge(32k+8k)", stage_merge_edge, ew)
    timeit("  merge_surf(131k+32k)", stage_merge_surf, sw)

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
