"""BPF (beam + pillar + facade) scan-to-map odometry — TPU-native form of
``Odom_BPF_EstimationClass`` (ref: src/odomEstimationClass.cpp:649-1306).

Same skeleton as the ES pipeline (models.es_odometry) with three feature
maps: beam and pillar features use the point-to-line cost, facades use the
point-to-plane cost (ref: :736-738); each map gets its own persistence
counters, rgbds re-voxelization (facade at 2x leaf, ref: :1262-1264) and
eviction/aging.  ``merged_map`` mirrors ``mergeFeatures`` (ref: :1297-1306).

The association/GN/persistence kernels are shared with the ES pipeline
(es_odometry._associate and ops.gauss_newton) — the reference's three
``add*CostFactor`` bodies are structural clones of the ES ones (SURVEY.md C7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pfilter_tpu.config import PipelineConfig
from pfilter_tpu.models import map_state
from pfilter_tpu.models.es_odometry import (
    _associate,
    _associate_static,
    _compact,
    _regate,
    _weights,
    _weights_from,
)
from pfilter_tpu.ops import gauss_newton as gn
from pfilter_tpu.ops import pose_graph, se3, voxel

CHANNELS = ("beam", "pillar", "facade")


class BPFState(NamedTuple):
    beam_map: object  # TiledMap | HashGrid
    pillar_map: object
    facade_map: object
    pose: se3.Pose
    last_pose: se3.Pose
    opt_count: jnp.ndarray
    # Pose-graph window (ops/pose_graph.py) — see es_odometry.ESState.
    # Facade-only frames barely constrain z; the information-weighted
    # smoother is the back-end that carries those directions.
    pg_q: jnp.ndarray = None  # [K,4]
    pg_t: jnp.ndarray = None  # [K,3]
    pg_h: jnp.ndarray = None  # [K,6,6]
    pg_valid: jnp.ndarray = None  # [K]


class BPFDiag(NamedTuple):
    n_corr: jnp.ndarray  # [3] per-channel correspondence counts
    map_sizes: jnp.ndarray  # [3]
    dropped: jnp.ndarray = False  # device-side corrupt-frame guard fired
    # [3, 4] int32 per-channel overflow counters:
    # [compact_over, ds_voxel_over, merge_voxel_over, tile_cap_over]
    overflow: jnp.ndarray = 0


def init_state(cfg: PipelineConfig) -> BPFState:
    k = cfg.pose_graph.window
    return BPFState(
        beam_map=map_state.empty_index(cfg, "beam"),
        pillar_map=map_state.empty_index(cfg, "pillar"),
        facade_map=map_state.empty_index(cfg, "facade"),
        pose=se3.identity_pose(),
        last_pose=se3.identity_pose(),
        opt_count=jnp.asarray(cfg.odometry.max_outer_iters, jnp.int32),
        pg_q=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (k, 1)),
        pg_t=jnp.zeros((k, 3), jnp.float32),
        pg_h=jnp.zeros((k, 6, 6), jnp.float32),
        pg_valid=jnp.zeros(k, bool),
    )


def _leaf(cfg: PipelineConfig, kind: str) -> float:
    # beam/pillar at map_resolution, facade at 2x (ref: :658-660, :1262-1264).
    return cfg.odometry.map_resolution * (2.0 if kind == "facade" else 1.0)


def first_frame(state: BPFState, xyz, masks, cfg: PipelineConfig) -> BPFState:
    """Seed the three maps with the first scan's classified features
    (ref ``initMapWithPoints``, src/odomEstimationClass.cpp:689-695).

    Divergence from the reference: the seed clouds are rgbds-voxelized at the
    channel leaf first.  The reference seeds raw points into a KD-tree (no
    capacity limit); under static tile capacities a raw dense seed (facade
    with ground routed in is ~the whole lower scan) overflows near-sensor
    kNN tiles and silently truncates neighbor reads for exactly one frame —
    the first merge re-voxelizes anyway, so seeding at steady-state density
    changes nothing after frame 2 while keeping frame 1 exact."""
    new_maps = {}
    for kind in CHANNELS:
        cap = map_state.map_capacity(cfg, kind)
        comp_cap = (
            cfg.capacity.edge_points
            if map_state.is_line_kind(kind)
            else (cfg.capacity.bpf_plane_points or cfg.capacity.surf_points)
        )
        cxyz, cvalid = _compact(xyz, masks[kind], comp_cap)
        seed = voxel.voxel_downsample_rgbds(
            voxel.PointSet(cxyz, jnp.zeros((comp_cap, 2), jnp.float32), cvalid),
            _leaf(cfg, kind),
            cap,
        )
        new_maps[kind] = map_state.build_index(
            seed.xyz, seed.rg, seed.valid, state.pose.t, cfg, kind
        )
    return state._replace(
        beam_map=new_maps["beam"],
        pillar_map=new_maps["pillar"],
        facade_map=new_maps["facade"],
        opt_count=jnp.asarray(cfg.odometry.max_outer_iters, jnp.int32),
    )


def _bpf_outer_per_iter(cfg, opt_eff, pose0, center, grids, ds, bounds):
    """Reference-faithful outer loop: full re-association every iteration
    over all three channels (ref: src/odomEstimationClass.cpp:722-760)."""
    o = cfg.odometry

    def outer_body(carry):
        q, t_l, _, rgs, scan_rgs, _, it = carry
        pose_l = se3.Pose(q=q, t=t_l)
        # Coarse-to-fine gate schedule (see es_odometry.es_step).
        gate_sq = jnp.where(it == 0, o.nn_gate_wide_sq, o.nn_gate_sq)

        assocs = {}
        new_rgs = []
        new_scan_rgs = []
        for i, kind in enumerate(CHANNELS):
            a = _associate(
                kind,
                grids[kind],
                rgs[i],
                pose_l,
                center,
                ds[kind].xyz,
                ds[kind].valid,
                scan_rgs[i],
                cfg,
                qsort_bounds=bounds[kind],
                gate_sq=gate_sq,
            )
            assocs[kind] = a
            new_rgs.append(
                rgs[i].at[:, 1].set(jnp.minimum(o.counter_cap, rgs[i][:, 1] + a.g_increment))
            )
            new_scan_rgs.append(a.scan_rg)

        factors = [
            gn.Correspondences(
                kind="edge" if map_state.is_line_kind(kind) else "surf",
                points=ds[kind].xyz,
                geom_a=assocs[kind].geom_a,
                geom_b=assocs[kind].geom_b,
                weight=_weights(assocs[kind], o.weight_type),
                valid=assocs[kind].valid,
            )
            for kind in CHANNELS
        ]

        def inner(_, carry_i):
            pose, _ = carry_i
            new_pose, (hh, _b) = gn.gn_iteration(pose, factors, o.huber_delta, o.gn_damping)
            return (new_pose, hh)

        pose_l, h = jax.lax.fori_loop(
            0, o.inner_gn_iters, inner, (pose_l, jnp.zeros((6, 6), jnp.float32))
        )
        counts = jnp.stack([assocs[k].valid.sum() for k in CHANNELS])
        return (pose_l.q, pose_l.t, h, tuple(new_rgs), tuple(new_scan_rgs), counts, it + 1)

    init = (
        pose0.q,
        pose0.t,
        jnp.zeros((6, 6), jnp.float32),
        tuple(grids[k].rg for k in CHANNELS),
        tuple(ds[k].rg for k in CHANNELS),
        jnp.zeros(3, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    q, t_l, h_fin, rgs, scan_rgs, counts, _ = jax.lax.while_loop(
        lambda c: c[-1] < opt_eff, outer_body, init
    )
    return q, t_l, h_fin, rgs, scan_rgs, counts


def _bpf_outer_assoc_once(cfg, opt_eff, pose0, center, grids, ds, bounds):
    """Hoisted-association outer loop over three channels (see
    es_odometry._es_outer_assoc_once for the semantics and the wide-pass
    g-credit rule)."""
    o = cfg.odometry
    k = cfg.capacity.knn_k

    st = {
        kind: _associate_static(
            kind, grids[kind], grids[kind].rg, pose0, center,
            ds[kind].xyz, ds[kind].valid, cfg, bounds[kind],
        )
        for kind in CHANNELS
    }

    def outer_body(carry):
        q, t_l, _, m0s, _, _, it = carry
        pose_l = se3.Pose(q=q, t=t_l)
        gate_sq = jnp.where(it == 0, o.nn_gate_wide_sq, o.nn_gate_sq)
        matches, vcs, new_m0s = [], [], []
        for i, kind in enumerate(CHANNELS):
            m, vc = _regate(st[kind], pose_l, ds[kind].xyz, gate_sq)
            matches.append(m)
            vcs.append(vc)
            new_m0s.append(jnp.where(it == 0, m, m0s[i]))

        factors = [
            gn.Correspondences(
                kind="edge" if map_state.is_line_kind(kind) else "surf",
                points=ds[kind].xyz,
                geom_a=st[kind].geom_a,
                geom_b=st[kind].geom_b,
                weight=_weights_from(st[kind].observe, st[kind].sparsity, vcs[i], o.weight_type),
                valid=vcs[i],
            )
            for i, kind in enumerate(CHANNELS)
        ]

        def inner(_, carry_i):
            pose, _ = carry_i
            new_pose, (hh, _b) = gn.gn_iteration(pose, factors, o.huber_delta, o.gn_damping)
            return (new_pose, hh)

        pose_l, h = jax.lax.fori_loop(
            0, o.inner_gn_iters, inner, (pose_l, jnp.zeros((6, 6), jnp.float32))
        )
        return (pose_l.q, pose_l.t, h, tuple(new_m0s), tuple(matches), tuple(vcs), it + 1)

    zeros = tuple(jnp.zeros(ds[kind].xyz.shape[0], bool) for kind in CHANNELS)
    init = (
        pose0.q,
        pose0.t,
        jnp.zeros((6, 6), jnp.float32),
        zeros,
        zeros,
        zeros,
        jnp.asarray(0, jnp.int32),
    )
    q, t_l, h_fin, m0s, matches, vcs, _ = jax.lax.while_loop(
        lambda c: c[-1] < opt_eff, outer_body, init
    )

    scale_rest = jnp.maximum(opt_eff - 1, 0).astype(jnp.float32)
    rgs, scan_rgs, counts = [], [], []
    for i, kind in enumerate(CHANNELS):
        w = m0s[i].astype(jnp.float32) + scale_rest * matches[i].astype(jnp.float32)
        inc = jnp.zeros(grids[kind].rg.shape[0], jnp.float32)
        inc = inc.at[st[kind].nn_idx.reshape(-1)].add(jnp.repeat(w, k), mode="drop")
        rgs.append(
            grids[kind].rg.at[:, 1].set(
                jnp.minimum(o.counter_cap, grids[kind].rg[:, 1] + inc)
            )
        )
        new_rg = jnp.stack(
            [
                jnp.minimum(o.counter_cap, jnp.floor(st[kind].round_)),
                jnp.minimum(o.counter_cap, jnp.floor(st[kind].observe)),
            ],
            -1,
        )
        vc_union = (m0s[i] & st[kind].pers_ok) | vcs[i]
        scan_rgs.append(jnp.where(vc_union[:, None], new_rg, ds[kind].rg))
        counts.append(vcs[i].sum())
    return q, t_l, h_fin, tuple(rgs), tuple(scan_rgs), jnp.stack(counts)


def bpf_step(state: BPFState, xyz, masks, cfg: PipelineConfig):
    """One BPF odometry frame (ref ``updatePointsToMap``,
    src/odomEstimationClass.cpp:702-760).  ``masks`` maps channel name ->
    boolean mask over ``xyz``."""
    o, cap = cfg.odometry, cfg.capacity

    opt_count = jnp.maximum(o.min_outer_iters, state.opt_count - 1)
    pred = se3.constant_velocity_predict(state.pose, state.last_pose)
    last_pose = state.pose

    grids = {"beam": state.beam_map, "pillar": state.pillar_map, "facade": state.facade_map}
    ds = {}
    over_compact = {}
    over_ds = {}
    for kind in CHANNELS:
        line = map_state.is_line_kind(kind)
        comp_cap = cap.edge_points if line else (cap.bpf_plane_points or cap.surf_points)
        ds_cap = cap.ds_edge_points if line else cap.ds_surf_points
        cxyz, cvalid = _compact(xyz, masks[kind], comp_cap)
        over_compact[kind] = jnp.maximum(masks[kind].sum() - comp_cap, 0)
        ds[kind], over_ds[kind] = voxel.voxel_downsample_rgbds_counted(
            voxel.PointSet(cxyz, jnp.zeros((comp_cap, 2), jnp.float32), cvalid),
            _leaf(cfg, kind),
            ds_cap,
        )

    center = pred.t
    pose0 = se3.Pose(q=pred.q, t=jnp.zeros(3, jnp.float32))

    # Tile-sort each feature cloud once per frame at the predicted pose and
    # keep all downstream work in sorted order (see es_odometry.es_step).
    bounds = {k: None for k in CHANNELS}
    if cap.knn_impl == "tiled":
        for kind in CHANNELS:
            qs = map_state.sort_queries_for_index(
                grids[kind],
                se3.transform_points(pred, ds[kind].xyz),
                ds[kind].valid,
                cfg,
                kind,
            )
            ds[kind] = voxel.PointSet(
                xyz=ds[kind].xyz[qs.order],
                rg=ds[kind].rg[qs.order],
                valid=ds[kind].valid[qs.order],
            )
            bounds[kind] = qs.bounds

    # Map-size gate (ref: :722 — beam>10 && pillar>10 && facade>50).
    enough = (
        (grids["beam"].valid.sum() > 10)
        & (grids["pillar"].valid.sum() > 10)
        & (grids["facade"].valid.sum() > 50)
    )
    opt_eff = jnp.where(enough, opt_count, 0)

    if o.assoc_once:
        q, t_l, h_fin, rgs, scan_rgs, counts = _bpf_outer_assoc_once(
            cfg, opt_eff, pose0, center, grids, ds, bounds
        )
    else:
        q, t_l, h_fin, rgs, scan_rgs, counts = _bpf_outer_per_iter(
            cfg, opt_eff, pose0, center, grids, ds, bounds
        )
    pose = se3.Pose(q=q, t=t_l + center)

    # Device-side corrupt-frame guard (same as es_odometry.es_step).
    finite = jnp.all(jnp.isfinite(pose.q)) & jnp.all(jnp.isfinite(pose.t))
    jump = jnp.linalg.norm(jnp.where(finite, pose.t - state.pose.t, 0.0))
    dropped = ~finite | (jump > o.max_jump_m)
    pose = se3.Pose(
        q=jnp.where(dropped, state.pose.q, pose.q),
        t=jnp.where(dropped, state.pose.t, pose.t),
    )
    last_pose = se3.Pose(
        q=jnp.where(dropped, state.last_pose.q, last_pose.q),
        t=jnp.where(dropped, state.last_pose.t, last_pose.t),
    )

    # Pose-graph window + optional smoothing (see es_odometry.es_step).
    pgc = cfg.pose_graph
    h_anchor = jnp.where(dropped, 1e-3 * jnp.eye(6, dtype=jnp.float32), h_fin)
    pg_q, pg_t, pg_h, pg_valid = pose_graph.push_window(
        state.pg_q, state.pg_t, state.pg_h, state.pg_valid, pose.q, pose.t, h_anchor
    )
    if pgc.enabled:
        pose = pose_graph.smoothed_newest(pg_q, pg_t, pg_h, pg_valid, pose, pgc)

    new_maps = {}
    over_rows = []
    for i, kind in enumerate(CHANNELS):
        world = se3.transform_points(pose, ds[kind].xyz)
        new_maps[kind], over_merge = map_state.merge_scan_into_index(
            grids[kind]._replace(rg=rgs[i]),
            world,
            scan_rgs[i],
            ds[kind].valid,
            pose.t,
            _leaf(cfg, kind),
            cfg,
            kind,
        )
        over_rows.append(
            jnp.stack(
                [
                    over_compact[kind],
                    over_ds[kind],
                    over_merge,
                    map_state.tile_overflow_count(new_maps[kind], cfg, kind),
                ]
            )
        )

    new_state = BPFState(
        beam_map=new_maps["beam"],
        pillar_map=new_maps["pillar"],
        facade_map=new_maps["facade"],
        pose=pose,
        last_pose=last_pose,
        opt_count=opt_count,
        pg_q=pg_q,
        pg_t=pg_t,
        pg_h=pg_h,
        pg_valid=pg_valid,
    )
    diag = BPFDiag(
        n_corr=counts,
        map_sizes=jnp.stack([new_maps[k].valid.sum() for k in CHANNELS]),
        dropped=dropped,
        overflow=jnp.stack(over_rows).astype(jnp.int32),
    )
    return new_state, diag


def merged_map(state: BPFState) -> voxel.PointSet:
    """Concatenated beam+pillar+facade map (ref ``mergeFeatures``,
    src/odomEstimationClass.cpp:1297-1306)."""
    return voxel.concat_pointsets(
        voxel.concat_pointsets(
            voxel.PointSet(state.beam_map.xyz, state.beam_map.rg, state.beam_map.valid),
            voxel.PointSet(state.pillar_map.xyz, state.pillar_map.rg, state.pillar_map.valid),
        ),
        voxel.PointSet(state.facade_map.xyz, state.facade_map.rg, state.facade_map.valid),
    )
