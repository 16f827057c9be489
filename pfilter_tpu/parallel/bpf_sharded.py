"""Sharded BPF odometry: the reference's *default* launch pipeline
(``featurePreExtract=1`` — ground seg -> DCVC -> PCA classify ->
beam/pillar/facade scan-to-map GN, ref: launch/pfilter_kitti.launch:5-10,
src/odomEstimationClass.cpp:649-1306) over the same seq x map device mesh as
:mod:`pfilter_tpu.parallel.es_sharded`.

Design: the collective association machinery in ``es_sharded`` is already
channel-agnostic (``_sharded_associate_static`` / ``_sharded_associate`` take
``kind``), so this module is the N-channel generalization of
``_es_step_block``: each of the three feature maps is hash-partitioned across
the map axis, the per-shard 5-NN candidates are ``all_gather``-merged, query
slices build shard-local factors for ALL channels, and one ``psum`` reduces
the combined 6x6 normal equations.  The frontend (ground/DCVC/PCA) runs
replicated inside each map group — it is pure XLA on the raw scan, cheap
relative to association, and replicating it avoids a scatter/gather round
trip for the masks.

With ``n_map == 1`` this reduces to ``models.bpf_odometry.bpf_step`` exactly
(modulo all_gather/top_k fp merge order); tests assert trajectory
equivalence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from pfilter_tpu.config import PipelineConfig
from pfilter_tpu.models import bpf_frontend, bpf_odometry, es_odometry, map_state
from pfilter_tpu.models.bpf_odometry import CHANNELS, BPFDiag, BPFState, _leaf
from pfilter_tpu.ops import gauss_newton as gn
from pfilter_tpu.ops import pose_graph, se3, voxel
from pfilter_tpu.parallel import es_sharded
from pfilter_tpu.parallel.es_sharded import (
    MAP_AXIS,
    _local_capacity,
    _sharded_associate,
    _sharded_associate_static,
    _sharded_merge,
    _sharded_regate,
    _sharded_weights,
    _sharded_weights_static,
    _squeeze0,
    _unsqueeze0,
    _use_tiled,
)


def state_specs(cfg: PipelineConfig = None):
    tiled = cfg is not None and _use_tiled(cfg)
    mspec = es_sharded.tiled_map_specs() if tiled else es_sharded.grid_map_specs()
    pose = se3.Pose(q=P("seq", None), t=P("seq", None))
    return BPFState(
        beam_map=mspec,
        pillar_map=mspec,
        facade_map=mspec,
        pose=pose,
        last_pose=pose,
        opt_count=P("seq"),
        pg_q=P("seq", None, None),
        pg_t=P("seq", None, None),
        pg_h=P("seq", None, None, None),
        pg_valid=P("seq", None),
    )


def _squeeze_state(state: BPFState, tiled: bool) -> BPFState:
    if not tiled:
        return _squeeze0(state)
    sq_map = lambda m: jax.tree.map(lambda x: x[0, 0], m)
    return BPFState(
        beam_map=sq_map(state.beam_map),
        pillar_map=sq_map(state.pillar_map),
        facade_map=sq_map(state.facade_map),
        pose=_squeeze0(state.pose),
        last_pose=_squeeze0(state.last_pose),
        opt_count=state.opt_count[0],
        pg_q=state.pg_q[0],
        pg_t=state.pg_t[0],
        pg_h=state.pg_h[0],
        pg_valid=state.pg_valid[0],
    )


def _unsqueeze_state(state: BPFState, tiled: bool) -> BPFState:
    if not tiled:
        return _unsqueeze0(state)
    un_map = lambda m: jax.tree.map(lambda x: x[None, None], m)
    return BPFState(
        beam_map=un_map(state.beam_map),
        pillar_map=un_map(state.pillar_map),
        facade_map=un_map(state.facade_map),
        pose=_unsqueeze0(state.pose),
        last_pose=_unsqueeze0(state.last_pose),
        opt_count=state.opt_count[None],
        pg_q=state.pg_q[None],
        pg_t=state.pg_t[None],
        pg_h=state.pg_h[None],
        pg_valid=state.pg_valid[None],
    )


def _grids_of(state: BPFState) -> dict:
    return {"beam": state.beam_map, "pillar": state.pillar_map, "facade": state.facade_map}


def _factor_kind(kind: str) -> str:
    return "edge" if map_state.is_line_kind(kind) else "surf"


def _gn_inner(cfg, pose_l, factors):
    """inner_gn_iters Gauss-Newton steps on psum-reduced normal equations.
    ``factors`` is a list of (points, geom_a, geom_b, weight, valid, kind)."""
    o = cfg.odometry

    def inner(_, carry_i):
        pose, _ = carry_i
        h = jnp.zeros((6, 6), jnp.float32)
        b = jnp.zeros(6, jnp.float32)
        for pts, ga, gb, w, v, kind in factors:
            if _factor_kind(kind) == "edge":
                r, j = gn.edge_residual_jacobian(pose, pts, ga, gb)
            else:
                r, j = gn.surf_residual_jacobian(pose, pts, ga, gb[:, 0])
            rw, jw = r * w, j * w[:, None]
            irls = gn.huber_irls_weight(rw, o.huber_delta)
            hi, bi = gn.normal_equations(rw, jw, irls, v)
            h, b = h + hi, b + bi
        h = lax.psum(h, MAP_AXIS)
        b = lax.psum(b, MAP_AXIS)
        delta = gn.solve_step(h, b, o.gn_damping)
        return (se3.pose_update_left(delta, pose), h)

    return lax.fori_loop(
        0, o.inner_gn_iters, inner, (pose_l, jnp.zeros((6, 6), jnp.float32))
    )


def _outer_assoc_once(cfg, opt_eff, pose0, center, grids, ds, bounds, n_map):
    """Hoisted-association collective outer loop over the three channels
    (the sharded twin of bpf_odometry._bpf_outer_assoc_once)."""
    o = cfg.odometry
    k = cfg.capacity.knn_k

    st = {
        kind: _sharded_associate_static(
            kind, grids[kind], grids[kind].rg, pose0, center,
            ds[kind].xyz, ds[kind].valid, ds[kind].rg, cfg, n_map,
            qsort_bounds=bounds[kind],
        )
        for kind in CHANNELS
    }

    def outer_body(carry):
        q, t_l, _, m0s, _, _, it = carry
        pose_l = se3.Pose(q=q, t=t_l)
        gate_sq = jnp.where(it == 0, o.nn_gate_wide_sq, o.nn_gate_sq)
        matches, vcs, new_m0s = [], [], []
        for i, kind in enumerate(CHANNELS):
            m, vc = _sharded_regate(st[kind], pose_l, gate_sq)
            matches.append(m)
            vcs.append(vc)
            new_m0s.append(jnp.where(it == 0, m, m0s[i]))

        factors = [
            (
                st[kind].points,
                st[kind].geom_a,
                st[kind].geom_b,
                _sharded_weights_static(st[kind], vcs[i], o.weight_type),
                vcs[i],
                kind,
            )
            for i, kind in enumerate(CHANNELS)
        ]
        pose_l, h = _gn_inner(cfg, pose_l, factors)
        return (pose_l.q, pose_l.t, h, tuple(new_m0s), tuple(matches), tuple(vcs), it + 1)

    zeros = tuple(jnp.zeros(st[kind].points.shape[0], bool) for kind in CHANNELS)
    init = (
        pose0.q, pose0.t, jnp.zeros((6, 6), jnp.float32),
        zeros, zeros, zeros, jnp.asarray(0, jnp.int32),
    )
    q, t_l, h_fin, m0s, matches, vcs, _ = lax.while_loop(
        lambda c: c[-1] < opt_eff, outer_body, init
    )

    me = lax.axis_index(MAP_AXIS)
    scale_rest = jnp.maximum(opt_eff - 1, 0).astype(jnp.float32)
    rgs, scan_rgs, counts = [], [], []
    for i, kind in enumerate(CHANNELS):
        wgt = m0s[i].astype(jnp.float32) + scale_rest * matches[i].astype(jnp.float32)
        a_shard, a_lidx, a_w = lax.all_gather(
            (st[kind].shard5, st[kind].lidx5,
             jnp.broadcast_to(wgt[:, None], wgt.shape + (k,))),
            MAP_AXIS,
        )
        inc_here = jnp.where(a_shard == me, a_w, 0.0).reshape(-1)
        g_new = grids[kind].rg[:, 1].at[a_lidx.reshape(-1)].add(inc_here, mode="drop")
        rgs.append(grids[kind].rg.at[:, 1].set(jnp.minimum(o.counter_cap, g_new)))

        new_rg = jnp.stack(
            [
                jnp.minimum(o.counter_cap, jnp.floor(st[kind].round_)),
                jnp.minimum(o.counter_cap, jnp.floor(st[kind].observe)),
            ],
            -1,
        )
        vc_union = (m0s[i] & st[kind].pers_ok) | vcs[i]
        slice_rg = jnp.where(vc_union[:, None], new_rg, st[kind].prg_s)
        scan_rgs.append(lax.all_gather(slice_rg, MAP_AXIS).reshape(-1, 2))
        counts.append(lax.psum(vcs[i].sum(), MAP_AXIS))
    return q, t_l, h_fin, tuple(rgs), tuple(scan_rgs), jnp.stack(counts)


def _outer_per_iter(cfg, opt_eff, pose0, center, grids, ds, bounds, n_map):
    """Reference-faithful collective outer loop: full re-association every
    iteration over all three channels."""
    o = cfg.odometry

    def outer_body(carry):
        q, t_l, _, rgs, scan_rgs, _, it = carry
        pose_l = se3.Pose(q=q, t=t_l)
        gate_sq = jnp.where(it == 0, o.nn_gate_wide_sq, o.nn_gate_sq)
        assocs = {}
        new_rgs, new_scan_rgs = [], []
        for i, kind in enumerate(CHANNELS):
            a = _sharded_associate(
                kind, grids[kind], rgs[i], pose_l, center,
                ds[kind].xyz, ds[kind].valid, scan_rgs[i], cfg, n_map,
                qsort_bounds=bounds[kind], gate_sq=gate_sq,
            )
            assocs[kind] = a
            new_rgs.append(rgs[i].at[:, 1].set(a.map_g_new))
            new_scan_rgs.append(a.scan_rg_full)

        factors = [
            (
                assocs[kind].points,
                assocs[kind].geom_a,
                assocs[kind].geom_b,
                _sharded_weights(assocs[kind], o.weight_type),
                assocs[kind].valid,
                kind,
            )
            for kind in CHANNELS
        ]
        pose_l, h = _gn_inner(cfg, pose_l, factors)
        counts = jnp.stack(
            [lax.psum(assocs[kind].valid.sum(), MAP_AXIS) for kind in CHANNELS]
        )
        return (pose_l.q, pose_l.t, h, tuple(new_rgs), tuple(new_scan_rgs), counts, it + 1)

    init = (
        pose0.q,
        pose0.t,
        jnp.zeros((6, 6), jnp.float32),
        tuple(grids[kind].rg for kind in CHANNELS),
        tuple(ds[kind].rg for kind in CHANNELS),
        jnp.zeros(3, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    q, t_l, h_fin, rgs, scan_rgs, counts, _ = lax.while_loop(
        lambda c: c[-1] < opt_eff, outer_body, init
    )
    return q, t_l, h_fin, rgs, scan_rgs, counts


def _first_frame_block(state: BPFState, xyz, masks, cfg, n_map):
    """Sharded initMapWithPoints over three channels: the (replicated) seed
    cloud is rgbds-voxelized exactly as in bpf_odometry.first_frame, then
    each shard adopts its hash-owned voxel centroids — an exact partition of
    the single-chip seed map (ref: src/odomEstimationClass.cpp:689-695)."""
    me = lax.axis_index(MAP_AXIS)
    new_maps = {}
    seed_over = []
    for kind in CHANNELS:
        leaf = _leaf(cfg, kind)
        cap_local = _local_capacity(cfg, kind, n_map)
        comp_cap = (
            cfg.capacity.edge_points
            if map_state.is_line_kind(kind)
            else (cfg.capacity.bpf_plane_points or cfg.capacity.surf_points)
        )
        cxyz, cvalid = es_odometry._compact(xyz, masks[kind], comp_cap)
        seed = voxel.voxel_downsample_rgbds(
            voxel.PointSet(cxyz, jnp.zeros((comp_cap, 2), jnp.float32), cvalid),
            leaf,
            map_state.map_capacity(cfg, kind),
        )
        own = (voxel.spatial_hash(seed.xyz, leaf) % n_map) == me
        # First-frame overflow (ADVICE r4): a hash-skewed seed scan can exceed
        # one shard's capacity slice and _compact silently truncates — count
        # the excess so the loud-overflow invariant covers frame 1 too.
        seed_over.append(
            lax.psum(
                jnp.maximum((seed.valid & own).sum() - cap_local, 0), MAP_AXIS
            ).astype(jnp.int32)
        )
        oxyz, ovalid = es_odometry._compact(seed.xyz, seed.valid & own, cap_local)
        rg = jnp.zeros((cap_local, 2), jnp.float32)
        new_maps[kind] = map_state.build_index(oxyz, rg, ovalid, state.pose.t, cfg, kind)
    state = state._replace(
        beam_map=new_maps["beam"],
        pillar_map=new_maps["pillar"],
        facade_map=new_maps["facade"],
        opt_count=jnp.asarray(cfg.odometry.max_outer_iters, jnp.int32),
    )
    return state, jnp.stack(seed_over)


def _bpf_step_block(state: BPFState, xyz, masks, cfg: PipelineConfig, n_map: int):
    """One sharded BPF odometry frame — the collective twin of
    models.bpf_odometry.bpf_step."""
    o, cap = cfg.odometry, cfg.capacity
    tiled = _use_tiled(cfg)

    opt_count = jnp.maximum(o.min_outer_iters, state.opt_count - 1)
    pred = se3.constant_velocity_predict(state.pose, state.last_pose)
    last_pose = state.pose

    grids = _grids_of(state)
    ds, over_compact, over_ds = {}, {}, {}
    for kind in CHANNELS:
        line = map_state.is_line_kind(kind)
        comp_cap = cap.edge_points if line else (cap.bpf_plane_points or cap.surf_points)
        ds_cap = cap.ds_edge_points if line else cap.ds_surf_points
        cxyz, cvalid = es_odometry._compact(xyz, masks[kind], comp_cap)
        over_compact[kind] = jnp.maximum(masks[kind].sum() - comp_cap, 0)
        ds[kind], over_ds[kind] = voxel.voxel_downsample_rgbds_counted(
            voxel.PointSet(cxyz, jnp.zeros((comp_cap, 2), jnp.float32), cvalid),
            _leaf(cfg, kind),
            ds_cap,
        )

    center = pred.t
    pose0 = se3.Pose(q=pred.q, t=jnp.zeros(3, jnp.float32))

    bounds = {kind: None for kind in CHANNELS}
    if tiled:
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

    # Map-size gate (ref: :722 — beam>10 && pillar>10 && facade>50), counts
    # psum'd over the partitioned maps.
    counts_map = {
        kind: lax.psum(grids[kind].valid.sum(), MAP_AXIS) for kind in CHANNELS
    }
    enough = (
        (counts_map["beam"] > 10)
        & (counts_map["pillar"] > 10)
        & (counts_map["facade"] > 50)
    )
    opt_eff = jnp.where(enough, opt_count, 0)

    outer = _outer_assoc_once if o.assoc_once else _outer_per_iter
    q, t_l, h_fin, rgs, scan_rgs, counts = outer(
        cfg, opt_eff, pose0, center, grids, ds, bounds, n_map
    )
    pose = se3.Pose(q=q, t=t_l + center)

    # Device-side corrupt-frame guard — replicated arithmetic (psum'd normal
    # equations), identical on every shard.
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

    pgc = cfg.pose_graph
    h_anchor = jnp.where(dropped, 1e-3 * jnp.eye(6, dtype=jnp.float32), h_fin)
    pg_q, pg_t, pg_h, pg_valid = pose_graph.push_window(
        state.pg_q, state.pg_t, state.pg_h, state.pg_valid, pose.q, pose.t, h_anchor
    )
    if pgc.enabled:
        pose = pose_graph.smoothed_newest(pg_q, pg_t, pg_h, pg_valid, pose, pgc)

    new_maps, over_rows = {}, []
    for i, kind in enumerate(CHANNELS):
        world = se3.transform_points(pose, ds[kind].xyz)
        new_maps[kind], over_merge = _sharded_merge(
            grids[kind]._replace(rg=rgs[i]),
            world,
            scan_rgs[i],
            ds[kind].valid,
            pose.t,
            _leaf(cfg, kind),
            cfg,
            kind,
            n_map,
        )
        over_rows.append(
            jnp.stack(
                [
                    over_compact[kind],
                    over_ds[kind],
                    lax.psum(over_merge, MAP_AXIS),
                    lax.psum(
                        map_state.tile_overflow_count(new_maps[kind], cfg, kind),
                        MAP_AXIS,
                    ),
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
        map_sizes=jnp.stack(
            [lax.psum(new_maps[k].valid.sum(), MAP_AXIS) for k in CHANNELS]
        ),
        dropped=dropped,
        overflow=jnp.stack(over_rows).astype(jnp.int32),
    )
    return new_state, diag


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def init_sharded_state(cfg: PipelineConfig, n_seq: int, n_map: int = 1) -> BPFState:
    """Batched empty BPF state (leading seq dim; tiled maps get an explicit
    [n_seq, n_map] prefix at capacity // n_map each)."""
    base = bpf_odometry.init_state(cfg)
    if not _use_tiled(cfg):
        return es_sharded.stack_states([bpf_odometry.init_state(cfg) for _ in range(n_seq)])

    def empty_local(kind):
        cap_local = _local_capacity(cfg, kind, n_map)
        zeros = jnp.zeros((cap_local, 3), jnp.float32)
        zrg = jnp.zeros((cap_local, 2), jnp.float32)
        invalid = jnp.zeros(cap_local, bool)
        one = map_state.build_index(zeros, zrg, invalid, jnp.zeros(3, jnp.float32), cfg, kind)
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (n_seq, n_map) + x.shape), one)

    pose_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_seq,) + x.shape), base.pose)
    return BPFState(
        beam_map=empty_local("beam"),
        pillar_map=empty_local("pillar"),
        facade_map=empty_local("facade"),
        pose=pose_b,
        last_pose=pose_b,
        opt_count=jnp.broadcast_to(base.opt_count, (n_seq,)),
        pg_q=jnp.broadcast_to(base.pg_q, (n_seq,) + base.pg_q.shape),
        pg_t=jnp.broadcast_to(base.pg_t, (n_seq,) + base.pg_t.shape),
        pg_h=jnp.broadcast_to(base.pg_h, (n_seq,) + base.pg_h.shape),
        pg_valid=jnp.broadcast_to(base.pg_valid, (n_seq,) + base.pg_valid.shape),
    )


def make_sharded_step(cfg: PipelineConfig, mesh, first: bool = False):
    """Jitted sharded BPF frame over ``mesh`` (axes seq, map).  Inputs: state
    (from init_sharded_state), raw scan xyz [n_seq, N, 3], mask [n_seq, N].
    The frontend (ground seg -> DCVC -> PCA classify) runs replicated inside
    each map group."""
    n_map = mesh.shape[MAP_AXIS]
    tiled = _use_tiled(cfg)

    def block_fn(state_b, xyz_b, mask_b):
        state = _squeeze_state(state_b, tiled)
        xyz, mask = xyz_b[0], mask_b[0]
        fr = bpf_frontend.run_frontend(xyz, mask, cfg)
        masks = {"beam": fr.beam_mask, "pillar": fr.pillar_mask, "facade": fr.facade_mask}
        if first:
            new_state, seed_over = _first_frame_block(state, xyz, masks, cfg, n_map)
            # Seed truncation reported in the merge lane (column 2) of the
            # per-channel overflow rows — frame 1's version of map overflow.
            overflow0 = jnp.zeros((3, 4), jnp.int32).at[:, 2].set(seed_over)
            diag = BPFDiag(
                n_corr=jnp.zeros(3, jnp.int32),
                map_sizes=jnp.stack(
                    [
                        lax.psum(m.valid.sum(), MAP_AXIS)
                        for m in _grids_of(new_state).values()
                    ]
                ),
                dropped=jnp.asarray(False),
                overflow=overflow0,
            )
        else:
            new_state, diag = _bpf_step_block(state, xyz, masks, cfg, n_map)
        return _unsqueeze_state(new_state, tiled), _unsqueeze0(diag)

    diag_specs = BPFDiag(
        n_corr=P("seq", None),
        map_sizes=P("seq", None),
        dropped=P("seq"),
        overflow=P("seq", None, None),
    )
    sharded = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(state_specs(cfg), P("seq", None, None), P("seq", None)),
        out_specs=(state_specs(cfg), diag_specs),
        check_vma=False,
    )
    return jax.jit(sharded)
