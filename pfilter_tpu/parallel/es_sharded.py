"""Sharded ES odometry: the map partitioned into voxel blocks across a device
mesh, with collective kNN merge and psum-reduced Gauss-Newton.

This is the distributed re-design demanded by BASELINE.json's north star: the
reference's single-process registration (one KD-tree + one growing cloud per
feature type, src/odomEstimationClass.cpp:182-647) becomes

- **map axis**: each device owns the map points whose (absolute) voxel hash
  lands on it.  kNN runs shard-locally, the per-shard top-5 candidates are
  ``all_gather``-ed over ICI and merged exactly; scan queries are then sliced
  across shards, each shard builds its slice's factors, and the 6x6 normal
  equations are ``psum``-reduced — the distributed Schur/normal-equation
  pattern.  Persistence ``g``-increments are routed back to owner shards via
  the same all_gather.  Map maintenance (crop/rgbds/evict/age) is fully local
  because voxel boundaries are absolute (a voxel's centroid stays in its
  voxel, so ownership is stable).
- **seq axis**: concurrent sequences (KITTI 00+02+08-style batching,
  BASELINE.json configs) run in lockstep, one per mesh row, with no
  cross-sequence communication.

With ``n_map == 1`` this reduces to the single-chip pipeline exactly (modulo
fp reduction order); tests assert trajectory equivalence.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from pfilter_tpu.config import PipelineConfig
from pfilter_tpu.models import es_odometry
from pfilter_tpu.ops import features as fops
from pfilter_tpu.ops import gauss_newton as gn
from pfilter_tpu.ops import knn, se3, voxel

MAP_AXIS = "map"


# ---------------------------------------------------------------------------
# Partition specs for the (seq-stacked) ESState pytree
# ---------------------------------------------------------------------------


def grid_specs():
    return knn.HashGrid(
        xyz=P("seq", MAP_AXIS, None),
        rg=P("seq", MAP_AXIS, None),
        valid=P("seq", MAP_AXIS),
        cell_ids=P("seq", MAP_AXIS),
        origin=P("seq", None),
        cell_size=P("seq"),
    )


def state_specs():
    pose = se3.Pose(q=P("seq", None), t=P("seq", None))
    return es_odometry.ESState(
        edge_map=grid_specs(),
        surf_map=grid_specs(),
        pose=pose,
        last_pose=pose,
        opt_count=P("seq"),
    )


def stack_states(states):
    """Stack per-sequence ESStates into one batched pytree (leading seq dim)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


# ---------------------------------------------------------------------------
# Shard-local helpers (run inside shard_map; arrays carry no seq dim)
# ---------------------------------------------------------------------------


def _squeeze0(tree):
    return jax.tree.map(lambda x: x[0], tree)


def _unsqueeze0(tree):
    return jax.tree.map(lambda x: x[None], tree)


class _ShardAssoc(NamedTuple):
    points: jnp.ndarray  # [Qs,3] scan points (sensor frame), my query slice
    geom_a: jnp.ndarray  # [Qs,3]
    geom_b: jnp.ndarray  # [Qs,3]
    valid: jnp.ndarray  # [Qs]
    weight_obs: jnp.ndarray  # [Qs]
    weight_spr: jnp.ndarray  # [Qs]
    scan_rg_full: jnp.ndarray  # [Q,2] — all-gathered writebacks
    map_g_new: jnp.ndarray  # [CAP_local] updated g column


def _sharded_associate(
    kind, grid, map_rg, pose_l, center, scan_xyz, scan_valid, scan_rg, cfg, n_map
):
    o, c = cfg.odometry, cfg.capacity
    k = c.knn_k
    q = scan_xyz.shape[0]
    qs = q // n_map
    me = lax.axis_index(MAP_AXIS)

    # 1. shard-local 5-NN over the full query set
    q_world = se3.transform_points(pose_l, scan_xyz) + center
    res = knn.knn_query(grid, q_world, scan_valid, k, c.knn_candidates_per_cell)
    nxyz = grid.xyz[res.idx]  # [Q,5,3]
    nrg = map_rg[res.idx]  # [Q,5,2]

    # 2. exact global 5-NN: all_gather shard candidates, merge by distance
    g_sq, g_xyz, g_rg, g_idx = lax.all_gather(
        (res.sqdist, nxyz, nrg, res.idx), MAP_AXIS
    )  # leading axis n_map
    comb_sq = jnp.moveaxis(g_sq, 0, 1).reshape(q, n_map * k)
    comb_xyz = jnp.moveaxis(g_xyz, 0, 1).reshape(q, n_map * k, 3)
    comb_rg = jnp.moveaxis(g_rg, 0, 1).reshape(q, n_map * k, 2)
    comb_idx = jnp.moveaxis(g_idx, 0, 1).reshape(q, n_map * k)

    neg, sel = lax.top_k(-comb_sq, k)  # [Q,k]
    sq5 = -neg
    xyz5 = jnp.take_along_axis(comb_xyz, sel[..., None], 1)
    rg5 = jnp.take_along_axis(comb_rg, sel[..., None], 1)
    lidx5 = jnp.take_along_axis(comb_idx, sel, 1)
    shard5 = sel // k  # provenance: which shard owns each merged neighbor

    # 3. slice queries across shards — each shard builds its own factors
    def sl(a):
        return lax.dynamic_slice_in_dim(a, me * qs, qs, 0)

    sq5_s, xyz5_s, rg5_s, lidx5_s, shard5_s = map(sl, (sq5, xyz5, rg5, lidx5, shard5))
    pts_s, pvalid_s, prg_s = sl(scan_xyz), sl(scan_valid), sl(scan_rg)

    gate = sq5_s[:, k - 1] < o.nn_gate_sq
    neigh = xyz5_s - center
    if kind == "edge":
        pa, pb, fit_ok = gn.fit_lines(neigh, o.line_eig_ratio, o.line_half_length)
        geom_a, geom_b = pa, pb
    else:
        normal, d, fit_ok = gn.fit_planes(neigh, o.plane_fit_tol)
        geom_a = normal
        geom_b = jnp.stack([d, jnp.zeros_like(d), jnp.zeros_like(d)], -1)
    matched = pvalid_s & gate & fit_ok

    observe = jnp.mean(rg5_s[..., 1], axis=1) + 1.0
    round_ = jnp.mean(rg5_s[..., 0], axis=1)

    # 4. route g increments back to owner shards
    a_shard, a_lidx, a_inc = lax.all_gather(
        (shard5_s, lidx5_s, jnp.broadcast_to(matched[:, None], (qs, k))), MAP_AXIS
    )  # [n, Qs, 5]
    inc_here = jnp.where(a_shard == me, a_inc.astype(jnp.float32), 0.0).reshape(-1)
    g_new = map_rg[:, 1].at[a_lidx.reshape(-1)].add(inc_here, mode="drop")
    g_new = jnp.minimum(o.counter_cap, g_new)

    observe = jnp.where(observe > o.observe_saturate_ratio * round_, o.counter_cap, observe)
    gated_out = (observe < round_ * o.theta_p) & (round_ > o.k_new) & (observe < o.theta_max)
    valid_corr = matched & ~gated_out

    new_rg_s = jnp.where(
        valid_corr[:, None],
        jnp.stack(
            [
                jnp.minimum(o.counter_cap, jnp.floor(round_)),
                jnp.minimum(o.counter_cap, jnp.floor(observe)),
            ],
            -1,
        ),
        prg_s,
    )
    scan_rg_full = lax.all_gather(new_rg_s, MAP_AXIS).reshape(q, 2)

    nc = jnp.mean(neigh, axis=1, keepdims=True)
    sparsity = jnp.mean(jnp.linalg.norm(neigh - nc, axis=-1), axis=1)

    return _ShardAssoc(
        points=pts_s,
        geom_a=geom_a,
        geom_b=geom_b,
        valid=valid_corr,
        weight_obs=observe,
        weight_spr=sparsity,
        scan_rg_full=scan_rg_full,
        map_g_new=g_new,
    )


def _sharded_weights(assoc: _ShardAssoc, weight_type: int):
    """Weight normalization with cross-shard min/max (pmin/pmax over ICI)."""
    if weight_type == 0:
        return jnp.ones_like(assoc.weight_obs)

    def norm(values, floor):
        vmin, vmax = gn.masked_minmax(values, assoc.valid)
        vmin = lax.pmin(vmin, MAP_AXIS)
        vmax = lax.pmax(vmax, MAP_AXIS)
        return gn.fold_normalize(values, vmin, vmax, floor)

    w_obs = norm(assoc.weight_obs, 0.1)
    w_spr = norm(assoc.weight_spr, 0.0)
    if weight_type == 1:
        return w_obs
    if weight_type == 2:
        return w_spr
    if weight_type == 12:
        return 0.5 * (w_obs + w_spr)
    raise ValueError(weight_type)


def _sharded_merge(grid, scan_world, scan_rg, scan_valid, pose_t, leaf, o, cap_local, cell, n_map):
    """Per-shard map merge: adopt owned scan points, then local
    crop -> rgbds (absolute anchor) -> evict -> age -> re-sort."""
    me = lax.axis_index(MAP_AXIS)
    own = (voxel.spatial_hash(scan_world, leaf) % n_map) == me
    combined = voxel.concat_pointsets(
        voxel.PointSet(grid.xyz, grid.rg, grid.valid),
        voxel.PointSet(scan_world, scan_rg, scan_valid & own),
    )
    combined = voxel.crop_box(combined, pose_t, o.crop_half_extent)
    ds = voxel.voxel_downsample_rgbds(combined, leaf, out_cap=cap_local, anchor_t=pose_t)
    ds = voxel.evict_unstable(ds, o.k_new, o.theta_p, o.theta_max)
    ds = voxel.age_points(ds, o.aging_increment, o.counter_cap)
    origin = knn.grid_origin_for_pose(pose_t, cell)
    return knn.build_grid(ds.xyz, ds.rg, ds.valid, origin, cell)


def _first_frame_block(state, feat, cfg: PipelineConfig, n_map: int):
    """Sharded initMapWithPoints: each shard adopts its hash-owned features."""
    cap = cfg.capacity
    o = cfg.odometry
    cell = cap.knn_cell_size
    me = lax.axis_index(MAP_AXIS)

    def seed(mask, leaf, cap_local):
        own = (voxel.spatial_hash(feat.xyz, leaf) % n_map) == me
        xyz, valid = es_odometry._compact(feat.xyz, mask & own, cap_local)
        rg = jnp.zeros((cap_local, 2), jnp.float32)
        origin = knn.grid_origin_for_pose(state.pose.t, cell)
        return knn.build_grid(xyz, rg, valid, origin, cell)

    return state._replace(
        edge_map=seed(feat.edge_mask, o.map_resolution, cap.edge_map_points // n_map),
        surf_map=seed(feat.surf_mask, o.map_resolution * 2.0, cap.surf_map_points // n_map),
        opt_count=jnp.asarray(cfg.odometry.max_outer_iters, jnp.int32),
    )


def _es_step_block(state, feat, cfg: PipelineConfig, n_map: int):
    """One sharded odometry frame — the distributed twin of
    models.es_odometry.es_step (same structure, collective association)."""
    o, cap = cfg.odometry, cfg.capacity

    opt_count = jnp.maximum(o.min_outer_iters, state.opt_count - 1)
    pred = se3.constant_velocity_predict(state.pose, state.last_pose)
    last_pose = state.pose

    e_xyz, e_valid = es_odometry._compact(feat.xyz, feat.edge_mask, cap.edge_points)
    s_xyz, s_valid = es_odometry._compact(feat.xyz, feat.surf_mask, cap.surf_points)
    ds_edge = voxel.voxel_downsample_rgbds(
        voxel.PointSet(e_xyz, jnp.zeros((cap.edge_points, 2), jnp.float32), e_valid),
        o.map_resolution,
        cap.ds_edge_points,
    )
    ds_surf = voxel.voxel_downsample_rgbds(
        voxel.PointSet(s_xyz, jnp.zeros((cap.surf_points, 2), jnp.float32), s_valid),
        o.map_resolution * 2.0,
        cap.ds_surf_points,
    )

    center = pred.t
    pose0 = se3.Pose(q=pred.q, t=jnp.zeros(3, jnp.float32))

    edge_grid, surf_grid = state.edge_map, state.surf_map
    edge_count = lax.psum(edge_grid.valid.sum(), MAP_AXIS)
    surf_count = lax.psum(surf_grid.valid.sum(), MAP_AXIS)
    enough = (edge_count > 10) & (surf_count > 50)
    opt_eff = jnp.where(enough, opt_count, 0)

    def outer_body(carry):
        q, t_l, e_rg, s_rg, se_rg, ss_rg, _, _, it = carry
        pose_l = se3.Pose(q=q, t=t_l)

        ea = _sharded_associate(
            "edge", edge_grid, e_rg, pose_l, center, ds_edge.xyz, ds_edge.valid, se_rg, cfg, n_map
        )
        sa = _sharded_associate(
            "surf", surf_grid, s_rg, pose_l, center, ds_surf.xyz, ds_surf.valid, ss_rg, cfg, n_map
        )
        e_rg = e_rg.at[:, 1].set(ea.map_g_new)
        s_rg = s_rg.at[:, 1].set(sa.map_g_new)

        ew = _sharded_weights(ea, o.weight_type)
        sw = _sharded_weights(sa, o.weight_type)

        def inner(_, pose):
            re, je = gn.edge_residual_jacobian(pose, ea.points, ea.geom_a, ea.geom_b)
            rs, js = gn.surf_residual_jacobian(pose, sa.points, sa.geom_a, sa.geom_b[:, 0])
            h = jnp.zeros((6, 6), jnp.float32)
            b = jnp.zeros(6, jnp.float32)
            for r, j, w, v in ((re, je, ew, ea.valid), (rs, js, sw, sa.valid)):
                rw, jw = r * w, j * w[:, None]
                irls = gn.huber_irls_weight(rw, o.huber_delta)
                hi, bi = gn.normal_equations(rw, jw, irls, v)
                h, b = h + hi, b + bi
            h = lax.psum(h, MAP_AXIS)
            b = lax.psum(b, MAP_AXIS)
            delta = gn.solve_step(h, b, o.gn_damping)
            return se3.pose_update_left(delta, pose)

        pose_l = lax.fori_loop(0, o.inner_gn_iters, inner, pose_l)
        ne = lax.psum(ea.valid.sum(), MAP_AXIS)
        ns = lax.psum(sa.valid.sum(), MAP_AXIS)
        return (pose_l.q, pose_l.t, e_rg, s_rg, ea.scan_rg_full, sa.scan_rg_full, ne, ns, it + 1)

    init = (
        pose0.q,
        pose0.t,
        edge_grid.rg,
        surf_grid.rg,
        ds_edge.rg,
        ds_surf.rg,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    q, t_l, e_rg, s_rg, se_rg, ss_rg, ne, ns, _ = lax.while_loop(
        lambda c: c[-1] < opt_eff, outer_body, init
    )
    pose = se3.Pose(q=q, t=t_l + center)

    # Device-side corrupt-frame guard — identical to the single-chip step
    # (see es_odometry.es_step): every shard computes the same pose (psum'd
    # normal equations), so the rollback decision is replicated and needs no
    # extra collective.
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

    edge_world = se3.transform_points(pose, ds_edge.xyz)
    surf_world = se3.transform_points(pose, ds_surf.xyz)
    new_edge = _sharded_merge(
        edge_grid._replace(rg=e_rg), edge_world, se_rg, ds_edge.valid,
        pose.t, o.map_resolution, o, cap.edge_map_points // n_map, cap.knn_cell_size, n_map,
    )
    new_surf = _sharded_merge(
        surf_grid._replace(rg=s_rg), surf_world, ss_rg, ds_surf.valid,
        pose.t, o.map_resolution * 2.0, o, cap.surf_map_points // n_map, cap.knn_cell_size, n_map,
    )

    new_state = es_odometry.ESState(
        edge_map=new_edge,
        surf_map=new_surf,
        pose=pose,
        last_pose=last_pose,
        opt_count=opt_count,
    )
    diag = es_odometry.FrameDiag(
        n_edge_corr=ne,
        n_surf_corr=ns,
        edge_map_size=lax.psum(new_edge.valid.sum(), MAP_AXIS),
        surf_map_size=lax.psum(new_surf.valid.sum(), MAP_AXIS),
        dropped=dropped,
    )
    return new_state, diag


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _force_grid_impl(cfg: PipelineConfig) -> PipelineConfig:
    """The sharded path uses the XLA voxel-grid index (shard-local searchsorted);
    the Pallas tiled kernel is single-chip for now."""
    import dataclasses

    if cfg.capacity.knn_impl == "grid":
        return cfg
    return cfg.replace(capacity=dataclasses.replace(cfg.capacity, knn_impl="grid"))


def init_sharded_state(cfg: PipelineConfig, n_seq: int) -> es_odometry.ESState:
    """Batched empty state (leading seq dim).  Shard with state_specs()."""
    cfg = _force_grid_impl(cfg)
    states = [es_odometry.init_state(cfg) for _ in range(n_seq)]
    return stack_states(states)


def make_sharded_step(cfg: PipelineConfig, mesh, first: bool = False):
    """Build the jitted sharded frame function over ``mesh`` (axes seq, map).

    Inputs: state (seq-stacked ESState), scan xyz [n_seq, N, 3], mask
    [n_seq, N].  Feature extraction runs replicated inside each map group.
    """
    cfg = _force_grid_impl(cfg)
    n_map = mesh.shape[MAP_AXIS]

    def block_fn(state_b, xyz_b, mask_b):
        state = _squeeze0(state_b)
        xyz, mask = xyz_b[0], mask_b[0]
        feat = fops.extract_features(xyz, mask, cfg.lidar, cfg.features, cfg.capacity)
        if first:
            new_state = _first_frame_block(state, feat, cfg, n_map)
            diag = es_odometry.FrameDiag(
                n_edge_corr=jnp.asarray(0, jnp.int32),
                n_surf_corr=jnp.asarray(0, jnp.int32),
                edge_map_size=lax.psum(new_state.edge_map.valid.sum(), MAP_AXIS),
                surf_map_size=lax.psum(new_state.surf_map.valid.sum(), MAP_AXIS),
                dropped=jnp.asarray(False),
            )
        else:
            new_state, diag = _es_step_block(state, feat, cfg, n_map)
        return _unsqueeze0(new_state), _unsqueeze0(diag)

    diag_specs = es_odometry.FrameDiag(
        n_edge_corr=P("seq"),
        n_surf_corr=P("seq"),
        edge_map_size=P("seq"),
        surf_map_size=P("seq"),
        dropped=P("seq"),
    )
    sharded = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(state_specs(), P("seq", None, None), P("seq", None)),
        out_specs=(state_specs(), diag_specs),
        check_vma=False,
    )
    return jax.jit(sharded)
