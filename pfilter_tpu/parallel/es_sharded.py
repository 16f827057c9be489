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

Two shard-local kNN implementations (cfg.capacity.knn_impl):

- ``"tiled"`` (default): each shard keeps its owned points in a Pallas
  tile-sorted map (ops/knn_tiled) — the same speed-of-light kernel as the
  single-chip path, run per shard with capacity // n_map points.  Queries are
  tile-sorted once per frame (replicated — the sort depends only on the
  predicted pose), so every shard's result rows align for the all_gather
  merge.  Map maintenance uses the fused sort (models/map_state).
- ``"grid"``: XLA searchsorted voxel grid (ops/knn) — no Pallas, useful for
  debugging and platforms without Mosaic.

With ``n_map == 1`` this reduces to the single-chip pipeline exactly (modulo
the fp reduction order of the all_gather/top_k merge); tests assert
trajectory equivalence.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from pfilter_tpu.config import PipelineConfig
from pfilter_tpu.models import es_odometry, map_state
from pfilter_tpu.ops import features as fops
from pfilter_tpu.ops import gauss_newton as gn
from pfilter_tpu.ops import knn, knn_tiled, pose_graph, se3, voxel

MAP_AXIS = "map"


def _use_tiled(cfg: PipelineConfig) -> bool:
    return cfg.capacity.knn_impl == "tiled"


# ---------------------------------------------------------------------------
# Partition specs for the (seq-stacked) ESState pytree
# ---------------------------------------------------------------------------


def grid_map_specs():
    """HashGrid maps: global arrays [n_seq, CAP, ...] split along CAP."""
    return knn.HashGrid(
        xyz=P("seq", MAP_AXIS, None),
        rg=P("seq", MAP_AXIS, None),
        valid=P("seq", MAP_AXIS),
        cell_ids=P("seq", MAP_AXIS),
        origin=P("seq", None),
        cell_size=P("seq"),
    )


def tiled_map_specs():
    """TiledMap maps: every leaf carries an explicit [n_seq, n_map, ...]
    prefix (the per-shard arrays are heterogeneous in meaning — slot ranges,
    transposed pads — so an implicit capacity split cannot express them)."""
    return knn_tiled.TiledMap(
        xyz=P("seq", MAP_AXIS, None, None),
        rg=P("seq", MAP_AXIS, None, None),
        valid=P("seq", MAP_AXIS, None),
        xyz_t=P("seq", MAP_AXIS, None, None),
        tile_start=P("seq", MAP_AXIS, None),
        origin=P("seq", MAP_AXIS, None),
    )


def state_specs(cfg: PipelineConfig = None):
    tiled = cfg is not None and _use_tiled(cfg)
    mspec = tiled_map_specs() if tiled else grid_map_specs()
    pose = se3.Pose(q=P("seq", None), t=P("seq", None))
    return es_odometry.ESState(
        edge_map=mspec,
        surf_map=mspec,
        pose=pose,
        last_pose=pose,
        opt_count=P("seq"),
        pg_q=P("seq", None, None),
        pg_t=P("seq", None, None),
        pg_h=P("seq", None, None, None),
        pg_valid=P("seq", None),
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


def _squeeze_state(state, tiled: bool):
    """Block-local view: drop the seq dim everywhere and the shard dim from
    tiled map leaves (tiled maps arrive as [1, 1, ...] per block)."""
    if not tiled:
        return _squeeze0(state)
    return state._replace(
        edge_map=jax.tree.map(lambda x: x[0, 0], state.edge_map),
        surf_map=jax.tree.map(lambda x: x[0, 0], state.surf_map),
        pose=_squeeze0(state.pose),
        last_pose=_squeeze0(state.last_pose),
        opt_count=state.opt_count[0],
        pg_q=state.pg_q[0],
        pg_t=state.pg_t[0],
        pg_h=state.pg_h[0],
        pg_valid=state.pg_valid[0],
    )


def _unsqueeze_state(state, tiled: bool):
    if not tiled:
        return _unsqueeze0(state)
    return state._replace(
        edge_map=jax.tree.map(lambda x: x[None, None], state.edge_map),
        surf_map=jax.tree.map(lambda x: x[None, None], state.surf_map),
        pose=_unsqueeze0(state.pose),
        last_pose=_unsqueeze0(state.last_pose),
        opt_count=state.opt_count[None],
        pg_q=state.pg_q[None],
        pg_t=state.pg_t[None],
        pg_h=state.pg_h[None],
        pg_valid=state.pg_valid[None],
    )


def _local_capacity(cfg: PipelineConfig, kind: str, n_map: int) -> int:
    return map_state.map_capacity(cfg, kind) // n_map


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
    kind,
    grid,
    map_rg,
    pose_l,
    center,
    scan_xyz,
    scan_valid,
    scan_rg,
    cfg,
    n_map,
    qsort_bounds=None,
    gate_sq=None,
):
    """One collective correspondence pass.  ``scan_xyz`` must already be in
    tile-sorted order when ``qsort_bounds`` is given (tiled impl)."""
    o, c = cfg.odometry, cfg.capacity
    k = c.knn_k
    if gate_sq is None:
        gate_sq = o.nn_gate_sq
    q = scan_xyz.shape[0]
    qs = q // n_map
    me = lax.axis_index(MAP_AXIS)

    # 1. shard-local 5-NN over the full query set
    q_world = se3.transform_points(pose_l, scan_xyz) + center
    if qsort_bounds is not None:
        nn_idx, nn_sq = map_state.query_index_presorted(
            grid, q_world, qsort_bounds, cfg, kind
        )
        nn_sq = jnp.where(scan_valid[:, None], nn_sq, jnp.inf)
    else:
        res = knn.knn_query(grid, q_world, scan_valid, k, c.knn_candidates_per_cell)
        nn_idx, nn_sq = res.idx, res.sqdist
    nxyz = grid.xyz[nn_idx]  # [Q,5,3]
    nrg = map_rg[nn_idx]  # [Q,5,2]

    # 2. exact global 5-NN: all_gather shard candidates, merge by distance
    g_sq, g_xyz, g_rg, g_idx = lax.all_gather(
        (nn_sq, nxyz, nrg, nn_idx), MAP_AXIS
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

    gate = sq5_s[:, k - 1] < gate_sq
    neigh = xyz5_s - center
    if map_state.is_line_kind(kind):
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


class _ShardAssocStatic(NamedTuple):
    """Frame-invariant half of the collective association (assoc_once=True):
    global 5-NN merge + fits + persistence reads at the predicted pose, with
    everything needed to re-gate per iteration and to route g-increments and
    scan writebacks after the loop.  Per-shard query-slice arrays [Qs, ...]."""

    points: jnp.ndarray  # [Qs,3] scan points (sensor frame), my slice
    neigh: jnp.ndarray  # [Qs,5,3] merged neighbors, center-relative
    nn_valid: jnp.ndarray  # [Qs]
    geom_a: jnp.ndarray  # [Qs,3]
    geom_b: jnp.ndarray  # [Qs,3]
    fit_ok: jnp.ndarray  # [Qs]
    pers_ok: jnp.ndarray  # [Qs]
    observe: jnp.ndarray  # [Qs]
    round_: jnp.ndarray  # [Qs]
    sparsity: jnp.ndarray  # [Qs]
    shard5: jnp.ndarray  # [Qs,5] owner shard of each merged neighbor
    lidx5: jnp.ndarray  # [Qs,5] owner-local slot ids
    prg_s: jnp.ndarray  # [Qs,2] incoming scan r/g (writeback fallback)


def _sharded_associate_static(
    kind, grid, map_rg, pose_l, center, scan_xyz, scan_valid, scan_rg, cfg,
    n_map, qsort_bounds=None,
):
    """Collective pose-independent association (the sharded twin of
    es_odometry._associate_static)."""
    o, c = cfg.odometry, cfg.capacity
    k = c.knn_k
    q = scan_xyz.shape[0]
    qs = q // n_map
    me = lax.axis_index(MAP_AXIS)

    q_world = se3.transform_points(pose_l, scan_xyz) + center
    if qsort_bounds is not None:
        nn_idx, nn_sq = map_state.query_index_presorted(
            grid, q_world, qsort_bounds, cfg, kind
        )
        nn_sq = jnp.where(scan_valid[:, None], nn_sq, jnp.inf)
    else:
        res = knn.knn_query(grid, q_world, scan_valid, k, c.knn_candidates_per_cell)
        nn_idx, nn_sq = res.idx, res.sqdist
    nxyz = grid.xyz[nn_idx]
    nrg = map_rg[nn_idx]

    g_sq, g_xyz, g_rg, g_idx = lax.all_gather((nn_sq, nxyz, nrg, nn_idx), MAP_AXIS)
    comb_sq = jnp.moveaxis(g_sq, 0, 1).reshape(q, n_map * k)
    comb_xyz = jnp.moveaxis(g_xyz, 0, 1).reshape(q, n_map * k, 3)
    comb_rg = jnp.moveaxis(g_rg, 0, 1).reshape(q, n_map * k, 2)
    comb_idx = jnp.moveaxis(g_idx, 0, 1).reshape(q, n_map * k)

    neg, sel = lax.top_k(-comb_sq, k)
    sq5 = -neg
    xyz5 = jnp.take_along_axis(comb_xyz, sel[..., None], 1)
    rg5 = jnp.take_along_axis(comb_rg, sel[..., None], 1)
    lidx5 = jnp.take_along_axis(comb_idx, sel, 1)
    shard5 = sel // k

    def sl(a):
        return lax.dynamic_slice_in_dim(a, me * qs, qs, 0)

    sq5_s, xyz5_s, rg5_s, lidx5_s, shard5_s = map(sl, (sq5, xyz5, rg5, lidx5, shard5))
    pts_s, pvalid_s, prg_s = sl(scan_xyz), sl(scan_valid), sl(scan_rg)

    nn_valid = pvalid_s & jnp.isfinite(sq5_s[:, k - 1])
    neigh = xyz5_s - center
    if map_state.is_line_kind(kind):
        pa, pb, fit_ok = gn.fit_lines(neigh, o.line_eig_ratio, o.line_half_length)
        geom_a, geom_b = pa, pb
    else:
        normal, d, fit_ok = gn.fit_planes(neigh, o.plane_fit_tol)
        geom_a = normal
        geom_b = jnp.stack([d, jnp.zeros_like(d), jnp.zeros_like(d)], -1)

    observe = jnp.mean(rg5_s[..., 1], axis=1) + 1.0
    round_ = jnp.mean(rg5_s[..., 0], axis=1)
    observe = jnp.where(observe > o.observe_saturate_ratio * round_, o.counter_cap, observe)
    gated_out = (observe < round_ * o.theta_p) & (round_ > o.k_new) & (observe < o.theta_max)

    nc = jnp.mean(neigh, axis=1, keepdims=True)
    sparsity = jnp.mean(jnp.linalg.norm(neigh - nc, axis=-1), axis=1)

    return _ShardAssocStatic(
        points=pts_s,
        neigh=neigh,
        nn_valid=nn_valid,
        geom_a=geom_a,
        geom_b=geom_b,
        fit_ok=fit_ok,
        pers_ok=~gated_out,
        observe=observe,
        round_=round_,
        sparsity=sparsity,
        shard5=shard5_s,
        lidx5=lidx5_s,
        prg_s=prg_s,
    )


def _sharded_regate(st: _ShardAssocStatic, pose_l, gate_sq):
    q_local = se3.transform_points(pose_l, st.points)
    d5 = jnp.sum((q_local[:, None, :] - st.neigh) ** 2, axis=-1)
    gate = jnp.max(d5, axis=1) < gate_sq
    matched = st.nn_valid & gate & st.fit_ok
    return matched, matched & st.pers_ok


def _sharded_weights_static(st: _ShardAssocStatic, valid, weight_type: int):
    if weight_type == 0:
        return jnp.ones_like(st.observe)

    def norm(values, floor):
        vmin, vmax = gn.masked_minmax(values, valid)
        vmin = lax.pmin(vmin, MAP_AXIS)
        vmax = lax.pmax(vmax, MAP_AXIS)
        return gn.fold_normalize(values, vmin, vmax, floor)

    w_obs = norm(st.observe, 0.1)
    w_spr = norm(st.sparsity, 0.0)
    if weight_type == 1:
        return w_obs
    if weight_type == 2:
        return w_spr
    if weight_type == 12:
        return 0.5 * (w_obs + w_spr)
    raise ValueError(weight_type)


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


def _sharded_merge(
    grid, scan_world, scan_rg, scan_valid, pose_t, leaf, cfg, kind, n_map
):
    """Per-shard map merge: adopt owned scan points, then local
    crop -> rgbds (absolute voxel boundaries) -> evict -> age -> re-sort.
    The fused tiled merge already uses absolute boundaries; the grid path
    anchors the rgbds window at the pose so all shards agree on voxels."""
    o = cfg.odometry
    me = lax.axis_index(MAP_AXIS)
    own = (voxel.spatial_hash(scan_world, leaf) % n_map) == me
    cap_local = _local_capacity(cfg, kind, n_map)
    if _use_tiled(cfg):
        return map_state.merge_scan_into_index(
            grid, scan_world, scan_rg, scan_valid & own, pose_t, leaf, cfg, kind,
            capacity=cap_local,
        )
    cell = cfg.capacity.knn_cell_size
    combined = voxel.concat_pointsets(
        voxel.PointSet(grid.xyz, grid.rg, grid.valid),
        voxel.PointSet(scan_world, scan_rg, scan_valid & own),
    )
    combined = voxel.crop_box(combined, pose_t, o.crop_half_extent)
    ds, n_dropped = voxel.voxel_downsample_rgbds_counted(
        combined, leaf, out_cap=cap_local, anchor_t=pose_t
    )
    ds = voxel.evict_unstable(ds, o.k_new, o.theta_p, o.theta_max)
    ds = voxel.age_points(ds, o.aging_increment, o.counter_cap)
    origin = knn.grid_origin_for_pose(pose_t, cell)
    return knn.build_grid(ds.xyz, ds.rg, ds.valid, origin, cell), n_dropped


def _sharded_outer_per_iter(
    cfg, opt_eff, pose0, center, edge_grid, surf_grid, ds_edge, ds_surf,
    e_bounds, s_bounds, n_map,
):
    """Reference-faithful sharded outer loop: full collective re-association
    every iteration."""
    o = cfg.odometry

    def outer_body(carry):
        q, t_l, _, e_rg, s_rg, se_rg, ss_rg, _, _, it = carry
        pose_l = se3.Pose(q=q, t=t_l)
        # Coarse-to-fine gate schedule — must mirror es_odometry.es_step
        # exactly (n_map=1 equivalence).
        gate_sq = jnp.where(it == 0, o.nn_gate_wide_sq, o.nn_gate_sq)

        ea = _sharded_associate(
            "edge", edge_grid, e_rg, pose_l, center, ds_edge.xyz, ds_edge.valid,
            se_rg, cfg, n_map, qsort_bounds=e_bounds, gate_sq=gate_sq,
        )
        sa = _sharded_associate(
            "surf", surf_grid, s_rg, pose_l, center, ds_surf.xyz, ds_surf.valid,
            ss_rg, cfg, n_map, qsort_bounds=s_bounds, gate_sq=gate_sq,
        )
        e_rg = e_rg.at[:, 1].set(ea.map_g_new)
        s_rg = s_rg.at[:, 1].set(sa.map_g_new)

        ew = _sharded_weights(ea, o.weight_type)
        sw = _sharded_weights(sa, o.weight_type)

        def inner(_, carry_i):
            pose, _ = carry_i
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
            return (se3.pose_update_left(delta, pose), h)

        pose_l, h = lax.fori_loop(
            0, o.inner_gn_iters, inner, (pose_l, jnp.zeros((6, 6), jnp.float32))
        )
        ne = lax.psum(ea.valid.sum(), MAP_AXIS)
        ns = lax.psum(sa.valid.sum(), MAP_AXIS)
        return (pose_l.q, pose_l.t, h, e_rg, s_rg, ea.scan_rg_full, sa.scan_rg_full, ne, ns, it + 1)

    init = (
        pose0.q,
        pose0.t,
        jnp.zeros((6, 6), jnp.float32),
        edge_grid.rg,
        surf_grid.rg,
        ds_edge.rg,
        ds_surf.rg,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    q, t_l, h_fin, e_rg, s_rg, se_rg, ss_rg, ne, ns, _ = lax.while_loop(
        lambda c: c[-1] < opt_eff, outer_body, init
    )
    return q, t_l, e_rg, s_rg, se_rg, ss_rg, ne, ns, h_fin


def _sharded_outer_assoc_once(
    cfg, opt_eff, pose0, center, edge_grid, surf_grid, ds_edge, ds_surf,
    e_bounds, s_bounds, n_map,
):
    """Hoisted-association sharded outer loop (OdometryConfig.assoc_once):
    ONE collective 5-NN merge per feature type per frame; iterations re-gate
    the cached merged neighbors and psum-reduce the GN normal equations.
    Mirrors es_odometry._es_outer_assoc_once so n_map=1 matches single-chip."""
    o = cfg.odometry
    k = cfg.capacity.knn_k

    ea = _sharded_associate_static(
        "edge", edge_grid, edge_grid.rg, pose0, center,
        ds_edge.xyz, ds_edge.valid, ds_edge.rg, cfg, n_map, qsort_bounds=e_bounds,
    )
    sa = _sharded_associate_static(
        "surf", surf_grid, surf_grid.rg, pose0, center,
        ds_surf.xyz, ds_surf.valid, ds_surf.rg, cfg, n_map, qsort_bounds=s_bounds,
    )
    qs_e = ea.points.shape[0]
    qs_s = sa.points.shape[0]

    def outer_body(carry):
        q, t_l, _, e_m0, s_m0, _, _, _, _, it = carry
        pose_l = se3.Pose(q=q, t=t_l)
        gate_sq = jnp.where(it == 0, o.nn_gate_wide_sq, o.nn_gate_sq)
        e_match, e_vc = _sharded_regate(ea, pose_l, gate_sq)
        s_match, s_vc = _sharded_regate(sa, pose_l, gate_sq)
        # First-iteration (wide-gate) match set — see es_odometry: crediting
        # g only on the final narrow set over-evicts.
        e_m0 = jnp.where(it == 0, e_match, e_m0)
        s_m0 = jnp.where(it == 0, s_match, s_m0)

        ew = _sharded_weights_static(ea, e_vc, o.weight_type)
        sw = _sharded_weights_static(sa, s_vc, o.weight_type)

        def inner(_, carry_i):
            pose, _ = carry_i
            re, je = gn.edge_residual_jacobian(pose, ea.points, ea.geom_a, ea.geom_b)
            rs, js = gn.surf_residual_jacobian(pose, sa.points, sa.geom_a, sa.geom_b[:, 0])
            h = jnp.zeros((6, 6), jnp.float32)
            b = jnp.zeros(6, jnp.float32)
            for r, j, w, v in ((re, je, ew, e_vc), (rs, js, sw, s_vc)):
                rw, jw = r * w, j * w[:, None]
                irls = gn.huber_irls_weight(rw, o.huber_delta)
                hi, bi = gn.normal_equations(rw, jw, irls, v)
                h, b = h + hi, b + bi
            h = lax.psum(h, MAP_AXIS)
            b = lax.psum(b, MAP_AXIS)
            delta = gn.solve_step(h, b, o.gn_damping)
            return (se3.pose_update_left(delta, pose), h)

        pose_l, h = lax.fori_loop(
            0, o.inner_gn_iters, inner, (pose_l, jnp.zeros((6, 6), jnp.float32))
        )
        return (pose_l.q, pose_l.t, h, e_m0, s_m0, e_match, s_match, e_vc, s_vc, it + 1)

    ze = jnp.zeros(qs_e, bool)
    zs = jnp.zeros(qs_s, bool)
    init = (
        pose0.q, pose0.t, jnp.zeros((6, 6), jnp.float32),
        ze, zs, ze, zs, ze, zs, jnp.asarray(0, jnp.int32),
    )
    q, t_l, h_fin, e_m0, s_m0, e_match, s_match, e_vc, s_vc, _ = lax.while_loop(
        lambda c: c[-1] < opt_eff, outer_body, init
    )

    me = lax.axis_index(MAP_AXIS)
    scale_rest = jnp.maximum(opt_eff - 1, 0).astype(jnp.float32)

    def apply_inc(grid, st, m0, m_fin):
        wgt = m0.astype(jnp.float32) + scale_rest * m_fin.astype(jnp.float32)
        a_shard, a_lidx, a_w = lax.all_gather(
            (st.shard5, st.lidx5, jnp.broadcast_to(wgt[:, None], wgt.shape + (k,))),
            MAP_AXIS,
        )
        inc_here = jnp.where(a_shard == me, a_w, 0.0).reshape(-1)
        g_new = grid.rg[:, 1].at[a_lidx.reshape(-1)].add(inc_here, mode="drop")
        return grid.rg.at[:, 1].set(jnp.minimum(o.counter_cap, g_new))

    e_rg = apply_inc(edge_grid, ea, e_m0, e_match)
    s_rg = apply_inc(surf_grid, sa, s_m0, s_match)

    def writeback(st, vc_union):
        new_rg = jnp.stack(
            [
                jnp.minimum(o.counter_cap, jnp.floor(st.round_)),
                jnp.minimum(o.counter_cap, jnp.floor(st.observe)),
            ],
            -1,
        )
        slice_rg = jnp.where(vc_union[:, None], new_rg, st.prg_s)
        return lax.all_gather(slice_rg, MAP_AXIS).reshape(-1, 2)

    se_rg = writeback(ea, (e_m0 & ea.pers_ok) | e_vc)
    ss_rg = writeback(sa, (s_m0 & sa.pers_ok) | s_vc)
    ne = lax.psum(e_vc.sum(), MAP_AXIS)
    ns = lax.psum(s_vc.sum(), MAP_AXIS)
    return q, t_l, e_rg, s_rg, se_rg, ss_rg, ne, ns, h_fin


def _first_frame_block(state, feat, cfg: PipelineConfig, n_map: int):
    """Sharded initMapWithPoints: each shard adopts its hash-owned features."""
    o = cfg.odometry
    me = lax.axis_index(MAP_AXIS)

    def seed(mask, leaf, kind):
        cap_local = _local_capacity(cfg, kind, n_map)
        own = (voxel.spatial_hash(feat.xyz, leaf) % n_map) == me
        xyz, valid = es_odometry._compact(feat.xyz, mask & own, cap_local)
        rg = jnp.zeros((cap_local, 2), jnp.float32)
        return map_state.build_index(xyz, rg, valid, state.pose.t, cfg, kind)

    return state._replace(
        edge_map=seed(feat.edge_mask, o.map_resolution, "edge"),
        surf_map=seed(feat.surf_mask, o.map_resolution * 2.0, "surf"),
        opt_count=jnp.asarray(cfg.odometry.max_outer_iters, jnp.int32),
    )


def _es_step_block(state, feat, cfg: PipelineConfig, n_map: int):
    """One sharded odometry frame — the distributed twin of
    models.es_odometry.es_step (same structure, collective association)."""
    o, cap = cfg.odometry, cfg.capacity
    tiled = _use_tiled(cfg)

    opt_count = jnp.maximum(o.min_outer_iters, state.opt_count - 1)
    pred = se3.constant_velocity_predict(state.pose, state.last_pose)
    last_pose = state.pose

    e_xyz, e_valid = es_odometry._compact(feat.xyz, feat.edge_mask, cap.edge_points)
    s_xyz, s_valid = es_odometry._compact(feat.xyz, feat.surf_mask, cap.surf_points)
    ds_edge, over_ds_e = voxel.voxel_downsample_rgbds_counted(
        voxel.PointSet(e_xyz, jnp.zeros((cap.edge_points, 2), jnp.float32), e_valid),
        o.map_resolution,
        cap.ds_edge_points,
    )
    ds_surf, over_ds_s = voxel.voxel_downsample_rgbds_counted(
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

    # Tile-sort each feature cloud ONCE per frame at the predicted pose (see
    # es_odometry.es_step).  The sort depends only on the shared origin, so
    # every shard computes the identical order — all_gather rows align.
    e_bounds = s_bounds = None
    if tiled:
        e_sort = map_state.sort_queries_for_index(
            edge_grid, se3.transform_points(pred, ds_edge.xyz), ds_edge.valid, cfg, "edge"
        )
        s_sort = map_state.sort_queries_for_index(
            surf_grid, se3.transform_points(pred, ds_surf.xyz), ds_surf.valid, cfg, "surf"
        )
        ds_edge = voxel.PointSet(
            xyz=ds_edge.xyz[e_sort.order],
            rg=ds_edge.rg[e_sort.order],
            valid=ds_edge.valid[e_sort.order],
        )
        ds_surf = voxel.PointSet(
            xyz=ds_surf.xyz[s_sort.order],
            rg=ds_surf.rg[s_sort.order],
            valid=ds_surf.valid[s_sort.order],
        )
        e_bounds, s_bounds = e_sort.bounds, s_sort.bounds

    outer = _sharded_outer_assoc_once if o.assoc_once else _sharded_outer_per_iter
    q, t_l, e_rg, s_rg, se_rg, ss_rg, ne, ns, h_fin = outer(
        cfg, opt_eff, pose0, center, edge_grid, surf_grid,
        ds_edge, ds_surf, e_bounds, s_bounds, n_map,
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

    # Pose-graph window + optional smoothing — identical replicated
    # arithmetic on every shard (h_fin is already psum-reduced), so no
    # extra collective is needed; see es_odometry.es_step.
    pgc = cfg.pose_graph
    h_anchor = jnp.where(dropped, 1e-3 * jnp.eye(6, dtype=jnp.float32), h_fin)
    pg_q, pg_t, pg_h, pg_valid = pose_graph.push_window(
        state.pg_q, state.pg_t, state.pg_h, state.pg_valid, pose.q, pose.t, h_anchor
    )
    if pgc.enabled:
        pose = pose_graph.smoothed_newest(pg_q, pg_t, pg_h, pg_valid, pose, pgc)

    edge_world = se3.transform_points(pose, ds_edge.xyz)
    surf_world = se3.transform_points(pose, ds_surf.xyz)
    new_edge, over_me = _sharded_merge(
        edge_grid._replace(rg=e_rg), edge_world, se_rg, ds_edge.valid,
        pose.t, o.map_resolution, cfg, "edge", n_map,
    )
    new_surf, over_ms = _sharded_merge(
        surf_grid._replace(rg=s_rg), surf_world, ss_rg, ds_surf.valid,
        pose.t, o.map_resolution * 2.0, cfg, "surf", n_map,
    )
    over_tile = map_state.tile_overflow_count(
        new_edge, cfg, "edge"
    ) + map_state.tile_overflow_count(new_surf, cfg, "surf")
    if e_bounds is not None:
        over_halo = es_odometry._halo_escape_count(
            edge_world, ds_edge.valid, e_bounds, edge_grid.origin, cfg, "edge"
        ) + es_odometry._halo_escape_count(
            surf_world, ds_surf.valid, s_bounds, surf_grid.origin, cfg, "surf"
        )
    else:
        over_halo = jnp.asarray(0, jnp.int32)
    # Merge/tile lanes are shard-local -> psum; compact/ds/halo lanes are
    # computed on replicated data -> already global.
    overflow = jnp.stack(
        [
            jnp.maximum(feat.edge_mask.sum() - cap.edge_points, 0),
            jnp.maximum(feat.surf_mask.sum() - cap.surf_points, 0),
            over_ds_e,
            over_ds_s,
            lax.psum(over_me, MAP_AXIS),
            lax.psum(over_ms, MAP_AXIS),
            lax.psum(over_tile, MAP_AXIS),
            over_halo,
        ]
    ).astype(jnp.int32)

    new_state = es_odometry.ESState(
        edge_map=new_edge,
        surf_map=new_surf,
        pose=pose,
        last_pose=last_pose,
        opt_count=opt_count,
        pg_q=pg_q,
        pg_t=pg_t,
        pg_h=pg_h,
        pg_valid=pg_valid,
    )
    diag = es_odometry.FrameDiag(
        n_edge_corr=ne,
        n_surf_corr=ns,
        edge_map_size=lax.psum(new_edge.valid.sum(), MAP_AXIS),
        surf_map_size=lax.psum(new_surf.valid.sum(), MAP_AXIS),
        dropped=dropped,
        overflow=overflow,
        contam=jnp.zeros(2, jnp.int32),
    )
    return new_state, diag


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def init_sharded_state(cfg: PipelineConfig, n_seq: int, n_map: int = 1):
    """Batched empty state (leading seq dim).  Shard with state_specs(cfg).

    For the tiled impl the per-shard map arrays are built explicitly at
    capacity // n_map with an [n_seq, n_map] leading prefix; the grid impl
    keeps full-capacity arrays whose capacity axis the mesh splits, so
    ``n_map`` is ignored there.
    """
    if not _use_tiled(cfg):
        states = [es_odometry.init_state(cfg) for _ in range(n_seq)]
        return stack_states(states)

    def empty_local(kind):
        cap_local = _local_capacity(cfg, kind, n_map)
        zeros = jnp.zeros((cap_local, 3), jnp.float32)
        zrg = jnp.zeros((cap_local, 2), jnp.float32)
        invalid = jnp.zeros(cap_local, bool)
        one = map_state.build_index(zeros, zrg, invalid, jnp.zeros(3, jnp.float32), cfg, kind)
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (n_seq, n_map) + x.shape), one)

    base = es_odometry.init_state(cfg)
    pose_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_seq,) + x.shape), base.pose)
    return es_odometry.ESState(
        edge_map=empty_local("edge"),
        surf_map=empty_local("surf"),
        pose=pose_b,
        last_pose=pose_b,
        opt_count=jnp.broadcast_to(base.opt_count, (n_seq,)),
        pg_q=jnp.broadcast_to(base.pg_q, (n_seq,) + base.pg_q.shape),
        pg_t=jnp.broadcast_to(base.pg_t, (n_seq,) + base.pg_t.shape),
        pg_h=jnp.broadcast_to(base.pg_h, (n_seq,) + base.pg_h.shape),
        pg_valid=jnp.broadcast_to(base.pg_valid, (n_seq,) + base.pg_valid.shape),
    )


def make_sharded_step(cfg: PipelineConfig, mesh, first: bool = False):
    """Build the jitted sharded frame function over ``mesh`` (axes seq, map).

    Inputs: state (from init_sharded_state), scan xyz [n_seq, N, 3], mask
    [n_seq, N].  Feature extraction runs replicated inside each map group.
    """
    n_map = mesh.shape[MAP_AXIS]
    tiled = _use_tiled(cfg)

    def block_fn(state_b, xyz_b, mask_b):
        state = _squeeze_state(state_b, tiled)
        xyz, mask = xyz_b[0], mask_b[0]
        # Optional ES front-end (cfg.es_ground_filter / es_curved_filter) —
        # replicated per map group, mirroring pipeline.ESPipeline._extract.
        if cfg.es_ground_filter:
            from pfilter_tpu.ops import ground as ground_ops

            mask = ground_ops.segment_ground_dispatch(xyz, mask, cfg).nonground_mask
        if cfg.es_curved_filter:
            from pfilter_tpu.ops import dcvc as dcvc_ops

            mask = dcvc_ops.cluster(xyz, mask, cfg.dcvc, cfg.lidar).keep
        feat = fops.extract_features(xyz, mask, cfg.lidar, cfg.features, cfg.capacity)
        if first:
            new_state = _first_frame_block(state, feat, cfg, n_map)
            diag = es_odometry.FrameDiag(
                n_edge_corr=jnp.asarray(0, jnp.int32),
                n_surf_corr=jnp.asarray(0, jnp.int32),
                edge_map_size=lax.psum(new_state.edge_map.valid.sum(), MAP_AXIS),
                surf_map_size=lax.psum(new_state.surf_map.valid.sum(), MAP_AXIS),
                dropped=jnp.asarray(False),
                overflow=es_odometry.zero_overflow(),
                contam=jnp.zeros(2, jnp.int32),
            )
        else:
            new_state, diag = _es_step_block(state, feat, cfg, n_map)
        return _unsqueeze_state(new_state, tiled), _unsqueeze0(diag)

    diag_specs = es_odometry.FrameDiag(
        n_edge_corr=P("seq"),
        n_surf_corr=P("seq"),
        edge_map_size=P("seq"),
        surf_map_size=P("seq"),
        dropped=P("seq"),
        overflow=P("seq", None),
        contam=P("seq", None),
    )
    sharded = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(state_specs(cfg), P("seq", None, None), P("seq", None)),
        out_specs=(state_specs(cfg), diag_specs),
        check_vma=False,
    )
    return jax.jit(sharded)
