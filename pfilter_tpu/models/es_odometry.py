"""ES (edge + surf) scan-to-map odometry — the PFilter paper's core loop.

TPU-native re-design of ``Odom_ES_EstimationClass``
(ref: src/odomEstimationClass.cpp:182-647).  One frame =

  1. constant-velocity pose prediction (ref: :235-240),
  2. voxel downsample of the edge/surf feature clouds (ref: :242-245),
  3. ``opt_count`` outer iterations (12 decaying to 2, ref: :232-233,252) of
     correspondence building + persistence gating + 4 Gauss-Newton steps
     (replacing Ceres DENSE_QR, ref: :263-271),
  4. map merge: transform scan into world, crop, rgbds re-voxelize,
     persistence eviction, aging (ref: :589-647).

Everything after the host hands over the (already feature-extracted) scan is
one jit-compiled XLA program: the KD-tree of the reference becomes the sorted
voxel grid (ops.knn), the sequential per-point factor loop becomes batched
masked association, and the per-point ``g``-counter increments become one
capped scatter-add per outer iteration.

Batched persistence semantics (SURVEY.md §7b): the reference increments map
``g`` counters *during* the sequential factor loop, so a scan point late in
the loop can observe increments from earlier points of the same iteration.
Here all reads use the iteration-start counters and all increments are
applied at once — the once-per-iteration semantics the reference effectively
approximates.

fp32 conditioning: association and GN run in a frame re-centered at the
predicted translation, so Jacobian lever arms stay bounded by the crop radius
instead of growing with trajectory length.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pfilter_tpu.config import PipelineConfig
from pfilter_tpu.models import map_state
from pfilter_tpu.ops import gauss_newton as gn
from pfilter_tpu.ops import knn, pose_graph, se3, voxel


class ESState(NamedTuple):
    edge_map: knn.HashGrid
    surf_map: knn.HashGrid
    pose: se3.Pose  # world <- sensor
    last_pose: se3.Pose
    opt_count: jnp.ndarray  # [] int32
    # Pose-graph window (ops/pose_graph.py): last K scan-match poses + their
    # GN information matrices.  Maintained even when the smoother is off
    # (cheap; keeps the state pytree shape config-independent modulo K).
    pg_q: jnp.ndarray = None  # [K,4]
    pg_t: jnp.ndarray = None  # [K,3]
    pg_h: jnp.ndarray = None  # [K,6,6]
    pg_valid: jnp.ndarray = None  # [K]


# Lanes of FrameDiag.overflow — every fixed capacity that can silently drop
# points gets a counter (the reference's dynamic containers cannot overflow;
# our static shapes must be observable, VERDICT r1 missing #7):
#   0 edge_compact     extracted edge features beyond capacity.edge_points
#   1 surf_compact     extracted surf features beyond capacity.surf_points
#   2 ds_edge_voxel    downsampled-scan voxels beyond ds_edge_points
#   3 ds_surf_voxel    downsampled-scan voxels beyond ds_surf_points
#   4 edge_merge_voxel map voxels beyond edge_map_points at merge
#   5 surf_merge_voxel map voxels beyond surf_map_points at merge
#   6 tile_cap_over    map points beyond their kNN tile cap (truncation risk)
#   7 halo_escape      queries whose final pose left their sorted tile's halo
OVERFLOW_LANES = (
    "edge_compact",
    "surf_compact",
    "ds_edge_voxel",
    "ds_surf_voxel",
    "edge_merge_voxel",
    "surf_merge_voxel",
    "tile_cap_over",
    "halo_escape",
)


class FrameDiag(NamedTuple):
    n_edge_corr: jnp.ndarray
    n_surf_corr: jnp.ndarray
    edge_map_size: jnp.ndarray
    surf_map_size: jnp.ndarray
    dropped: jnp.ndarray = False  # device-side corrupt-frame guard fired
    overflow: jnp.ndarray = 0  # [8] int32 counters, lanes in OVERFLOW_LANES
    # [2] int32 (edge, surf) mover-contaminated map points — populated only
    # when the provenance channel is on (rg width 3; see init_state).
    contam: jnp.ndarray = 0


def zero_overflow() -> jnp.ndarray:
    return jnp.zeros(len(OVERFLOW_LANES), jnp.int32)


def init_state(cfg: PipelineConfig, rg_width: int = 2) -> ESState:
    """``rg_width=3`` enables the ground-truth provenance channel: rg column 2
    carries a mover-origin bit that rides the exact same voxel max-merge as
    the persistence counters, so every surviving map point knows whether any
    contributing return hit a dynamic object (diagnostic instrumentation for
    the persistence-filter contamination study; zero effect on the pose)."""
    k = cfg.pose_graph.window
    return ESState(
        edge_map=map_state.empty_index(cfg, "edge", rg_width),
        surf_map=map_state.empty_index(cfg, "surf", rg_width),
        pose=se3.identity_pose(),
        last_pose=se3.identity_pose(),
        opt_count=jnp.asarray(cfg.odometry.max_outer_iters, jnp.int32),
        pg_q=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (k, 1)),
        pg_t=jnp.zeros((k, 3), jnp.float32),
        pg_h=jnp.zeros((k, 6, 6), jnp.float32),
        pg_valid=jnp.zeros(k, bool),
    )


def _compact(xyz: jnp.ndarray, mask: jnp.ndarray, out_cap: int):
    """Gather masked points into a fixed-size prefix (cheaper than sorting)."""
    idx = jnp.nonzero(mask, size=out_cap, fill_value=xyz.shape[0] - 1)[0]
    valid = jnp.arange(out_cap) < jnp.sum(mask.astype(jnp.int32))
    return xyz[idx], valid


def _compact_idx(xyz: jnp.ndarray, mask: jnp.ndarray, out_cap: int):
    """:func:`_compact` that also returns the gather indices (provenance)."""
    idx = jnp.nonzero(mask, size=out_cap, fill_value=xyz.shape[0] - 1)[0]
    valid = jnp.arange(out_cap) < jnp.sum(mask.astype(jnp.int32))
    return xyz[idx], valid, idx


def _scan_rg(valid, idx, width: int, cap: int, mover):
    """Fresh scan-point rg block; column 2 gets the mover-provenance bit."""
    rg = jnp.zeros((cap, width), jnp.float32)
    if mover is not None:
        bit = jnp.where(valid, mover[idx].astype(jnp.float32), 0.0)
        rg = rg.at[:, 2].set(bit)
    return rg


def first_frame(state: ESState, feat, cfg: PipelineConfig, mover=None) -> ESState:
    """Seed the maps with the raw first-scan features
    (ref ``initMapWithPoints``, src/odomEstimationClass.cpp:217-222).
    ``mover`` is an optional [R*C] mover-origin mask aligned with feat.xyz
    (requires init_state(rg_width=3))."""
    cap = cfg.capacity
    w = state.edge_map.rg.shape[1]
    e_xyz, e_valid, e_idx = _compact_idx(feat.xyz, feat.edge_mask, cap.edge_map_points)
    s_xyz, s_valid, s_idx = _compact_idx(feat.xyz, feat.surf_mask, cap.surf_map_points)
    zeros_e = _scan_rg(e_valid, e_idx, w, cap.edge_map_points, mover)
    zeros_s = _scan_rg(s_valid, s_idx, w, cap.surf_map_points, mover)
    origin_t = state.pose.t
    return state._replace(
        edge_map=map_state.build_index(e_xyz, zeros_e, e_valid, origin_t, cfg, "edge"),
        surf_map=map_state.build_index(s_xyz, zeros_s, s_valid, origin_t, cfg, "surf"),
        opt_count=jnp.asarray(cfg.odometry.max_outer_iters, jnp.int32),
    )


class _Assoc(NamedTuple):
    """Result of one association pass over one feature type."""

    geom_a: jnp.ndarray  # [M,3] line endpoint a / plane normal
    geom_b: jnp.ndarray  # [M,3] line endpoint b / (plane d, 0, 0)
    valid: jnp.ndarray  # [M] — gated correspondence mask
    weight_obs: jnp.ndarray  # [M] raw observe values (for weightType 1/12)
    weight_spr: jnp.ndarray  # [M] raw sparsity values (for weightType 2/12)
    scan_rg: jnp.ndarray  # [M,2] r/g to write back into matched scan points
    g_increment: jnp.ndarray  # [MAP_CAP] counter increments for this pass


def _associate(
    kind: str,
    grid,  # HashGrid | TiledMap (see models.map_state.build_index)
    map_rg: jnp.ndarray,
    pose_local: se3.Pose,
    center: jnp.ndarray,
    scan_xyz: jnp.ndarray,
    scan_valid: jnp.ndarray,
    scan_rg: jnp.ndarray,
    cfg: PipelineConfig,
    qsort_bounds: jnp.ndarray | None = None,
    gate_sq: jnp.ndarray | float | None = None,
) -> _Assoc:
    """One correspondence-building pass (ref ``addEdgeCostFactor`` /
    ``addSurfCostFactor``, src/odomEstimationClass.cpp:284-578): 5-NN lookup,
    geometric fit, persistence read/update/gate, weight statistics.
    ``gate_sq`` overrides the 5th-NN gate (coarse-to-fine schedule)."""
    o = cfg.odometry
    c = cfg.capacity
    k = c.knn_k
    if gate_sq is None:
        gate_sq = o.nn_gate_sq

    # Query in world coords; the index stores world points.
    q_world = se3.transform_points(pose_local, scan_xyz) + center
    if qsort_bounds is not None:
        # scan_xyz is already in tile-sorted order; skip the per-pass sort.
        nn_idx, nn_sq = map_state.query_index_presorted(
            grid, q_world, qsort_bounds, cfg, kind
        )
        nn_sq = jnp.where(scan_valid[:, None], nn_sq, jnp.inf)
    else:
        nn_idx, nn_sq = map_state.query_index(grid, q_world, scan_valid, cfg, kind)
    gate = nn_sq[:, k - 1] < gate_sq

    neigh = grid.xyz[nn_idx] - center  # [M,5,3] local frame for fp32 fits
    if map_state.is_line_kind(kind):
        pa, pb, fit_ok = gn.fit_lines(neigh, o.line_eig_ratio, o.line_half_length)
        geom_a, geom_b = pa, pb
    else:
        normal, d, fit_ok = gn.fit_planes(neigh, o.plane_fit_tol)
        geom_a = normal
        geom_b = jnp.stack([d, jnp.zeros_like(d), jnp.zeros_like(d)], -1)

    matched = scan_valid & gate & fit_ok

    # Persistence read (ref: :332-344): observe = mean(g)+1, round = mean(r).
    g5 = map_rg[nn_idx, 1]
    r5 = map_rg[nn_idx, 0]
    observe = jnp.mean(g5, axis=1) + 1.0
    round_ = jnp.mean(r5, axis=1)
    # g increment for all matched correspondences (ref: :345-346) — happens
    # *before* the persistence gate.
    inc = jnp.zeros(grid.rg.shape[0], jnp.float32)
    inc = inc.at[nn_idx.reshape(-1)].add(
        jnp.repeat(matched.astype(jnp.float32), k), mode="drop"
    )
    # Saturation: observe/round > 5 -> observe = 255 (ref: :348-349; round == 0
    # divides to inf in the C++ and saturates too).
    observe = jnp.where(observe > o.observe_saturate_ratio * round_, o.counter_cap, observe)
    # Persistence gate (ref: :350-353): drop iff
    # observe < round*theta_p && round > k_new && observe < theta_max.
    gated_out = (observe < round_ * o.theta_p) & (round_ > o.k_new) & (observe < o.theta_max)
    valid_corr = matched & ~gated_out

    # Write r/g back into the scan point (ref: :354-355) — these travel into
    # the map at merge time.  Columns beyond 2 (provenance channel) keep the
    # scan point's own values.
    new_rg = jnp.stack(
        [
            jnp.minimum(o.counter_cap, jnp.floor(round_)),
            jnp.minimum(o.counter_cap, jnp.floor(observe)),
        ],
        -1,
    )
    new_rg = jnp.concatenate([new_rg, scan_rg[:, 2:]], axis=-1)
    scan_rg = jnp.where(valid_corr[:, None], new_rg, scan_rg)

    # Sparsity statistic (ref: :367-385): mean distance of the 5 neighbors to
    # their centroid.
    nc = jnp.mean(neigh, axis=1, keepdims=True)
    sparsity = jnp.mean(jnp.linalg.norm(neigh - nc, axis=-1), axis=1)

    return _Assoc(
        geom_a=geom_a,
        geom_b=geom_b,
        valid=valid_corr,
        weight_obs=observe,
        weight_spr=sparsity,
        scan_rg=scan_rg,
        g_increment=inc,
    )


class _AssocStatic(NamedTuple):
    """Frame-invariant association data (assoc_once=True path): everything
    derived from the map + the predicted-pose kNN, computed once per frame.
    Only the distance gate depends on the refining pose."""

    nn_idx: jnp.ndarray  # [M,5] map slot ids
    neigh: jnp.ndarray  # [M,5,3] neighbor coords, center-relative
    nn_valid: jnp.ndarray  # [M] query had a full finite 5-NN set
    geom_a: jnp.ndarray  # [M,3] line endpoint a / plane normal
    geom_b: jnp.ndarray  # [M,3] line endpoint b / (plane d, 0, 0)
    fit_ok: jnp.ndarray  # [M]
    pers_ok: jnp.ndarray  # [M] persistence gate (frame-start counters)
    observe: jnp.ndarray  # [M] saturated observe statistic
    round_: jnp.ndarray  # [M]
    sparsity: jnp.ndarray  # [M]


def _associate_static(
    kind: str,
    grid,
    map_rg: jnp.ndarray,
    pose_local: se3.Pose,
    center: jnp.ndarray,
    scan_xyz: jnp.ndarray,
    scan_valid: jnp.ndarray,
    cfg: PipelineConfig,
    qsort_bounds: jnp.ndarray,
) -> _AssocStatic:
    """The pose-independent half of a correspondence pass: 5-NN at the
    predicted pose, neighbor gather, line/plane fits, persistence read+gate,
    sparsity statistic (ref ``addEdgeCostFactor``/``addSurfCostFactor``,
    src/odomEstimationClass.cpp:284-578 — here hoisted out of the outer
    iteration loop, see OdometryConfig.assoc_once)."""
    o = cfg.odometry
    k = cfg.capacity.knn_k

    q_world = se3.transform_points(pose_local, scan_xyz) + center
    if qsort_bounds is not None:
        nn_idx, nn_sq = map_state.query_index_presorted(
            grid, q_world, qsort_bounds, cfg, kind
        )
    else:
        nn_idx, nn_sq = map_state.query_index(grid, q_world, scan_valid, cfg, kind)
    nn_valid = scan_valid & jnp.isfinite(nn_sq[:, k - 1])

    neigh = grid.xyz[nn_idx] - center  # [M,5,3] local frame for fp32 fits
    if map_state.is_line_kind(kind):
        pa, pb, fit_ok = gn.fit_lines(neigh, o.line_eig_ratio, o.line_half_length)
        geom_a, geom_b = pa, pb
    else:
        normal, d, fit_ok = gn.fit_planes(neigh, o.plane_fit_tol)
        geom_a = normal
        geom_b = jnp.stack([d, jnp.zeros_like(d), jnp.zeros_like(d)], -1)

    # Persistence read (ref: :332-344) on frame-start counters.
    g5 = map_rg[nn_idx, 1]
    r5 = map_rg[nn_idx, 0]
    observe = jnp.mean(g5, axis=1) + 1.0
    round_ = jnp.mean(r5, axis=1)
    observe = jnp.where(
        observe > o.observe_saturate_ratio * round_, o.counter_cap, observe
    )
    gated_out = (
        (observe < round_ * o.theta_p) & (round_ > o.k_new) & (observe < o.theta_max)
    )

    nc = jnp.mean(neigh, axis=1, keepdims=True)
    sparsity = jnp.mean(jnp.linalg.norm(neigh - nc, axis=-1), axis=1)

    return _AssocStatic(
        nn_idx=nn_idx,
        neigh=neigh,
        nn_valid=nn_valid,
        geom_a=geom_a,
        geom_b=geom_b,
        fit_ok=fit_ok,
        pers_ok=~gated_out,
        observe=observe,
        round_=round_,
        sparsity=sparsity,
    )


def _regate(
    st: _AssocStatic,
    pose_local: se3.Pose,
    scan_xyz: jnp.ndarray,
    gate_sq,
):
    """Re-gate the static correspondences under the current pose: a query
    stays matched iff its worst cached neighbor is within ``gate_sq`` (the
    refining-pose twin of the reference's 5th-NN gate, ref: :300,:451)."""
    q_local = se3.transform_points(pose_local, scan_xyz)  # center-relative
    d5 = jnp.sum((q_local[:, None, :] - st.neigh) ** 2, axis=-1)  # [M,5]
    gate = jnp.max(d5, axis=1) < gate_sq
    matched = st.nn_valid & gate & st.fit_ok
    return matched, matched & st.pers_ok


def _halo_escape_count(
    q_world: jnp.ndarray,
    q_valid: jnp.ndarray,
    bounds: jnp.ndarray,
    origin: jnp.ndarray,
    cfg: PipelineConfig,
    kind: str,
) -> jnp.ndarray:
    """Count tile-sorted queries whose (final) world position lies more than
    one tile away from the tile they were sorted into — for those, the kNN
    halo no longer covers the 1 m gate ball and neighbors may be missed."""
    nt, tc, _ = map_state._tile_params(cfg, kind)
    ts = float(tc)
    q = q_world.shape[0]
    p = jnp.arange(q, dtype=jnp.int32)
    tid_s = jnp.clip(jnp.searchsorted(bounds, p, side="right") - 1, 0, nt * nt - 1)
    tx_s, ty_s = tid_s // nt, tid_s % nt
    t2 = jnp.clip(
        jnp.floor((q_world[:, :2] - origin[:2]) / ts).astype(jnp.int32), 1, nt - 2
    )
    escaped = q_valid & (
        (jnp.abs(t2[:, 0] - tx_s) > 1) | (jnp.abs(t2[:, 1] - ty_s) > 1)
    )
    return escaped.sum().astype(jnp.int32)


def _weights_from(
    weight_obs: jnp.ndarray, weight_spr: jnp.ndarray, valid: jnp.ndarray, weight_type: int
) -> jnp.ndarray:
    """Residual weights by weightType (ref: :389-426, :536-571).  Applied to
    both residual and Jacobian (consistent IRLS; the reference scales only
    residuals — documented divergence, see ops.gauss_newton)."""
    if weight_type == 0:
        return jnp.ones_like(weight_obs)
    w_obs = gn.minmax_normalize_weights(weight_obs, valid, floor=0.1)
    w_spr = gn.minmax_normalize_weights(weight_spr, valid, floor=0.0)
    if weight_type == 1:
        return w_obs
    if weight_type == 2:
        return w_spr
    if weight_type == 12:
        return 0.5 * (w_obs + w_spr)
    raise ValueError(f"unknown weight_type {weight_type}")


def _weights(assoc: _Assoc, weight_type: int) -> jnp.ndarray:
    return _weights_from(assoc.weight_obs, assoc.weight_spr, assoc.valid, weight_type)


def _es_outer_per_iter(
    cfg, opt_eff, pose0, center, edge_grid, surf_grid, ds_edge, ds_surf, e_bounds, s_bounds
):
    """Reference-faithful outer loop: full re-association every iteration
    (ref: src/odomEstimationClass.cpp:252-272)."""
    o = cfg.odometry

    def outer_body(carry):
        q, t_l, _, e_rg, s_rg, se_rg, ss_rg, _, _, it = carry
        pose_l = se3.Pose(q=q, t=t_l)
        # Coarse-to-fine: wide gate on the first outer iteration only (see
        # OdometryConfig.nn_gate_wide_sq — breaks the fixed-gate absorbing
        # state at corner exits / cold starts).
        gate_sq = jnp.where(it == 0, o.nn_gate_wide_sq, o.nn_gate_sq)

        ea = _associate(
            "edge", edge_grid, e_rg, pose_l, center, ds_edge.xyz, ds_edge.valid, se_rg, cfg,
            qsort_bounds=e_bounds, gate_sq=gate_sq,
        )
        sa = _associate(
            "surf", surf_grid, s_rg, pose_l, center, ds_surf.xyz, ds_surf.valid, ss_rg, cfg,
            qsort_bounds=s_bounds, gate_sq=gate_sq,
        )

        e_rg = e_rg.at[:, 1].set(jnp.minimum(o.counter_cap, e_rg[:, 1] + ea.g_increment))
        s_rg = s_rg.at[:, 1].set(jnp.minimum(o.counter_cap, s_rg[:, 1] + sa.g_increment))

        factors = [
            gn.Correspondences(
                kind="edge",
                points=ds_edge.xyz,
                geom_a=ea.geom_a,
                geom_b=ea.geom_b,
                weight=_weights(ea, o.weight_type),
                valid=ea.valid,
            ),
            gn.Correspondences(
                kind="surf",
                points=ds_surf.xyz,
                geom_a=sa.geom_a,
                geom_b=sa.geom_b,
                weight=_weights(sa, o.weight_type),
                valid=sa.valid,
            ),
        ]

        def inner(_, carry_i):
            pose, _ = carry_i
            new_pose, (hh, _b) = gn.gn_iteration(pose, factors, o.huber_delta, o.gn_damping)
            return (new_pose, hh)

        pose_l, h = jax.lax.fori_loop(
            0, o.inner_gn_iters, inner, (pose_l, jnp.zeros((6, 6), jnp.float32))
        )
        return (
            pose_l.q,
            pose_l.t,
            h,
            e_rg,
            s_rg,
            ea.scan_rg,
            sa.scan_rg,
            ea.valid.sum(),
            sa.valid.sum(),
            it + 1,
        )

    def outer_cond(carry):
        return carry[-1] < opt_eff

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
    q, t_l, h_fin, e_rg, s_rg, se_rg, ss_rg, ne, ns, _ = jax.lax.while_loop(
        outer_cond, outer_body, init
    )
    return q, t_l, e_rg, s_rg, se_rg, ss_rg, ne, ns, h_fin


def _es_outer_assoc_once(
    cfg, opt_eff, pose0, center, edge_grid, surf_grid, ds_edge, ds_surf, e_bounds, s_bounds
):
    """Hoisted-association outer loop (OdometryConfig.assoc_once): one kNN +
    gather + fit + persistence pass per feature type per FRAME; iterations
    re-gate cached neighbor distances under the refining pose and re-run GN.

    Counter semantics: g increments apply once after the loop, scaled by the
    number of outer iterations run, approximating the reference's
    per-iteration increments (ref: :345-346) on frame-start reads."""
    o = cfg.odometry
    k = cfg.capacity.knn_k

    ea = _associate_static(
        "edge", edge_grid, edge_grid.rg, pose0, center,
        ds_edge.xyz, ds_edge.valid, cfg, e_bounds,
    )
    sa = _associate_static(
        "surf", surf_grid, surf_grid.rg, pose0, center,
        ds_surf.xyz, ds_surf.valid, cfg, s_bounds,
    )

    def outer_body(carry):
        q, t_l, _, e_m0, s_m0, _, _, _, _, it = carry
        pose_l = se3.Pose(q=q, t=t_l)
        gate_sq = jnp.where(it == 0, o.nn_gate_wide_sq, o.nn_gate_sq)
        e_match, e_vc = _regate(ea, pose_l, ds_edge.xyz, gate_sq)
        s_match, s_vc = _regate(sa, pose_l, ds_surf.xyz, gate_sq)
        # Keep the FIRST iteration's (wide-gate) match set: the reference
        # increments g on every iteration's matches, and the wide pass is a
        # superset of the final narrow one — crediting only the final set
        # over-evicts (measured: maps shrink ~40%, drift doubles).
        e_m0 = jnp.where(it == 0, e_match, e_m0)
        s_m0 = jnp.where(it == 0, s_match, s_m0)

        factors = [
            gn.Correspondences(
                kind="edge",
                points=ds_edge.xyz,
                geom_a=ea.geom_a,
                geom_b=ea.geom_b,
                weight=_weights_from(ea.observe, ea.sparsity, e_vc, o.weight_type),
                valid=e_vc,
            ),
            gn.Correspondences(
                kind="surf",
                points=ds_surf.xyz,
                geom_a=sa.geom_a,
                geom_b=sa.geom_b,
                weight=_weights_from(sa.observe, sa.sparsity, s_vc, o.weight_type),
                valid=s_vc,
            ),
        ]

        def inner(_, carry_i):
            pose, _ = carry_i
            new_pose, (hh, _b) = gn.gn_iteration(pose, factors, o.huber_delta, o.gn_damping)
            return (new_pose, hh)

        pose_l, h = jax.lax.fori_loop(
            0, o.inner_gn_iters, inner, (pose_l, jnp.zeros((6, 6), jnp.float32))
        )
        return (pose_l.q, pose_l.t, h, e_m0, s_m0, e_match, s_match, e_vc, s_vc, it + 1)

    def outer_cond(carry):
        return carry[-1] < opt_eff

    ze = jnp.zeros(ds_edge.xyz.shape[0], bool)
    zs = jnp.zeros(ds_surf.xyz.shape[0], bool)
    init = (
        pose0.q, pose0.t, jnp.zeros((6, 6), jnp.float32),
        ze, zs, ze, zs, ze, zs, jnp.asarray(0, jnp.int32),
    )
    q, t_l, h_fin, e_m0, s_m0, e_match, s_match, e_vc, s_vc, _ = jax.lax.while_loop(
        outer_cond, outer_body, init
    )

    # g increments (ref: :345-346, pre-persistence-gate matches): the wide
    # first pass credits +1, the remaining opt_eff-1 narrow passes credit the
    # final match set — the once-per-frame approximation of the reference's
    # per-iteration increments.
    scale_rest = jnp.maximum(opt_eff - 1, 0).astype(jnp.float32)

    def apply_inc(grid, nn_idx, m0, m_fin):
        w = m0.astype(jnp.float32) + scale_rest * m_fin.astype(jnp.float32)
        inc = jnp.zeros(grid.rg.shape[0], jnp.float32)
        inc = inc.at[nn_idx.reshape(-1)].add(jnp.repeat(w, k), mode="drop")
        return grid.rg.at[:, 1].set(jnp.minimum(o.counter_cap, grid.rg[:, 1] + inc))

    e_rg = apply_inc(edge_grid, ea.nn_idx, e_m0, e_match)
    s_rg = apply_inc(surf_grid, sa.nn_idx, s_m0, s_match)

    # Scan-point r/g writeback for map-merge (ref: :354-355) — the union of
    # the per-iteration valid sets (the reference writes on every iteration;
    # a point matched early keeps its writeback even if re-gated out later).
    def writeback(st, vc_union, ds_rg):
        new_rg = jnp.stack(
            [
                jnp.minimum(o.counter_cap, jnp.floor(st.round_)),
                jnp.minimum(o.counter_cap, jnp.floor(st.observe)),
            ],
            -1,
        )
        # Provenance columns (if any) keep the scan point's own values.
        new_rg = jnp.concatenate([new_rg, ds_rg[:, 2:]], axis=-1)
        return jnp.where(vc_union[:, None], new_rg, ds_rg)

    se_rg = writeback(ea, (e_m0 & ea.pers_ok) | e_vc, ds_edge.rg)
    ss_rg = writeback(sa, (s_m0 & sa.pers_ok) | s_vc, ds_surf.rg)
    return q, t_l, e_rg, s_rg, se_rg, ss_rg, e_vc.sum(), s_vc.sum(), h_fin


def es_step(state: ESState, feat, cfg: PipelineConfig, mover=None):
    """One odometry frame (ref ``updatePointsToMap``,
    src/odomEstimationClass.cpp:229-282).  ``feat`` is a FeatureResult from
    ops.features.  ``mover`` is an optional [R*C] mover-origin mask aligned
    with feat.xyz (provenance diagnostics; requires init_state(rg_width=3)).
    Returns (new_state, FrameDiag)."""
    o = cfg.odometry
    cap = cfg.capacity
    w = state.edge_map.rg.shape[1]

    opt_count = jnp.maximum(o.min_outer_iters, state.opt_count - 1)
    pred = se3.constant_velocity_predict(state.pose, state.last_pose)
    last_pose = state.pose

    # Downsample feature clouds (ref: :242-245; edge at map_resolution, surf
    # at 2x — the same leaf sizes as the map rgbds).
    e_xyz, e_valid, e_idx = _compact_idx(feat.xyz, feat.edge_mask, cap.edge_points)
    s_xyz, s_valid, s_idx = _compact_idx(feat.xyz, feat.surf_mask, cap.surf_points)
    over_e_compact = jnp.maximum(feat.edge_mask.sum() - cap.edge_points, 0)
    over_s_compact = jnp.maximum(feat.surf_mask.sum() - cap.surf_points, 0)
    ds_edge, over_ds_e = voxel.voxel_downsample_rgbds_counted(
        voxel.PointSet(e_xyz, _scan_rg(e_valid, e_idx, w, cap.edge_points, mover), e_valid),
        o.map_resolution,
        cap.ds_edge_points,
    )
    ds_surf, over_ds_s = voxel.voxel_downsample_rgbds_counted(
        voxel.PointSet(s_xyz, _scan_rg(s_valid, s_idx, w, cap.surf_points, mover), s_valid),
        o.map_resolution * 2.0,
        cap.ds_surf_points,
    )

    center = pred.t  # fp32 re-centering origin
    pose0 = se3.Pose(q=pred.q, t=jnp.zeros(3, jnp.float32))

    enough = (state.edge_map.valid.sum() > 10) & (state.surf_map.valid.sum() > 50)
    opt_eff = jnp.where(enough, opt_count, 0)

    edge_grid, surf_grid = state.edge_map, state.surf_map

    # Tile-sort each downsampled feature cloud ONCE per frame at the
    # predicted pose and keep everything downstream (association, GN, map
    # merge) in sorted order — correspondence order is irrelevant to the GN
    # reduction and to the voxel-scatter merge, and the kernel's halo margin
    # absorbs the sub-meter pose refinement across outer iterations.
    e_bounds = s_bounds = None
    e_sort = map_state.sort_queries_for_index(
        edge_grid,
        se3.transform_points(pred, ds_edge.xyz),
        ds_edge.valid,
        cfg,
        "edge",
    )
    if e_sort is not None:
        s_sort = map_state.sort_queries_for_index(
            surf_grid,
            se3.transform_points(pred, ds_surf.xyz),
            ds_surf.valid,
            cfg,
            "surf",
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

    outer = _es_outer_assoc_once if o.assoc_once else _es_outer_per_iter
    (q, t_l, e_rg, s_rg, se_rg, ss_rg, ne, ns, h_fin) = outer(
        cfg,
        opt_eff,
        pose0,
        center,
        edge_grid,
        surf_grid,
        ds_edge,
        ds_surf,
        e_bounds,
        s_bounds,
    )

    pose = se3.Pose(q=q, t=t_l + center)

    # Device-side corrupt-frame guard (SURVEY.md §5 — the reference has no
    # fault tolerance; a bad scan poisons the pose forever).  A non-finite or
    # implausibly large pose jump rolls the pose back to the previous frame's
    # inside the XLA program, so the host never needs a per-frame sync to
    # check.  The merge below still runs with the rolled-back pose (bounded
    # damage; persistence eviction cleans residue up over following frames).
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

    # Pose-graph window update + optional smoothing (ops/pose_graph.py):
    # anchors are the RAW scan-match poses weighted by their GN information;
    # a dropped frame enters with near-zero information so the motion model
    # carries it.  The smoothed pose drives the map merge, the published
    # trajectory, and (through new_state.pose) the next prediction.
    pgc = cfg.pose_graph
    h_anchor = jnp.where(dropped, 1e-3 * jnp.eye(6, dtype=jnp.float32), h_fin)
    pg_q, pg_t, pg_h, pg_valid = pose_graph.push_window(
        state.pg_q, state.pg_t, state.pg_h, state.pg_valid, pose.q, pose.t, h_anchor
    )
    if pgc.enabled:
        pose = pose_graph.smoothed_newest(pg_q, pg_t, pg_h, pg_valid, pose, pgc)

    # Map merge (ref addPointsToMap, :589-647) in world coords.
    edge_world = se3.transform_points(pose, ds_edge.xyz)
    surf_world = se3.transform_points(pose, ds_surf.xyz)
    new_edge, over_me = map_state.merge_scan_into_index(
        edge_grid._replace(rg=e_rg),
        edge_world,
        se_rg,
        ds_edge.valid,
        pose.t,
        o.map_resolution,
        cfg,
        "edge",
    )
    new_surf, over_ms = map_state.merge_scan_into_index(
        surf_grid._replace(rg=s_rg),
        surf_world,
        ss_rg,
        ds_surf.valid,
        pose.t,
        o.map_resolution * 2.0,
        cfg,
        "surf",
    )
    over_tile = map_state.tile_overflow_count(
        new_edge, cfg, "edge"
    ) + map_state.tile_overflow_count(new_surf, cfg, "surf")

    # Halo-escape check (ADVICE r1): the per-frame tile sort is exact only
    # while the refined pose keeps each query within its sorted tile's 3x3
    # halo; count queries whose *final* world position drifted further.
    if e_bounds is not None:
        over_halo = _halo_escape_count(
            edge_world, ds_edge.valid, e_bounds, edge_grid.origin, cfg, "edge"
        ) + _halo_escape_count(
            surf_world, ds_surf.valid, s_bounds, surf_grid.origin, cfg, "surf"
        )
    else:
        over_halo = jnp.asarray(0, jnp.int32)

    overflow = jnp.stack(
        [
            over_e_compact,
            over_s_compact,
            over_ds_e,
            over_ds_s,
            over_me,
            over_ms,
            over_tile,
            over_halo,
        ]
    ).astype(jnp.int32)

    new_state = ESState(
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
    # Mover-contamination census (provenance channel only): surviving map
    # points whose voxel ever absorbed a dynamic-object return.
    if w > 2:
        contam = jnp.stack(
            [
                (new_edge.valid & (new_edge.rg[:, 2] > 0.5)).sum(),
                (new_surf.valid & (new_surf.rg[:, 2] > 0.5)).sum(),
            ]
        ).astype(jnp.int32)
    else:
        contam = jnp.asarray(0, jnp.int32)

    diag = FrameDiag(
        n_edge_corr=ne,
        n_surf_corr=ns,
        edge_map_size=new_edge.valid.sum(),
        surf_map_size=new_surf.valid.sum(),
        dropped=dropped,
        overflow=overflow,
        contam=contam,
    )
    return new_state, diag
