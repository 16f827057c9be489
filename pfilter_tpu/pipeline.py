"""Host-side pipeline driver: the replacement for the reference's ROS node
graph (src/laserProcessingNode.cpp + src/odomEstimationNode.cpp).

The reference runs feature extraction and odometry as separate OS processes
connected by serialized pub/sub queues; here each frame is two jit-compiled
XLA programs (extract -> odometry step) with arrays staying on device, and
the host loop only feeds raw scans and collects poses.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pfilter_tpu.config import PipelineConfig
from pfilter_tpu.models import es_odometry
from pfilter_tpu.ops import features


@dataclass
class FrameRecord:
    pose_q: np.ndarray
    pose_t: np.ndarray
    n_edge_corr: int
    n_surf_corr: int
    edge_map_size: int
    surf_map_size: int
    ms: float
    # Capacity-overflow counters (see es_odometry.OVERFLOW_LANES) + host-side
    # raw-scan truncation count; all zero in a correctly-capacitied run.
    overflow: np.ndarray = None
    n_scan_trunc: int = 0
    # [2] (edge, surf) mover-contaminated map points (provenance mode only).
    contam: np.ndarray = None


@dataclass
class ESPipeline:
    """End-to-end ES odometry over a scan stream.

    Fault tolerance (SURVEY.md §5 — the reference has none; a bad frame
    poisons the map and a node crash kills the pipeline): a frame whose
    optimized pose is non-finite or jumps implausibly far is *dropped by the
    device itself* — ``es_step`` rolls the pose back inside the XLA program
    (see es_odometry), so the host loop needs no per-frame synchronization to
    stay safe.  Combined with utils.checkpoint this makes the engine
    restartable and bad-input tolerant.

    Dispatch model: JAX dispatch is asynchronous, so the host can run ahead
    of the device.  With ``sync=True`` (default) every frame's pose and
    diagnostics are fetched before returning — one device round trip per
    frame (the device may sit behind a network tunnel; a round trip is
    ~tens of ms).  With ``sync=False`` fetches lag ``fetch_lag`` frames
    behind dispatch, hiding that latency entirely; call :meth:`flush` (or
    read :attr:`trajectory`) to drain the tail."""

    cfg: PipelineConfig
    state: Optional[es_odometry.ESState] = None
    records: list = field(default_factory=list)
    # Pose jump that marks a frame corrupt; None (default) keeps the value
    # from cfg.odometry.max_jump_m so YAML/CLI overrides are honored.
    max_jump_m: Optional[float] = None
    sync: bool = True
    fetch_lag: int = 4
    n_dropped: int = 0
    # Ground-truth provenance mode (persistence contamination study): scans
    # carry a per-point mover-origin mask; the map's rg gains a third channel
    # whose per-frame census lands in FrameRecord.contam.  Zero effect on the
    # estimated trajectory (the pose path never reads the channel).
    provenance: bool = False
    _n_frames: int = 0

    def __post_init__(self):
        import dataclasses as _dc

        cfg = self.cfg
        if self.max_jump_m is not None:
            cfg = cfg.replace(
                odometry=_dc.replace(cfg.odometry, max_jump_m=self.max_jump_m)
            )
        self.cfg = cfg
        self._pending: list = []

        def _apply_frontend(xyz, mask):
            # Optional ES front-end (cfg.es_ground_filter / es_curved_filter):
            # the reference's curvedVoxel_node preprocessing for the ES
            # pipeline (src/additionNode.cpp:12-54 with featurePreExtract=0).
            if cfg.es_ground_filter:
                from pfilter_tpu.ops import ground as ground_ops

                g = ground_ops.segment_ground_dispatch(xyz, mask, cfg)
                mask = g.nonground_mask
            if cfg.es_curved_filter:
                from pfilter_tpu.ops import dcvc as dcvc_ops

                c = dcvc_ops.cluster(xyz, mask, cfg.dcvc, cfg.lidar)
                mask = c.keep
            return mask

        def _extract(xyz, mask):
            mask = _apply_frontend(xyz, mask)
            return features.extract_features(xyz, mask, cfg.lidar, cfg.features, cfg.capacity)

        def _extract_prov(xyz, mask, mover):
            mask = _apply_frontend(xyz, mask)
            feat = features.extract_features(xyz, mask, cfg.lidar, cfg.features, cfg.capacity)
            mgrid = features.bin_extra(xyz, mask, mover, cfg.lidar, cfg.capacity)
            return feat, mgrid

        def _first(state, feat, mover=None):
            return es_odometry.first_frame(state, feat, cfg, mover=mover)

        def _step(state, feat, mover=None):
            return es_odometry.es_step(state, feat, cfg, mover=mover)

        self._extract = jax.jit(_extract_prov if self.provenance else _extract)
        self._first = jax.jit(_first)
        # No donation: deferred fetches keep references to result buffers.
        self._step = jax.jit(_step)

    def _pad_scan(self, xyz: np.ndarray, valid: Optional[np.ndarray]):
        cap = self.cfg.capacity.scan_points
        n = min(len(xyz), cap)
        self._last_scan_trunc = max(len(xyz) - cap, 0)
        out = np.zeros((cap, 3), np.float32)
        out[:n] = xyz[:n]
        mask = np.zeros(cap, bool)
        if valid is None:
            mask[:n] = True
        else:
            mask[:n] = valid[:n]
        return jnp.asarray(out), jnp.asarray(mask)

    def _drain_one(self):
        """Fetch the oldest pending frame's results into a FrameRecord."""
        t0, n_trunc, refs = self._pending.pop(0)
        pose_q, pose_t, diag = jax.device_get(refs)
        dropped = bool(getattr(diag, "dropped", False))
        if dropped:
            self.n_dropped += 1
        rec = FrameRecord(
            pose_q=pose_q,
            pose_t=pose_t,
            n_edge_corr=int(diag.n_edge_corr),
            n_surf_corr=int(diag.n_surf_corr),
            edge_map_size=int(diag.edge_map_size),
            surf_map_size=int(diag.surf_map_size),
            ms=(time.perf_counter() - t0) * 1e3,
            overflow=np.asarray(diag.overflow),
            n_scan_trunc=n_trunc,
            contam=np.atleast_1d(np.asarray(diag.contam)),
        )
        self.records.append(rec)
        return rec

    @property
    def overflow_total(self) -> int:
        """Sum of all capacity-overflow counters over completed frames —
        a nonzero value means points were silently dropped somewhere."""
        return int(
            sum(int(np.sum(r.overflow)) + r.n_scan_trunc for r in self.records)
        )

    def flush(self) -> list:
        """Drain all pending fetches (call after the last frame in async mode)."""
        while self._pending:
            self._drain_one()
        return self.records

    def process_frame(self, xyz, valid=None, mover=None) -> Optional[FrameRecord]:
        """Feed one sensor-frame scan ([N,3] float32 + optional validity;
        ``mover`` [N] bool required iff ``provenance=True``).

        Returns the completed FrameRecord in sync mode; in async mode returns
        the record of the frame ``fetch_lag`` frames ago (or None while the
        pipeline is still filling)."""
        t0 = time.perf_counter()
        self._last_scan_trunc = 0
        if isinstance(xyz, np.ndarray):
            xyz_d, mask_d = self._pad_scan(xyz, valid)
        else:
            xyz_d = xyz
            mask_d = (
                valid
                if valid is not None
                else jnp.ones(xyz.shape[0], bool)
            )
        if self.provenance:
            feat, mgrid = self._extract(xyz_d, mask_d, mover)
        else:
            feat, mgrid = self._extract(xyz_d, mask_d), None
        if self.state is None:
            self.state = es_odometry.init_state(
                self.cfg, rg_width=3 if self.provenance else 2
            )
            self.state = self._first(self.state, feat, mgrid)
            diag = es_odometry.FrameDiag(
                n_edge_corr=jnp.asarray(0),
                n_surf_corr=jnp.asarray(0),
                edge_map_size=self.state.edge_map.valid.sum(),
                surf_map_size=self.state.surf_map.valid.sum(),
                dropped=jnp.asarray(False),
                overflow=es_odometry.zero_overflow(),
                contam=(
                    jnp.stack(
                        [
                            (self.state.edge_map.valid & (self.state.edge_map.rg[:, 2] > 0.5)).sum(),
                            (self.state.surf_map.valid & (self.state.surf_map.rg[:, 2] > 0.5)).sum(),
                        ]
                    )
                    if self.provenance
                    else jnp.asarray(0, jnp.int32)
                ),
            )
        else:
            self.state, diag = self._step(self.state, feat, mgrid)
        self._pending.append(
            (t0, self._last_scan_trunc, (self.state.pose.q, self.state.pose.t, diag))
        )
        self._n_frames += 1
        rec = None
        lag = 0 if self.sync else max(self.fetch_lag, 0)
        while len(self._pending) > lag:
            rec = self._drain_one()
        return rec

    def run(self, scans: Iterable) -> list:
        for item in scans:
            if isinstance(item, tuple):
                self.process_frame(*item)
            else:
                self.process_frame(item)
        return self.flush()

    @property
    def trajectory(self):
        self.flush()
        q = np.stack([r.pose_q for r in self.records])
        t = np.stack([r.pose_t for r in self.records])
        return q, t


@dataclass
class BPFFrameRecord:
    pose_q: np.ndarray
    pose_t: np.ndarray
    n_corr: np.ndarray  # [3] beam/pillar/facade correspondences
    map_sizes: np.ndarray  # [3]
    ms: float
    overflow: np.ndarray = None  # [3,4] per-channel counters (BPFDiag.overflow)
    n_scan_trunc: int = 0


@dataclass
class BPFPipeline:
    """End-to-end BPF odometry: ground seg -> DCVC -> PCA classify ->
    beam/pillar/facade scan-to-map GN (the reference's default launch path,
    curvedVoxel_node + odom_multi_estimation;
    ref: src/additionNode.cpp:12-54, src/odomEstimationNode.cpp:191-331)."""

    cfg: PipelineConfig
    use_ground_filter: bool = True
    use_curved_filter: bool = True
    state: object = None
    records: list = field(default_factory=list)
    sync: bool = True
    fetch_lag: int = 4
    n_dropped: int = 0

    def __post_init__(self):
        from pfilter_tpu.models import bpf_frontend, bpf_odometry

        cfg = self.cfg
        gf, cf = self.use_ground_filter, self.use_curved_filter
        self._pending: list = []

        def _frontend(xyz, mask):
            fr = bpf_frontend.run_frontend(xyz, mask, cfg, gf, cf)
            return fr.beam_mask, fr.pillar_mask, fr.facade_mask, fr.n_halo_truncated

        def _first(state, xyz, masks):
            return bpf_odometry.first_frame(state, xyz, masks, cfg)

        def _step(state, xyz, masks):
            return bpf_odometry.bpf_step(state, xyz, masks, cfg)

        self._frontend = jax.jit(_frontend)
        self._first = jax.jit(_first)
        # No donation: deferred fetches keep references to result buffers.
        self._step = jax.jit(_step)
        self._bpf = bpf_odometry

    def _pad_scan(self, xyz: np.ndarray, valid: Optional[np.ndarray]):
        cap = self.cfg.capacity.scan_points
        n = min(len(xyz), cap)
        self._last_scan_trunc = max(len(xyz) - cap, 0)
        out = np.zeros((cap, 3), np.float32)
        out[:n] = xyz[:n]
        mask = np.zeros(cap, bool)
        mask[:n] = True if valid is None else valid[:n]
        return jnp.asarray(out), jnp.asarray(mask)

    def _drain_one(self):
        t0, n_trunc, refs = self._pending.pop(0)
        pose_q, pose_t, n_corr, map_sizes, dropped, overflow, fe_trunc = jax.device_get(
            refs
        )
        if bool(dropped):
            self.n_dropped += 1
        rec = BPFFrameRecord(
            pose_q=pose_q,
            pose_t=pose_t,
            n_corr=np.asarray(n_corr),
            map_sizes=np.asarray(map_sizes),
            ms=(time.perf_counter() - t0) * 1e3,
            overflow=np.asarray(overflow),
            n_scan_trunc=n_trunc + int(fe_trunc),
        )
        self.records.append(rec)
        return rec

    @property
    def overflow_total(self) -> int:
        return int(
            sum(int(np.sum(r.overflow)) + r.n_scan_trunc for r in self.records)
        )

    def flush(self) -> list:
        while self._pending:
            self._drain_one()
        return self.records

    def process_frame(self, xyz, valid=None) -> Optional[BPFFrameRecord]:
        t0 = time.perf_counter()
        self._last_scan_trunc = 0
        if isinstance(xyz, np.ndarray):
            xyz_d, mask_d = self._pad_scan(xyz, valid)
        else:
            xyz_d = xyz
            mask_d = valid if valid is not None else jnp.ones(xyz.shape[0], bool)
        beam, pillar, facade, fe_trunc = self._frontend(xyz_d, mask_d)
        masks = {"beam": beam, "pillar": pillar, "facade": facade}
        if self.state is None:
            self.state = self._bpf.init_state(self.cfg)
            self.state = self._first(self.state, xyz_d, masks)
            refs = (
                self.state.pose.q,
                self.state.pose.t,
                jnp.zeros(3, jnp.int32),
                jnp.stack(
                    [
                        self.state.beam_map.valid.sum(),
                        self.state.pillar_map.valid.sum(),
                        self.state.facade_map.valid.sum(),
                    ]
                ),
                jnp.asarray(False),
                jnp.zeros((3, 4), jnp.int32),
                fe_trunc,
            )
        else:
            self.state, diag = self._step(self.state, xyz_d, masks)
            refs = (
                self.state.pose.q,
                self.state.pose.t,
                diag.n_corr,
                diag.map_sizes,
                diag.dropped,
                diag.overflow,
                fe_trunc,
            )
        self._pending.append((t0, self._last_scan_trunc, refs))
        rec = None
        lag = 0 if self.sync else max(self.fetch_lag, 0)
        while len(self._pending) > lag:
            rec = self._drain_one()
        return rec

    def run(self, scans: Iterable) -> list:
        for item in scans:
            if isinstance(item, tuple):
                self.process_frame(*item)
            else:
                self.process_frame(item)
        return self.flush()

    @property
    def trajectory(self):
        self.flush()
        q = np.stack([r.pose_q for r in self.records])
        t = np.stack([r.pose_t for r in self.records])
        return q, t


def make_pipeline(cfg: PipelineConfig, **kw):
    """Pipeline factory by cfg.mode ("es" | "bpf"); kwargs forwarded to both."""
    if cfg.mode == "bpf":
        return BPFPipeline(cfg=cfg, **kw)
    return ESPipeline(cfg=cfg, **kw)
