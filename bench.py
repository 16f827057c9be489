"""Benchmark: ES odometry frames/sec + KITTI-protocol drift on a synthetic
HDL-64 city circuit.

The reference's headline budget is real-time 10 Hz HDL-64 odometry
(launch/pfilter_kitti.launch:55, BASELINE.md).  No KITTI data ships in this
environment, so the bench ray-casts a KITTI-like city-block world — building
facades with eave ledges, corner walls, poles, foliage clutter, and *moving*
box objects (dynamic outliers) — and drives a ~1 km loop with 90-degree
turns.  Drift is scored with the official KITTI odometry protocol (segment
lengths 100..800 m, start every 10 frames), matching how the reference's
0.7833% baseline was computed.

Prints ONE JSON line:
  {"metric": "frames_per_sec_es64", "value": <fps>, "unit": "fps",
   "vs_baseline": <fps/10.0>, ...extras}
"""

import argparse
import json
import os
import time

import numpy as np

# Persistent XLA compilation cache, kept in-repo: compile+warmup of the full
# pipeline costs minutes cold, but the cache (pre-warmed by any prior run on
# the same machine, including test/dev runs this session) makes it seconds.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")

# Pinned measurement protocol (VERDICT r3 #10: numbers must compare across
# rounds).  Any CLI deviation from these values is flagged in the output as
# "protocol_deviation" so a run under different settings can't be silently
# compared against a pinned-protocol baseline.  Methodology (recorded here
# per ADVICE r3): scan rendering is PRE-COMPUTED outside the timed loop
# (input generation is not part of the odometry system under test — the
# reference replays a recorded rosbag); fps is steady-state frames over
# steady-state wall seconds, warmup excluded.
#
# v2 (round 5): the run extends to 850 frames (~1.15 km) so drift can be
# scored at the OFFICIAL KITTI segment lengths 100-800 m
# (ref: /root/reference/runkitti.py:111-157) — reported as
# drift_t_pct_full_protocol.  The headline drift_t_pct stays the pinned v1
# protocol (lengths 100-300 m scored over the first 300 frames, whose
# trajectory prefix is bit-identical to the r2-r4 runs) so rounds compare.
# The ES run is followed by a BPF segment over the first `bpf_frames` frames
# (the reference's *default* launch pipeline,
# ref: launch/pfilter_kitti.launch:5-10), embedding bpf_fps /
# bpf_drift_t_pct in the same driver-captured JSON line (VERDICT r4 #2).
PROTOCOL = {
    "frames": 850,
    "warmup": 10,
    "speed_m_per_frame": 1.5,
    "azimuth": 1800,
    "lengths_m": (100, 200, 300),  # pinned v1, scored on the first v1_frames
    "v1_frames": 300,
    "full_lengths_m": (100, 200, 300, 400, 500, 600, 700, 800),
    "bpf_frames": 300,  # embedded BPF segment runs the v1 protocol
    "render_outside_timed_loop": True,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=PROTOCOL["frames"])
    ap.add_argument("--azimuth", type=int, default=1800)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument(
        "--no-bpf",
        action="store_true",
        help="skip the embedded BPF segment after the ES run",
    )
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    ap.add_argument("--speed", type=float, default=1.5, help="meters per frame")
    ap.add_argument(
        "--budget-s",
        type=float,
        default=420.0,
        help="wall-clock budget: the steady loop stops early if the next "
        "frame would not fit (compile latency over the device tunnel is "
        "highly variable; a partial run with a JSON line beats a timeout)",
    )
    ap.add_argument(
        "--mode",
        default="es",
        choices=("es", "bpf"),
        help="es = ring-feature pipeline (headline metric); bpf = "
        "ground-seg/DCVC/PCA beam-pillar-facade pipeline",
    )
    ap.add_argument("--set", action="append", default=[], help="dotted config override k=v")
    ap.add_argument(
        "--compile-only",
        action="store_true",
        help="lower + compile every jitted program the bench runs (renderer, "
        "extract/frontend, first, step) and exit with compile timings — "
        "populates/validates the persistent .jax_cache without a full run "
        "(see tools/check_bench_cache.py)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pfilter_tpu.config import apply_dotted_overrides, kitti_config
    from pfilter_tpu.pipeline import BPFPipeline, ESPipeline
    from pfilter_tpu.utils import metrics, synthetic

    cfg = kitti_config()
    if args.set:
        cfg = apply_dotted_overrides(cfg, args.set)
    world = synthetic.make_city_world(seed=7)
    poses = synthetic.make_loop_trajectory(args.frames, speed=args.speed)

    t_wall0 = time.perf_counter()

    # Progress record: mirrored to the status file so the supervising parent
    # (see __main__) can emit an honest partial JSON line if this worker has
    # to be killed mid-stall — device stalls happen inside GIL-holding C
    # calls, so no in-process watchdog can fire.
    partial = {
        "metric": f"frames_per_sec_{args.mode}64",
        "value": 0.0,
        "unit": "fps",
        "vs_baseline": 0.0,
        "partial": "watchdog",
        "phase": "startup",
        "frames": 0,
        "frames_requested": args.frames,
    }
    status_path = os.environ.get("PFILTER_BENCH_STATUS")

    def _sync_partial():
        if status_path:
            tmp = status_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(partial, f)
            os.replace(tmp, status_path)

    import sys

    def log(msg):
        print(f"[bench +{time.perf_counter() - t_wall0:7.1f}s] {msg}", file=sys.stderr, flush=True)
        _sync_partial()

    # Pre-render the whole sequence on device, OUTSIDE the timed loop —
    # input generation is not part of the odometry system being measured
    # (the reference replays a recorded rosbag).  One jitted per-frame
    # program, dispatched for every frame up front; results stay on device
    # (~1.6 MB/frame of HBM, ~470 MB at 300 frames).
    cap = cfg.capacity.scan_points

    @jax.jit
    def render_one(q, t, i):
        xyz, valid = synthetic.render_scan(
            synthetic.se3.Pose(q=q, t=t),
            world,
            cfg.lidar,
            args.azimuth,
            noise=0.008,
            seed=0,
            t_time=i,
        )
        n = xyz.shape[0]
        if n >= cap:  # ADVICE r3: truncate, never a negative pad
            return xyz[:cap], valid[:cap]
        return (
            jnp.pad(xyz, ((0, cap - n), (0, 0))),
            jnp.pad(valid, (0, cap - n)),
        )

    if args.compile_only:
        _compile_only(args, cfg, render_one, poses, t_wall0)
        return

    log("tracing renderer")
    _lowered = render_one.lower(poses.q[0], poses.t[0], jnp.float32(0))
    log("compiling renderer")
    _compiled = _lowered.compile()
    log("running first render")
    frames_dev = [render_one(poses.q[0], poses.t[0], jnp.float32(0))]
    frames_dev[0][0].block_until_ready()
    log("renderer compiled; rendering sequence")
    frames_dev += [
        render_one(poses.q[i], poses.t[i], jnp.float32(i))
        for i in range(1, args.frames)
    ]
    frames_dev[-1][0].block_until_ready()
    t_render = time.perf_counter() - t_wall0
    partial["phase"] = "warmup"
    log(f"rendered {args.frames} frames")

    # Async host loop: dispatch runs ahead of the device, diagnostics are
    # fetched with a lag — per-frame wall time is pure device throughput,
    # with host work and tunnel round trips hidden behind compute.
    if args.mode == "bpf":
        pipe = BPFPipeline(cfg=cfg.replace(mode="bpf"), sync=False, fetch_lag=4)
    else:
        pipe = ESPipeline(cfg=cfg, sync=False, fetch_lag=4)

    def feed(i):
        pipe.process_frame(*frames_dev[i])

    # Fine-grained warmup logging: compile + program-load times over the
    # device tunnel are highly variable (measured 51s..299s for the same
    # cache-resident programs), so each phase gets its own timestamped line
    # — when a driver run dies in warmup, the log says which phase ate the
    # budget.
    feed(0)  # extract + first-frame compile/load
    log("first frame done (extract+init compiled)")
    feed(1)  # step compile/load
    pipe.flush()
    log("first step done (step compiled+loaded)")
    if args.warmup > 2:
        feed(2)  # second step layout-variant compile (if any)
        pipe.flush()
        log("second step done")
    for i in range(3, args.warmup):
        feed(i)
    pipe.flush()  # fill; steady-state timing starts clean
    partial["phase"] = "steady"
    log("warmup done; steady loop")
    t_steady0 = time.perf_counter()
    n_done = args.warmup
    for i in range(args.warmup, args.frames):
        feed(i)
        n_done = i + 1
        # Budget guard: leave ~15% of the remaining budget for drain + eval.
        if (i - args.warmup + 1) % 25 == 0:
            el_steady = time.perf_counter() - t_steady0
            partial.update(
                frames=n_done,
                value=round((n_done - args.warmup) / max(el_steady, 1e-9), 3),
            )
            partial["vs_baseline"] = round(partial["value"] / 10.0, 3)
            _sync_partial()
            if time.perf_counter() - t_wall0 > args.budget_s * 0.85:
                break
    pipe.flush()
    partial["phase"] = "eval"
    log(f"steady loop done ({n_done} frames); scoring")
    steady_s = time.perf_counter() - t_steady0
    n_steady = n_done - args.warmup
    steady = np.array([steady_s / n_steady * 1e3])
    fps = n_steady / steady_s
    poses = synthetic.se3.Pose(q=poses.q[:n_done], t=poses.t[:n_done])

    # Drift vs ground truth (relative to first frame).  Two protocols:
    #  - v1 (headline drift_t_pct): pinned lengths 100-300 m scored over the
    #    first v1_frames — bit-comparable with rounds 2-4,
    #  - full: the official KITTI lengths 100-800 m over the whole run
    #    (ref: /root/reference/runkitti.py:111-157).
    q, t = pipe.trajectory
    gt = metrics.poses_to_matrices(np.asarray(poses.q), np.asarray(poses.t))
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    est = metrics.poses_to_matrices(q, t)
    path_len = metrics.trajectory_distances(gt)[-1]

    def scored(gt_n, est_n, proto_lengths):
        pl = metrics.trajectory_distances(gt_n)[-1]
        ls = tuple(float(l) for l in proto_lengths if l <= pl * 0.8) or (50.0, 100.0)
        d = metrics.kitti_drift(gt_n, est_n, lengths=ls, step=10)
        if d["n_segments"] == 0:
            # A severely truncated run affords no segments; NaN here would
            # make json.dumps emit invalid JSON for the driver.
            d = dict(d, t_err_pct=-1.0, r_err_deg_per_m=-1.0)
        return d, ls

    n_v1 = min(int(PROTOCOL["v1_frames"]), n_done)
    drift, lengths = scored(gt[:n_v1], est[:n_v1], PROTOCOL["lengths_m"])
    drift_full, lengths_full = scored(gt, est, PROTOCOL["full_lengths_m"])
    ate = metrics.ate_rmse(gt, est)

    deviation = (
        args.frames != PROTOCOL["frames"]
        or args.warmup != PROTOCOL["warmup"]
        or args.speed != PROTOCOL["speed_m_per_frame"]
        or args.azimuth != PROTOCOL["azimuth"]
        or n_done != args.frames
        or list(lengths) != [float(l) for l in PROTOCOL["lengths_m"]]
        or bool(args.set)
    )

    result = {
        "metric": f"frames_per_sec_{args.mode}64",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 10.0, 3),
        "mean_ms_per_frame": round(float(np.mean(steady)), 3),
        "drift_t_pct": round(drift["t_err_pct"], 4),
        "drift_r_deg_per_m": round(drift["r_err_deg_per_m"], 6),
        "drift_t_pct_full_protocol": round(drift_full["t_err_pct"], 4),
        "drift_r_full_protocol": round(drift_full["r_err_deg_per_m"], 6),
        "full_protocol_lengths_m": [int(l) for l in lengths_full],
        "full_protocol_n_segments": drift_full["n_segments"],
        "ate_rmse_m": round(ate, 4),
        "frames": n_done,
        "frames_requested": args.frames,
        "render_wall_s": round(t_render, 2),
        "path_len_m": round(float(path_len), 1),
        "protocol_lengths_m": [int(l) for l in lengths],
        "bench_protocol": {k: list(v) if isinstance(v, tuple) else v for k, v in PROTOCOL.items()},
        "protocol_deviation": deviation,
        "n_segments": drift["n_segments"],
        "n_frames_dropped": pipe.n_dropped,
        "overflow_total": pipe.overflow_total,
        "device": str(jax.devices()[0]),
    }
    # Per-lane overflow breakdown (lane names: es_odometry.OVERFLOW_LANES
    # for ES; [channel][compact, ds, merge, tile] rows for BPF) — a nonzero
    # total must say WHERE points were dropped.
    ovs = [r.overflow for r in pipe.records if r.overflow is not None]
    if ovs:
        per_lane = np.stack(ovs).sum(axis=0)
        if args.mode == "es":
            from pfilter_tpu.models.es_odometry import OVERFLOW_LANES

            result["overflow_lanes"] = {
                name: int(v) for name, v in zip(OVERFLOW_LANES, per_lane) if v
            }
        else:
            result["overflow_lanes"] = per_lane.tolist()
    if args.mode == "es":
        result["surf_map_size"] = pipe.records[-1].surf_map_size
        result["edge_map_size"] = pipe.records[-1].edge_map_size
        # Peak occupancy over the run — what the capacities must actually
        # hold (final size alone hid the mid-loop edge peak that overflowed
        # the r4 cap on the v2 850-frame protocol).
        result["edge_map_peak"] = max(r.edge_map_size for r in pipe.records)
        result["surf_map_peak"] = max(r.surf_map_size for r in pipe.records)
    else:
        result["map_sizes"] = [int(x) for x in pipe.records[-1].map_sizes]

    # Embedded BPF segment (VERDICT r4 #2): the reference's default launch
    # path must appear in the driver-captured artifact, not just in commit
    # messages.  Runs the v1 protocol over the first bpf_frames frames.  The
    # partial-status file is updated with the full ES result first, so a
    # budget kill during the BPF phase still ships the ES numbers.
    run_bpf = args.mode == "es" and not args.no_bpf
    if run_bpf:
        partial.clear()
        partial.update(result)
        partial["phase"] = "bpf"
        partial["partial"] = "watchdog"
        remaining = args.budget_s - (time.perf_counter() - t_wall0)
        if remaining < 150.0:
            result["bpf_skipped"] = f"budget ({remaining:.0f}s left)"
            log(f"skipping BPF segment ({remaining:.0f}s of budget left)")
        else:
            log("ES done; starting BPF segment")
            n_bpf = min(int(PROTOCOL["bpf_frames"]), n_done)
            bpipe = BPFPipeline(cfg=cfg.replace(mode="bpf"), sync=False, fetch_lag=4)

            def bfeed(i):
                bpipe.process_frame(*frames_dev[i])

            bfeed(0)
            log("bpf first frame done (frontend+init compiled)")
            bfeed(1)
            bpipe.flush()
            log("bpf first step done")
            for i in range(2, args.warmup):
                bfeed(i)
            bpipe.flush()
            log("bpf warmup done; steady loop")
            t_b0 = time.perf_counter()
            nb_done = args.warmup
            for i in range(args.warmup, n_bpf):
                bfeed(i)
                nb_done = i + 1
                if (i - args.warmup + 1) % 25 == 0:
                    if time.perf_counter() - t_wall0 > args.budget_s * 0.92:
                        break
            bpipe.flush()
            b_steady = time.perf_counter() - t_b0
            bq, bt = bpipe.trajectory
            best = metrics.poses_to_matrices(bq, bt)
            bdrift, blengths = scored(
                gt[:nb_done], best[:nb_done], PROTOCOL["lengths_m"]
            )
            result.update(
                bpf_fps=round((nb_done - args.warmup) / b_steady, 3),
                bpf_drift_t_pct=round(bdrift["t_err_pct"], 4),
                bpf_drift_r_deg_per_m=round(bdrift["r_err_deg_per_m"], 6),
                bpf_ate_rmse_m=round(metrics.ate_rmse(gt[:nb_done], best[:nb_done]), 4),
                bpf_frames=nb_done,
                bpf_protocol_lengths_m=[int(l) for l in blengths],
                bpf_overflow_total=bpipe.overflow_total,
                bpf_n_dropped=bpipe.n_dropped,
                bpf_map_sizes=[int(x) for x in bpipe.records[-1].map_sizes],
            )
            log(
                f"bpf segment done: {result['bpf_fps']} fps, "
                f"drift {result['bpf_drift_t_pct']}%"
            )

    result["total_wall_s"] = round(time.perf_counter() - t_wall0, 2)
    print(json.dumps(result), flush=True)


def _compile_only(args, cfg, render_one, poses, t_wall0):
    """Lower + compile every jitted program the bench dispatches, without
    running the frame loop.  Abstract (ShapeDtypeStruct) lowering builds the
    exact same HLO the real run traces, so the persistent-cache entries it
    reads/writes are the ones the driver's bench run will need — this is the
    round-closing cache-residency check (VERDICT r3 #1c) and the cold-compile
    timing probe (VERDICT r3 #2) in one."""
    import sys

    import jax
    import jax.numpy as jnp

    from pfilter_tpu.pipeline import BPFPipeline, ESPipeline

    timings = {}

    def clock(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 2)
        print(f"[compile {name}: {timings[name]}s]", file=sys.stderr, flush=True)
        return out

    clock("render", lambda: render_one.lower(poses.q[0], poses.t[0], jnp.float32(0)).compile())

    cap = cfg.capacity.scan_points
    xyz_s = jax.ShapeDtypeStruct((cap, 3), jnp.float32)
    mask_s = jax.ShapeDtypeStruct((cap,), jnp.bool_)

    if args.mode == "bpf":
        pipe = BPFPipeline(cfg=cfg.replace(mode="bpf"), sync=False, fetch_lag=4)
        state_s = jax.eval_shape(lambda: pipe._bpf.init_state(pipe.cfg))
        fe_s = jax.eval_shape(pipe._frontend, xyz_s, mask_s)
        masks_s = {"beam": fe_s[0], "pillar": fe_s[1], "facade": fe_s[2]}
        clock("frontend", lambda: pipe._frontend.lower(xyz_s, mask_s).compile())
        clock("first", lambda: pipe._first.lower(state_s, xyz_s, masks_s).compile())
        clock("step", lambda: pipe._step.lower(state_s, xyz_s, masks_s).compile())
    else:
        from pfilter_tpu.models import es_odometry

        pipe = ESPipeline(cfg=cfg, sync=False, fetch_lag=4)
        state_s = jax.eval_shape(lambda: es_odometry.init_state(pipe.cfg))
        feat_s = jax.eval_shape(pipe._extract, xyz_s, mask_s)
        clock("extract", lambda: pipe._extract.lower(xyz_s, mask_s).compile())
        clock("first", lambda: pipe._first.lower(state_s, feat_s).compile())
        clock("step", lambda: pipe._step.lower(state_s, feat_s).compile())

    print(
        json.dumps(
            {
                "metric": f"compile_wall_s_{args.mode}",
                "value": round(time.perf_counter() - t_wall0, 2),
                "unit": "s",
                "vs_baseline": 0.0,
                "compile_only": True,
                "timings_s": timings,
            }
        ),
        flush=True,
    )


def supervise():
    """Parent mode: run main() in a worker subprocess under a hard wall-clock
    budget.  Device stalls freeze the worker inside GIL-holding C calls, so
    the budget must be enforced from outside: on timeout the worker (exact
    PID) is killed and the last status-file snapshot is printed as a partial
    result — the driver always gets ONE parsed JSON line."""
    import subprocess
    import sys
    import tempfile

    budget = 420.0
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--budget-s" and i + 1 < len(argv):
            budget = float(argv[i + 1])
        elif a.startswith("--budget-s="):
            budget = float(a.split("=", 1)[1])

    fd, status_path = tempfile.mkstemp(prefix="pfilter_bench_", suffix=".json")
    os.close(fd)
    env = dict(os.environ)
    env["PFILTER_BENCH_WORKER"] = "1"
    env["PFILTER_BENCH_STATUS"] = status_path
    proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)] + argv, env=env)

    def emit_partial(reason):
        try:
            with open(status_path) as f:
                partial = json.load(f)
        except Exception:
            partial = {
                "metric": "frames_per_sec_es64",
                "value": 0.0,
                "unit": "fps",
                "vs_baseline": 0.0,
                "phase": "startup",
            }
        partial["partial"] = reason
        print(json.dumps(partial), flush=True)

    try:
        rc = proc.wait(timeout=budget + 120.0)
        if rc != 0:
            emit_partial(f"worker_rc_{rc}")
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        emit_partial("killed_at_budget")
    finally:
        try:
            os.unlink(status_path)
        except OSError:
            pass


if __name__ == "__main__":
    if os.environ.get("PFILTER_BENCH_WORKER"):
        main()
    else:
        supervise()
