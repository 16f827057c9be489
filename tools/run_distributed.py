"""Multi-host sharded odometry entry point — ``jax.distributed`` over DCN.

The reference scales across processes with a ROS node graph (TCPROS pub/sub,
src/laserProcessingNode.cpp:136-144); the TPU-native equivalent is JAX's
multi-controller runtime: every host runs THIS script with the same program,
``jax.distributed.initialize`` wires the processes into one global device
mesh, and the sharded step (pfilter_tpu/parallel/es_sharded.py) runs with
its map axis spanning hosts — kNN merges ride all_gather over ICI/DCN and
the 6x6 GN normal equations psum across every chip in the fleet.

Launch (one command per host; TPU pods auto-discover, CPU/GPU need flags):

  # host 0                                     # host 1
  python tools/run_distributed.py \\           python tools/run_distributed.py \\
    --coordinator 10.0.0.1:8476 \\               --coordinator 10.0.0.1:8476 \\
    --num-processes 2 --process-id 0             --num-processes 2 --process-id 1

On a Cloud TPU pod slice, omit the three flags: ``jax.distributed.initialize()``
reads the TPU metadata and forms the mesh automatically.

``--platform cpu`` runs the same code path with per-process virtual CPU
devices — the 2-process CI test (tests/test_distributed.py) proves the
sharded step executes across real process boundaries without a pod.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None, help="host:port of process 0")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--platform", default=None, choices=(None, "cpu", "tpu"))
    ap.add_argument("--devices-per-process", type=int, default=4, help="cpu only")
    ap.add_argument("--n-map", type=int, default=0, help="map shards (0 = all devices)")
    ap.add_argument("--n-seq", type=int, default=1)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--scan-points", type=int, default=8192)
    args = ap.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices_per_process}"
        ).strip()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        jax.distributed.initialize()  # TPU pod auto-discovery

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pfilter_tpu.config import CapacityConfig, LidarConfig, OdometryConfig, PipelineConfig
    from pfilter_tpu.parallel import es_sharded, mesh as meshlib
    from pfilter_tpu.utils import synthetic

    devices = jax.devices()
    n_map = args.n_map or (len(devices) // args.n_seq)
    mesh = meshlib.make_mesh(args.n_seq, n_map, devices)
    if jax.process_index() == 0:
        print(
            f"mesh: {args.n_seq} seq x {n_map} map over {len(devices)} devices, "
            f"{jax.process_count()} processes",
            flush=True,
        )

    cfg = PipelineConfig(
        lidar=LidarConfig(num_lines=16, min_distance=1.0, max_distance=60.0),
        odometry=OdometryConfig(map_resolution=0.4, max_outer_iters=4),
        capacity=CapacityConfig(
            scan_points=args.scan_points,
            ring_points=512,
            edge_points=1024,
            surf_points=args.scan_points,
            ds_edge_points=1024,
            ds_surf_points=4096,
            edge_map_points=8192 * max(n_map, 1),
            surf_map_points=32768 * max(n_map, 1),
            # grid impl on CPU (no Mosaic across hosts there); tiled on TPU.
            knn_impl="grid" if jax.default_backend() == "cpu" else "tiled",
        ),
    )

    # Build the state directly into its global sharding: each process
    # materializes only its addressable shards.
    state_sharding = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), es_sharded.state_specs(cfg)
    )
    state = jax.jit(
        lambda: es_sharded.init_sharded_state(cfg, args.n_seq, n_map),
        out_shardings=state_sharding,
    )()

    first = es_sharded.make_sharded_step(cfg, mesh, first=True)
    step = es_sharded.make_sharded_step(cfg, mesh, first=False)

    # Synthetic scan stream — rendered identically on every process (the
    # input is replicated over the map axis; seq rows all get the same scan
    # in this smoke entry).
    world = synthetic.make_world(seed=3, corridor_len=50.0)
    poses = synthetic.make_trajectory(args.frames, speed=0.5)
    in_shard_x = NamedSharding(mesh, P("seq", None, None))
    in_shard_m = NamedSharding(mesh, P("seq", None))

    def global_input(x, sharding):
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    t0 = time.perf_counter()
    for i in range(args.frames):
        xyz, valid = synthetic.render_scan(
            synthetic.se3.Pose(q=poses.q[i], t=poses.t[i]),
            world,
            cfg.lidar,
            n_azimuth=512,
            noise=0.005,
            seed=i,
        )
        cap = cfg.capacity.scan_points
        n = min(xyz.shape[0], cap)
        xb = np.zeros((args.n_seq, cap, 3), np.float32)
        mb = np.zeros((args.n_seq, cap), bool)
        xb[:, :n] = np.asarray(xyz)[:n]
        mb[:, :n] = np.asarray(valid)[:n]
        xg = global_input(xb, in_shard_x)
        mg = global_input(mb, in_shard_m)
        state, diag = (first if i == 0 else step)(state, xg, mg)
    # Every process holds the (map-replicated) pose for its seq rows; gather
    # scalars through the supported multihost path.
    from jax.experimental import multihost_utils

    pose_t = multihost_utils.process_allgather(state.pose.t, tiled=True)
    wall = time.perf_counter() - t0
    if jax.process_index() == 0:
        pt = np.asarray(pose_t).reshape(-1, 3)[0]
        assert np.all(np.isfinite(pt)), pt
        print(
            json.dumps(
                {
                    "distributed": "ok",
                    "processes": jax.process_count(),
                    "devices": len(devices),
                    "n_map": n_map,
                    "frames": args.frames,
                    "wall_s": round(wall, 2),
                    "pose_t0": [round(float(v), 4) for v in pt],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
