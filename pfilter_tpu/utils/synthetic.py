"""Synthetic LiDAR world simulator: ray-cast multi-beam scans with ground truth.

Replaces the reference's external data path (rosbag/kitti_tool playback,
launch/pfilter_kitti.launch:13-27) for environments without KITTI data: an
urban-corridor world of ground plane + building facades + poles is ray-cast
with an HDL-64-style beam pattern along a smooth trajectory, producing
sensor-frame scans plus ground-truth poses for drift evaluation.

Beam elevations are chosen to invert exactly through the reference's 64-beam
ring formula (src/laserProcessingClass.cpp:46-57), so feature extraction bins
them onto the intended rings.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pfilter_tpu.config import LidarConfig
from pfilter_tpu.ops import se3


class World(NamedTuple):
    """Axis-aligned world primitives (all jnp arrays)."""

    walls_x: jnp.ndarray  # [Wx, 5]: x, y0, y1, z0, z1  (plane x = const)
    walls_y: jnp.ndarray  # [Wy, 5]: y, x0, x1, z0, z1  (plane y = const)
    poles: jnp.ndarray  # [P, 4]: cx, cy, radius, height
    ground_z: float


def beam_elevations(num_lines: int) -> np.ndarray:
    """Per-ring elevation angles (degrees) that map back onto ring k through
    the reference's vertical-angle formulas."""
    if num_lines == 64:
        upper = 2.0 - np.arange(32) / 3.0
        lower = -8.87 - (np.arange(32)) / 2.0  # lands on rings 32..63
        return np.concatenate([upper, lower])
    if num_lines == 32:
        # scanID = int((angle + 92/3) * 3/4)  ->  angle = (k + 0.5) * 4/3 - 92/3
        return (np.arange(32) + 0.5) * 4.0 / 3.0 - 92.0 / 3.0
    if num_lines == 16:
        # scanID = int((angle + 15)/2 + 0.5)  ->  angle = 2k - 15
        return 2.0 * np.arange(16) - 15.0
    raise ValueError(num_lines)


def make_world(seed: int = 0, corridor_len: float = 400.0) -> World:
    """An urban corridor: two building rows with setbacks (facades + corners
    give edge features), poles, and a ground plane."""
    rng = np.random.default_rng(seed)
    walls_x, walls_y, poles = [], [], []

    # Building rows on both sides of the road (road along +x, y=0).
    for side in (-1.0, 1.0):
        x = -20.0
        while x < corridor_len + 20.0:
            w = rng.uniform(8.0, 25.0)
            depth_off = rng.uniform(7.0, 16.0)
            h = rng.uniform(4.0, 12.0)
            y_face = side * depth_off
            # Front facade (plane y = y_face over x in [x, x+w]).
            walls_y.append([y_face, x, x + w, 0.0, h])
            # Protruding ledges (awnings / eaves): narrow horizontal bands
            # well in front of the facade at fixed heights — the stable
            # horizontal line features ("beams") real urban scenes provide.
            # Tall enough (0.3 m) to catch a scan ring at range, and far
            # enough out (1.2 m) that the PCA radius-1 neighborhood never
            # mixes them with the facade behind.
            for z_l in (2.4, 4.6):
                if z_l < h - 0.5:
                    walls_y.append([y_face - side * 1.2, x, x + w, z_l, z_l + 0.3])
            # Side walls (plane x = const) — corners create edge lines.
            y_back = side * (depth_off + rng.uniform(4.0, 8.0))
            walls_x.append([x, min(y_face, y_back), max(y_face, y_back), 0.0, h])
            walls_x.append([x + w, min(y_face, y_back), max(y_face, y_back), 0.0, h])
            x += w + rng.uniform(2.0, 8.0)

    # Poles (street lamps / trunks) near the road.
    n_poles = int(corridor_len / 8)
    for _ in range(n_poles):
        px = rng.uniform(-10.0, corridor_len + 10.0)
        py = rng.choice([-1.0, 1.0]) * rng.uniform(4.0, 6.5)
        poles.append([px, py, rng.uniform(0.1, 0.25), rng.uniform(3.0, 7.0)])

    return World(
        walls_x=jnp.array(walls_x, jnp.float32),
        walls_y=jnp.array(walls_y, jnp.float32),
        poles=jnp.array(poles, jnp.float32),
        ground_z=0.0,
    )


def make_trajectory(
    n_frames: int, speed: float = 1.0, curve_amp: float = 4.0, curve_period: float = 120.0
):
    """Ground-truth poses along a gentle S-curve at sensor height 1.73 m.
    ``speed`` is meters per frame (10 Hz KITTI ~ 1-2 m/frame)."""
    s = np.arange(n_frames) * speed
    x = s
    y = curve_amp * np.sin(2 * np.pi * s / curve_period)
    dy = curve_amp * (2 * np.pi / curve_period) * np.cos(2 * np.pi * s / curve_period)
    heading = np.arctan2(dy, np.ones_like(dy))
    qs = np.stack(
        [np.cos(heading / 2), np.zeros_like(heading), np.zeros_like(heading), np.sin(heading / 2)],
        -1,
    ).astype(np.float32)
    ts = np.stack([x, y, np.full_like(x, 1.73)], -1).astype(np.float32)
    return se3.Pose(q=jnp.array(qs), t=jnp.array(ts))


def _ray_world_hits(origins, dirs, world: World, max_range: float):
    """Vectorized ray vs (ground, walls, poles). Returns hit distance t [N]
    (max_range+1 where nothing is hit)."""
    big = max_range * 2.0
    o, d = origins, dirs

    # Ground plane z = ground_z.
    tz = (world.ground_z - o[:, 2]) / jnp.where(jnp.abs(d[:, 2]) < 1e-9, 1e-9, d[:, 2])
    t_ground = jnp.where(tz > 0.1, tz, big)

    def wall_hits(vals, o_a, d_a, o_b, o_z, d_b, d_z):
        # vals: [W,5] = plane coord, b0, b1, z0, z1
        plane = vals[:, 0][None, :]
        t = (plane - o_a[:, None]) / jnp.where(jnp.abs(d_a[:, None]) < 1e-9, 1e-9, d_a[:, None])
        b = o_b[:, None] + t * d_b[:, None]
        z = o_z[:, None] + t * d_z[:, None]
        ok = (
            (t > 0.1)
            & (b >= vals[:, 1][None])
            & (b <= vals[:, 2][None])
            & (z >= vals[:, 3][None])
            & (z <= vals[:, 4][None])
        )
        return jnp.min(jnp.where(ok, t, big), axis=1)

    t_wx = wall_hits(world.walls_x, o[:, 0], d[:, 0], o[:, 1], o[:, 2], d[:, 1], d[:, 2])
    t_wy = wall_hits(world.walls_y, o[:, 1], d[:, 1], o[:, 0], o[:, 2], d[:, 0], d[:, 2])

    # Poles: |o_xy + t d_xy - c|^2 = r^2, hit if 0 <= z <= h.
    c = world.poles[:, :2]  # [P,2]
    r = world.poles[:, 2][None]
    h = world.poles[:, 3][None]
    oc = o[:, None, :2] - c[None]  # [N,P,2]
    dxy = d[:, None, :2]
    a = jnp.sum(dxy * dxy, -1)
    bq = 2 * jnp.sum(oc * dxy, -1)
    cq = jnp.sum(oc * oc, -1) - r * r
    disc = bq * bq - 4 * a * cq
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-bq - sq) / jnp.maximum(2 * a, 1e-9)
    z1 = o[:, None, 2] + t1 * d[:, None, 2]
    ok = (disc > 0) & (t1 > 0.1) & (z1 >= 0.0) & (z1 <= h)
    t_pole = jnp.min(jnp.where(ok, t1, big), axis=1)

    return jnp.minimum(jnp.minimum(t_ground, jnp.minimum(t_wx, t_wy)), t_pole)


def render_scan(
    pose: se3.Pose,
    world: World,
    lidar: LidarConfig,
    n_azimuth: int,
    noise: float = 0.01,
    seed: int = 0,
):
    """Ray-cast one scan.  Returns (xyz_sensor [R*A, 3], valid [R*A]) in
    ring-major order (matching the within-ring azimuth ordering the feature
    extractor expects)."""
    elev = jnp.array(np.radians(beam_elevations(lidar.num_lines)), jnp.float32)
    az = jnp.array(
        np.linspace(0, 2 * np.pi, n_azimuth, endpoint=False).astype(np.float32)
    )
    ce, se_ = jnp.cos(elev), jnp.sin(elev)
    ca, sa = jnp.cos(az), jnp.sin(az)
    # [R, A, 3] sensor-frame directions, ring-major.
    dirs_sensor = jnp.stack(
        [
            ce[:, None] * ca[None, :],
            ce[:, None] * sa[None, :],
            jnp.broadcast_to(se_[:, None], (elev.shape[0], n_azimuth)),
        ],
        -1,
    ).reshape(-1, 3)

    dirs_world = se3.quat_rotate(pose.q, dirs_sensor)
    origins = jnp.broadcast_to(pose.t, dirs_world.shape)
    t = _ray_world_hits(origins, dirs_world, world, lidar.max_distance)

    key = jax.random.PRNGKey(seed)
    t = t + jax.random.normal(key, t.shape) * noise
    # Planar (xy) distance gate mirrors the feature extractor's (ref :25-26).
    pts_sensor = dirs_sensor * t[:, None]
    planar = jnp.sqrt(pts_sensor[:, 0] ** 2 + pts_sensor[:, 1] ** 2)
    valid = (t > lidar.min_distance) & (t < lidar.max_distance) & (planar > lidar.min_distance)
    return pts_sensor, valid


def render_sequence(
    world: World,
    poses: se3.Pose,
    lidar: LidarConfig,
    n_azimuth: int,
    noise: float = 0.01,
):
    """Render all frames (jit + scan).  Returns (xyz [F, R*A, 3], valid [F, R*A])."""

    @jax.jit
    def one(i):
        pose = se3.Pose(q=poses.q[i], t=poses.t[i])
        return render_scan(pose, world, lidar, n_azimuth, noise=noise, seed=i)

    n = poses.t.shape[0]
    xs, vs = [], []
    for i in range(n):
        x, v = one(i)
        xs.append(x)
        vs.append(v)
    return jnp.stack(xs), jnp.stack(vs)
