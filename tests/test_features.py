"""Tests for ring feature extraction (pfilter_tpu.ops.features).

Strategy (SURVEY.md §4): a direct sequential numpy transcription of the
reference's pick-and-suppress semantics (src/laserProcessingClass.cpp:99-209)
serves as the golden model; the vectorized TPU kernel must select the same
edge/surf sets on random data (ties are measure-zero with random floats).

Known modeled divergences from the C++ (documented in the kernel docstring):
full sector coverage, and no 21st-pick tombstone.
"""

import jax.numpy as jnp
import numpy as np

from pfilter_tpu.config import CapacityConfig, FeatureConfig, LidarConfig
from pfilter_tpu.ops import features


def _seq_extract_ring(pts, feat: FeatureConfig):
    """Sequential golden model for one ring. Returns (edge_ids, surf_ids)."""
    n = len(pts)
    h = feat.curvature_half_window
    edges, surfs = [], []
    if n < feat.min_ring_points:
        return edges, surfs
    curv = {}
    for j in range(h, n - h):
        d = pts[j - h : j + h + 1].sum(0) - (2 * h + 1) * pts[j]
        curv[j] = float(d @ d)
    total = n - 2 * h
    L = max(total // feat.num_sectors, 1)

    def gapsq(a, b):
        d = pts[a] - pts[b]
        return float(d @ d)

    for s in range(feat.num_sectors):
        ids = [
            j
            for j in range(h, n - h)
            if min((j - h) // L, feat.num_sectors - 1) == s
        ]
        picked = set()
        cnt = 0
        for j in sorted(ids, key=lambda j: -curv[j]):
            if j in picked:
                continue
            if curv[j] <= feat.edge_curvature_threshold:
                break
            if cnt >= feat.max_edge_per_sector:
                break
            cnt += 1
            edges.append(j)
            picked.add(j)
            for k in range(1, feat.suppression_radius + 1):
                if j + k >= n or gapsq(j + k, j + k - 1) > feat.suppression_gap_sq:
                    break
                picked.add(j + k)
            for k in range(1, feat.suppression_radius + 1):
                if j - k < 0 or gapsq(j - k, j - k + 1) > feat.suppression_gap_sq:
                    break
                picked.add(j - k)
        for j in ids:
            if j not in picked:
                surfs.append(j)
    return edges, surfs


def _make_scan(rng, n_rings=4, ring_len=400, cap=None):
    """Synthetic multi-ring scan: smooth arcs with occasional spikes so both
    edges (high curvature) and surfaces (smooth) occur."""
    pts, rings = [], []
    lidar = LidarConfig(num_lines=16, min_distance=0.5, max_distance=200.0)
    for r in range(n_rings):
        az = np.linspace(0, 2 * np.pi, ring_len, endpoint=False)
        radius = 10.0 + 0.3 * np.sin(az * 3 + r) + rng.normal(size=ring_len) * 0.01
        spikes = rng.random(ring_len) < 0.02
        radius = radius + spikes * rng.uniform(1.0, 3.0, ring_len)
        z_angle_deg = -15.0 + 2.0 * r  # lands exactly on ring r for 16-beam rule
        zr = np.tan(np.radians(z_angle_deg))
        ring_pts = np.stack(
            [radius * np.cos(az), radius * np.sin(az), radius * zr], -1
        ).astype(np.float32)
        pts.append(ring_pts)
        rings.append(r)
    return lidar, rings, pts


def test_ring_ids_formulas():
    """Ring binning formulas vs direct transcription (ref: :22-64)."""
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-50, 50, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    for n in (16, 32, 64):
        lidar = LidarConfig(num_lines=n, min_distance=3.0, max_distance=90.0)
        ring, valid = features.ring_ids(jnp.array(xyz), jnp.array(mask), lidar)
        ring, valid = np.asarray(ring), np.asarray(valid)
        for i in range(500):
            d = np.sqrt(xyz[i, 0] ** 2 + xyz[i, 1] ** 2)
            if d < 3.0 or d > 90.0:
                assert not valid[i]
                continue
            ang = np.degrees(np.arctan(xyz[i, 2] / d))
            if n == 16:
                sid = int((ang + 15) / 2 + 0.5)
                ok = 0 <= sid <= n - 1
            elif n == 32:
                sid = int((ang + 92.0 / 3.0) * 3.0 / 4.0)
                ok = 0 <= sid <= n - 1
            else:
                sid = (
                    int((2 - ang) * 3.0 + 0.5)
                    if ang >= -8.83
                    else n // 2 + int((-8.83 - ang) * 2.0 + 0.5)
                )
                ok = not (ang > 2 or ang < -24.33 or sid > 63 or sid < 0)
            assert valid[i] == ok, (n, i)
            if ok:
                assert ring[i] == sid, (n, i)


def test_bin_rings_preserves_order():
    rng = np.random.default_rng(1)
    lidar, ring_ids_gt, ring_pts = _make_scan(rng)
    # Interleave rings in firing order (like a real sweep).
    order = rng.permutation(sum(len(p) for p in ring_pts))
    flat = np.concatenate(ring_pts)
    ring_of = np.concatenate([[r] * len(p) for r, p in zip(ring_ids_gt, ring_pts)])
    flat, ring_of = flat[order], ring_of[order]

    cap = CapacityConfig(scan_points=flat.shape[0], ring_points=512)
    grid = features.bin_rings(jnp.array(flat), jnp.ones(len(flat), bool), lidar, cap)
    for r in range(len(ring_pts)):
        n = int(grid.length[r])
        got = np.asarray(grid.xyz[r, :n])
        expect = flat[ring_of == r]  # original order within the ring
        np.testing.assert_allclose(got, expect[:n], atol=1e-6)
        assert bool(np.all(np.asarray(grid.valid[r, :n])))
        assert not bool(np.any(np.asarray(grid.valid[r, n:])))


def test_extract_matches_sequential_model():
    rng = np.random.default_rng(2)
    lidar, ring_ids_gt, ring_pts = _make_scan(rng, n_rings=4, ring_len=400)
    feat = FeatureConfig()
    cap = CapacityConfig(scan_points=4096, ring_points=512)

    flat = np.concatenate(ring_pts).astype(np.float32)
    pad = np.zeros((cap.scan_points - len(flat), 3), np.float32)
    xyz = np.concatenate([flat, pad])
    mask = np.zeros(cap.scan_points, bool)
    mask[: len(flat)] = True

    res = features.extract_features(jnp.array(xyz), jnp.array(mask), lidar, feat, cap)
    edge_mask = np.asarray(res.edge_mask).reshape(lidar.num_lines, cap.ring_points)
    surf_mask = np.asarray(res.surf_mask).reshape(lidar.num_lines, cap.ring_points)

    for r, pts in zip(ring_ids_gt, ring_pts):
        e_gt, s_gt = _seq_extract_ring(pts, feat)
        got_e = set(np.nonzero(edge_mask[r])[0].tolist())
        got_s = set(np.nonzero(surf_mask[r])[0].tolist())
        assert got_e == set(e_gt), f"ring {r} edge mismatch"
        assert got_s == set(s_gt), f"ring {r} surf mismatch"


def test_edge_cap_per_sector():
    """Never more than 20 edges per (ring, sector)."""
    rng = np.random.default_rng(3)
    lidar, _, ring_pts = _make_scan(rng, n_rings=2, ring_len=450)
    # Make everything spiky so the cap binds.
    ring_pts = [p + rng.normal(size=p.shape).astype(np.float32) * 0.5 for p in ring_pts]
    feat = FeatureConfig()
    cap = CapacityConfig(scan_points=2048, ring_points=512)
    flat = np.concatenate(ring_pts).astype(np.float32)
    xyz = np.zeros((cap.scan_points, 3), np.float32)
    xyz[: len(flat)] = flat
    mask = np.zeros(cap.scan_points, bool)
    mask[: len(flat)] = True
    res = features.extract_features(jnp.array(xyz), jnp.array(mask), lidar, feat, cap)
    edge = np.asarray(res.edge_mask).reshape(lidar.num_lines, cap.ring_points)
    grid = features.bin_rings(jnp.array(xyz), jnp.array(mask), lidar, cap)
    h = feat.curvature_half_window
    for r in range(lidar.num_lines):
        n = int(grid.length[r])
        if n < feat.min_ring_points:
            assert edge[r].sum() == 0
            continue
        L = max((n - 2 * h) // feat.num_sectors, 1)
        ids = np.nonzero(edge[r])[0]
        sectors = np.minimum((ids - h) // L, feat.num_sectors - 1)
        for s in range(feat.num_sectors):
            assert (sectors == s).sum() <= feat.max_edge_per_sector


def test_short_rings_skipped():
    lidar = LidarConfig(num_lines=16, min_distance=0.5, max_distance=200.0)
    feat = FeatureConfig()
    cap = CapacityConfig(scan_points=256, ring_points=256)
    rng = np.random.default_rng(4)
    xyz = np.zeros((256, 3), np.float32)
    # 100 points on ring 0 (< 131 minimum)
    az = np.linspace(0, 1, 100)
    xyz[:100] = np.stack(
        [10 * np.cos(az), 10 * np.sin(az), 10 * np.tan(np.radians(-15.0)) * np.ones(100)], -1
    )
    mask = np.zeros(256, bool)
    mask[:100] = True
    res = features.extract_features(jnp.array(xyz), jnp.array(mask), lidar, feat, cap)
    assert int(res.edge_mask.sum()) == 0
    assert int(res.surf_mask.sum()) == 0
