"""DCVC clustering tests: the min-label-propagation fixed point must produce
the same *partition* as a brute-force union-find over the same polar voxel
graph (the reference's flood fill, src/additionClass.cpp:221-317), and the
minSeg filter must drop small clusters."""

import jax.numpy as jnp
import numpy as np

from pfilter_tpu.config import DCVCConfig, LidarConfig
from pfilter_tpu.ops import dcvc


def _union_find_labels(xyz, valid, cfg, lidar):
    """Golden model: connected components over occupied polar voxels
    (3x3x3 neighborhood, azimuth wrap) via union-find."""
    n_pitch, n_az, n_polar, pitch_min = dcvc._grid_dims(cfg, lidar)
    bounds = dcvc.polar_bounds(cfg, lidar)

    r = np.linalg.norm(xyz, axis=-1)
    ok = valid & (r > lidar.min_distance) & (r < lidar.max_distance)
    pitch = np.degrees(np.arcsin(np.clip(xyz[:, 2] / np.maximum(r, 1e-6), -1, 1)))
    az = np.degrees(np.arctan2(xyz[:, 1], xyz[:, 0]))
    az = np.where(az < 0, az + 360.0, az)
    ip = np.clip(np.round((pitch - pitch_min) / cfg.delta_p).astype(int), 0, n_pitch - 1)
    ia = np.clip(np.round(az / cfg.delta_a).astype(int), 0, n_az - 1)
    ir = np.clip(np.searchsorted(bounds, r, side="right"), 0, n_polar - 1)

    vox = {}
    for i in np.nonzero(ok)[0]:
        vox.setdefault((ip[i], ia[i], ir[i]), []).append(i)

    parent = {v: v for v in vox}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (p, a, q) in vox:
        for dp in (-1, 0, 1):
            for da in (-1, 0, 1):
                for dq in (-1, 0, 1):
                    nb = (p + dp, (a + da) % n_az, q + dq)
                    if nb in vox:
                        ra, rb = find((p, a, q)), find(nb)
                        if ra != rb:
                            parent[ra] = rb

    lab = np.full(len(xyz), -1, int)
    for v, ids in vox.items():
        root = find(v)
        root_id = (root[0] * n_az + root[1]) * n_polar + root[2]
        lab[ids] = root_id
    return lab, ok


def _partition_equal(a, b, mask):
    """Same-cluster relation must agree (labels themselves may differ)."""
    a, b = a[mask], b[mask]
    # canonicalize: map each label to its first occurrence index
    def canon(x):
        seen = {}
        out = np.empty(len(x), int)
        for i, v in enumerate(x):
            out[i] = seen.setdefault(v, i)
        return out

    return (canon(a) == canon(b)).all()


def _clusters(rng):
    """Three compact blobs at distinct ranges/azimuths + sparse noise."""
    blobs = [
        rng.normal([10, 0, 0], 0.3, size=(150, 3)),
        rng.normal([0, 15, 1], 0.3, size=(120, 3)),
        rng.normal([-12, -8, 0.5], 0.3, size=(100, 3)),
    ]
    noise = rng.uniform(-30, 30, size=(40, 3))
    noise = noise[np.linalg.norm(noise, axis=1) > 5]
    xyz = np.concatenate(blobs + [noise]).astype(np.float32)
    return xyz, [len(b) for b in blobs]


def test_partition_matches_union_find():
    rng = np.random.default_rng(0)
    xyz, _ = _clusters(rng)
    valid = np.ones(len(xyz), bool)
    cfg, lidar = DCVCConfig(), LidarConfig(min_distance=2.0, max_distance=80.0)
    res = dcvc.cluster(jnp.asarray(xyz), jnp.asarray(valid), cfg, lidar)
    got = np.asarray(res.label)
    want, ok = _union_find_labels(xyz, valid, cfg, lidar)
    assert (got[~ok] == -1).all()
    assert _partition_equal(got, want, ok)


def test_min_seg_filter():
    rng = np.random.default_rng(1)
    xyz, sizes = _clusters(rng)
    valid = np.ones(len(xyz), bool)
    cfg = DCVCConfig(min_seg=80)
    lidar = LidarConfig(min_distance=2.0, max_distance=80.0)
    res = dcvc.cluster(jnp.asarray(xyz), jnp.asarray(valid), cfg, lidar)
    keep = np.asarray(res.keep)
    csize = np.asarray(res.cluster_size)
    # big blobs kept
    assert keep[: sizes[0]].mean() > 0.95
    assert keep[sizes[0] : sizes[0] + sizes[1]].mean() > 0.95
    # isolated noise points: cluster size tiny -> dropped
    n_blob = sum(sizes)
    assert keep[n_blob:].sum() == 0
    # keep implies size > min_seg
    assert (csize[keep] > cfg.min_seg).all()


def test_cluster_sizes_sum():
    rng = np.random.default_rng(2)
    xyz, _ = _clusters(rng)
    valid = np.ones(len(xyz), bool)
    cfg = DCVCConfig()
    lidar = LidarConfig(min_distance=2.0, max_distance=80.0)
    res = dcvc.cluster(jnp.asarray(xyz), jnp.asarray(valid), cfg, lidar)
    lab = np.asarray(res.label)
    csize = np.asarray(res.cluster_size)
    for l in np.unique(lab[lab >= 0]):
        m = lab == l
        assert (csize[m] == m.sum()).all()
