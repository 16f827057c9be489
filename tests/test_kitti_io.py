"""KITTI IO tests on a synthesized mini-dataset (no real KITTI data ships in
this environment): .bin round trip, calib/pose parsing, frame transforms, and
the native C++ prefetch loader vs the NumPy fallback."""

import numpy as np
import pytest

from pfilter_tpu.utils import kitti, metrics


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    seq = root / "sequences" / "07"
    (seq / "velodyne").mkdir(parents=True)
    (root / "poses").mkdir()
    rng = np.random.default_rng(0)
    scans = []
    for i in range(5):
        n = int(rng.integers(1000, 3000))
        scan = rng.uniform(-50, 50, size=(n, 4)).astype(np.float32)
        scan.tofile(seq / "velodyne" / f"{i:06d}.bin")
        scans.append(scan)
    # calib: a nontrivial Tr (velodyne -> cam0): swap axes + offset.
    tr = np.array(
        [[0.0, -1.0, 0.0, 0.1], [0.0, 0.0, -1.0, -0.05], [1.0, 0.0, 0.0, 0.2]]
    )
    with open(seq / "calib.txt", "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in tr.reshape(-1)) + "\n")
    # poses: forward motion in cam0 z (= velodyne x under this Tr).
    mats = np.tile(np.eye(4), (5, 1, 1))
    mats[:, 2, 3] = np.arange(5) * 1.5
    with open(root / "poses" / "07.txt", "w") as f:
        for m in mats:
            f.write(" ".join(str(v) for v in m[:3].reshape(-1)) + "\n")
    return root, scans, tr, mats


def test_bin_roundtrip(mini_kitti):
    root, scans, _, _ = mini_kitti
    seq = kitti.KittiSequence(root, "07")
    assert len(seq) == 5
    got = kitti.read_velodyne_bin(seq.scan_paths[2])
    np.testing.assert_array_equal(got, scans[2])


def test_calib_and_poses(mini_kitti):
    root, _, tr, mats = mini_kitti
    seq = kitti.KittiSequence(root, "07")
    np.testing.assert_allclose(seq.calib["Tr"], tr)
    np.testing.assert_allclose(seq.gt_cam, mats)
    vel = seq.gt_velodyne
    # Motion along cam z maps to velodyne x; relative translation magnitudes
    # are preserved by the rigid change of frame.
    d = vel[1] @ np.linalg.inv(vel[0])
    np.testing.assert_allclose(np.linalg.norm(d[:3, 3]), 1.5, atol=1e-9)
    np.testing.assert_allclose(vel[:, :3, 3][:, 0], np.arange(5) * 1.5, atol=1e-9)


def test_scan_iterator_matches_files(mini_kitti):
    root, scans, _, _ = mini_kitti
    seq = kitti.KittiSequence(root, "07")
    out = list(seq.scans())
    assert len(out) == 5
    for got, want in zip(out, scans):
        np.testing.assert_array_equal(got, want)


def test_native_loader_builds_and_matches(mini_kitti):
    root, scans, _, _ = mini_kitti
    lib = kitti.native_loader()
    assert lib is not None, "native frame_loader failed to build"
    seq = kitti.KittiSequence(root, "07")
    out = list(seq.scans(prefetch_threads=3, prefetch_depth=2))
    for got, want in zip(out, scans):
        np.testing.assert_array_equal(got, want)


def test_pose_format_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    mats = np.tile(np.eye(4), (7, 1, 1))
    mats[:, :3, 3] = rng.normal(size=(7, 3))
    p = tmp_path / "poses.txt"
    metrics.save_kitti_format(p, mats)
    got = metrics.load_kitti_format(p)
    np.testing.assert_allclose(got, mats, atol=1e-12)
