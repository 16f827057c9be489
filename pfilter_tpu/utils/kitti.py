"""KITTI odometry dataset IO: velodyne ``.bin`` scans, calibration,
ground-truth poses, and a prefetching sequence reader.

Replaces the reference's playback stack — the external ``kitti_tool`` rosbag
publisher plus per-node ``pcl::fromROSMsg`` deserialization
(ref: launch/pfilter_kitti.launch:74-76, src/odomEstimationNode.cpp:115-118).
Scans load through the native C++ prefetcher (runtime/io/frame_loader.cpp)
when built, with a pure-NumPy fallback.

Expected layout (standard KITTI odometry benchmark):
  <root>/sequences/<seq>/velodyne/000000.bin ...
  <root>/sequences/<seq>/calib.txt            (Tr: velodyne -> cam0)
  <root>/poses/<seq>.txt                      (cam0 poses, 3x4 rows)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

_RUNTIME_IO = Path(__file__).resolve().parents[2] / "runtime" / "io"
_LIB_PATH = _RUNTIME_IO / "libframe_loader.so"
_MAX_POINTS = 200_000  # HDL-64 peaks ~130k points/scan


def _load_native() -> Optional[ctypes.CDLL]:
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_RUNTIME_IO)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.fl_open.restype = ctypes.c_void_p
    lib.fl_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.fl_next.restype = ctypes.c_int64
    lib.fl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.fl_close.restype = None
    lib.fl_close.argtypes = [ctypes.c_void_p]
    return lib


_NATIVE = None
_NATIVE_TRIED = False


def native_loader() -> Optional[ctypes.CDLL]:
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE = _load_native()
        _NATIVE_TRIED = True
    return _NATIVE


def read_velodyne_bin(path: str | os.PathLike) -> np.ndarray:
    """[N, 4] float32 (x, y, z, reflectance)."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def read_calib(path: str | os.PathLike) -> dict[str, np.ndarray]:
    """KITTI calib.txt -> {name: [3,4]}; 'Tr' maps velodyne -> cam0."""
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            name, vals = line.split(":", 1)
            arr = np.fromstring(vals, sep=" ", dtype=np.float64)
            if arr.size == 12:
                out[name.strip()] = arr.reshape(3, 4)
    return out


def read_poses(path: str | os.PathLike) -> np.ndarray:
    """KITTI pose file (3x4 rows) -> [N, 4, 4]."""
    raw = np.loadtxt(path).reshape(-1, 3, 4)
    mats = np.tile(np.eye(4), (len(raw), 1, 1))
    mats[:, :3, :] = raw
    return mats


def poses_in_velodyne_frame(cam_poses: np.ndarray, calib: dict) -> np.ndarray:
    """Ground truth is cam0->world; odometry runs in the velodyne frame.
    T_vel(i<-0) = Tr^-1 . T_cam(i<-0) . Tr."""
    tr = np.eye(4)
    tr[:3, :] = calib["Tr"]
    tr_inv = np.linalg.inv(tr)
    return np.einsum("ij,njk,kl->nil", tr_inv, cam_poses, tr)


class KittiSequence:
    """One KITTI odometry sequence: scan iterator + ground truth."""

    def __init__(self, root: str | os.PathLike, sequence: str):
        self.root = Path(root)
        self.sequence = sequence
        seq_dir = self.root / "sequences" / sequence
        self.scan_paths = sorted((seq_dir / "velodyne").glob("*.bin"))
        if not self.scan_paths:
            raise FileNotFoundError(f"no velodyne scans under {seq_dir}")
        calib_path = seq_dir / "calib.txt"
        self.calib = read_calib(calib_path) if calib_path.exists() else None
        pose_path = self.root / "poses" / f"{sequence}.txt"
        self.gt_cam = read_poses(pose_path) if pose_path.exists() else None

    def __len__(self) -> int:
        return len(self.scan_paths)

    @property
    def gt_velodyne(self) -> Optional[np.ndarray]:
        if self.gt_cam is None or self.calib is None:
            return None
        return poses_in_velodyne_frame(self.gt_cam, self.calib)

    def scans(self, prefetch_threads: int = 3, prefetch_depth: int = 6) -> Iterator[np.ndarray]:
        """Yield [N, 4] float32 scans in order, prefetched natively when the
        C++ loader is available."""
        lib = native_loader()
        if lib is None:
            for p in self.scan_paths:
                yield read_velodyne_bin(p)
            return
        paths = [str(p).encode() for p in self.scan_paths]
        arr = (ctypes.c_char_p * len(paths))(*paths)
        max_floats = _MAX_POINTS * 4
        handle = lib.fl_open(arr, len(paths), max_floats, prefetch_threads, prefetch_depth)
        buf = np.empty(max_floats, np.float32)
        try:
            for _ in range(len(paths)):
                n = lib.fl_next(
                    handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_floats
                )
                if n < 0:
                    raise IOError("frame_loader read error")
                if n == 0:
                    return
                yield buf[:n].reshape(-1, 4).copy()
        finally:
            lib.fl_close(handle)
