"""Tiled global visualization map — TPU-native form of ``LaserMappingClass``
(ref: include/laserMappingClass.h:23-60, src/laserMappingClass.cpp:7-208).

The reference grows a vector-of-vector-of-vector grid of 50 m cells as the
robot moves, inserts pose-transformed scans into the cells, and voxel-grid
downsamples the 5x5x5 neighborhood around the robot each update
(src/laserMappingClass.cpp:152-191).  getMap concatenates every cell
(:196-208).

TPU redesign: the dynamic 3-level grid becomes a fixed pool of cell slots
(device arrays ``[max_cells, cell_cap]``) plus a tiny host-side cell-id ->
slot table (pure control plane: slot allocation is data-independent host
logic, exactly what the reference's ``addWidthCellPositive...`` grow calls
were).  Per frame, one jitted program scatters the new scan into its cells'
ring cursors and re-voxelizes only the touched cells (vmap of the shared
``rgbds`` downsample over a fixed-size touched set) — bounded work per frame
regardless of map size, and the full map never leaves the device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pfilter_tpu.ops import se3, voxel

CELL_SIZE = 50.0  # ref LASER_CELL_WIDTH/HEIGHT/DEPTH (include/laserMappingClass.h:12-14)
_TOUCH_CAP = 32  # cells a single scan may touch (scan radius 120 m < 3 cells)


class CellStore(NamedTuple):
    """Fixed pool of map cells on device."""

    xyz: jnp.ndarray  # [C, K, 3]
    valid: jnp.ndarray  # [C, K] bool
    count: jnp.ndarray  # [C] int32 — valid points per cell (packed prefix)


def empty_store(max_cells: int, cell_cap: int) -> CellStore:
    return CellStore(
        xyz=jnp.zeros((max_cells, cell_cap, 3), jnp.float32),
        valid=jnp.zeros((max_cells, cell_cap), bool),
        count=jnp.zeros(max_cells, jnp.int32),
    )


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("leaf",))
def _insert(
    store: CellStore,
    new_xyz: jnp.ndarray,  # [N, 3] world-frame points
    new_slot: jnp.ndarray,  # [N] int32 slot id per point (-1 = drop)
    touched: jnp.ndarray,  # [_TOUCH_CAP] int32 slot ids to re-voxelize (-1 pad)
    leaf: float,
) -> CellStore:
    c, k, _ = store.xyz.shape

    def per_touched(slot):
        """Merge the slot's points with its share of the new scan, then
        voxel-downsample back into the fixed cell capacity (the reference's
        per-cell VoxelGrid pass, src/laserMappingClass.cpp:180-189)."""
        sel = new_slot == slot
        n_new = sel.sum()
        # Compact this cell's new points to the front of a [K]-sized buffer.
        rank = jnp.cumsum(sel) - 1
        pos = jnp.where(sel, rank, k)
        buf = jnp.zeros((k, 3), jnp.float32).at[jnp.minimum(pos, k - 1)].set(
            jnp.where(sel[:, None], new_xyz, 0.0), mode="drop"
        )
        bvalid = jnp.arange(k) < jnp.minimum(n_new, k)

        old = voxel.PointSet(
            xyz=store.xyz[slot],
            rg=jnp.zeros((k, 2), jnp.float32),
            valid=store.valid[slot],
        )
        new = voxel.PointSet(xyz=buf, rg=jnp.zeros((k, 2), jnp.float32), valid=bvalid)
        merged = voxel.concat_pointsets(old, new)
        ds = voxel.voxel_downsample_rgbds(merged, leaf, k)
        return ds.xyz, ds.valid, ds.valid.sum().astype(jnp.int32)

    t_xyz, t_valid, t_count = jax.vmap(per_touched)(jnp.maximum(touched, 0))
    ok = touched >= 0
    safe = jnp.where(ok, touched, c)  # drop writes for pad entries
    xyz = store.xyz.at[safe].set(t_xyz, mode="drop")
    valid = store.valid.at[safe].set(t_valid, mode="drop")
    count = store.count.at[safe].set(jnp.where(ok, t_count, 0), mode="drop")
    return CellStore(xyz=xyz, valid=valid, count=count)


class GlobalMap:
    """Host wrapper: cell-id bookkeeping + the jitted insert.

    ``update(pose, scan_xyz, scan_valid)`` mirrors
    ``updateCurrentPointsToMap`` (src/laserMappingClass.cpp:152-191);
    ``get_map()`` mirrors ``getMap`` (:196-208).
    """

    def __init__(self, max_cells: int = 512, cell_cap: int = 16384, resolution: float = 0.4):
        self.max_cells = max_cells
        self.cell_cap = cell_cap
        self.resolution = float(resolution)
        self.store = empty_store(max_cells, cell_cap)
        self._slot_of: dict[tuple, int] = {}
        self._next = 0

        def _transform(q, t, xyz):
            return se3.transform_points(se3.Pose(q=q, t=t), xyz)

        self._transform = jax.jit(_transform)

    def _slot(self, cell: tuple) -> int:
        s = self._slot_of.get(cell)
        if s is None:
            if self._next >= self.max_cells:
                # Evict the oldest cell (the reference instead grows without
                # bound; a bounded pool with FIFO reuse keeps memory static).
                oldest = next(iter(self._slot_of))
                s = self._slot_of.pop(oldest)
            else:
                s = self._next
                self._next += 1
            self._slot_of[cell] = s
        return s

    def update(self, pose_q, pose_t, scan_xyz, scan_valid) -> None:
        world = np.asarray(self._transform(pose_q, pose_t, scan_xyz))
        v = np.asarray(scan_valid)
        cells = np.floor(world / CELL_SIZE).astype(np.int64)
        # Exact touched set: unique cells of the valid points.
        uniq = {tuple(c) for c in np.unique(cells[v], axis=0)}
        if len(uniq) > _TOUCH_CAP:
            # A single scan spans > _TOUCH_CAP cells only with >300 m range.
            uniq = set(list(uniq)[:_TOUCH_CAP])
        slot_map = {cell: self._slot(cell) for cell in sorted(uniq)}
        slot_per_point = np.full(len(world), -1, np.int32)
        for cell, s in slot_map.items():
            m = v & (cells == np.asarray(cell)).all(1)
            slot_per_point[m] = s
        touched = np.full(_TOUCH_CAP, -1, np.int32)
        touched[: len(slot_map)] = sorted(slot_map.values())
        self.store = _insert(
            self.store,
            jnp.asarray(world),
            jnp.asarray(slot_per_point),
            jnp.asarray(touched),
            self.resolution,
        )

    def get_map(self) -> np.ndarray:
        """[M, 3] world-frame points (all cells concatenated)."""
        xyz = np.asarray(self.store.xyz).reshape(-1, 3)
        valid = np.asarray(self.store.valid).reshape(-1)
        return xyz[valid]
