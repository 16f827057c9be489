"""Mesh construction helpers.

The engine's two parallel axes (SURVEY.md §2 'Parallelism & communication'):

- ``seq``: data parallelism over concurrent sequences — the reference's
  ``runkitti.py`` runs sequences serially (runkitti.py:161-213); here a batch
  of sequences runs in lockstep, one per mesh row.
- ``map``: the registration map sharded into voxel blocks — the reference's
  single-process KD-tree/cloud becomes hash-partitioned blocks; kNN merges
  shard-local candidates (all_gather over ICI) and the 6x6 Gauss-Newton
  normal equations are psum-reduced.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_seq: int, n_map: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_seq * n_map
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_seq, n_map)
    return Mesh(arr, ("seq", "map"))


def factor_devices(n: int, max_map: int = 4):
    """Split n devices into (n_seq, n_map) with n_map a power-of-two <= max_map."""
    n_map = 1
    while n_map * 2 <= max_map and n % (n_map * 2) == 0:
        n_map *= 2
    return n // n_map, n_map
