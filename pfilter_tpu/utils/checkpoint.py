"""Checkpoint / resume of the full SLAM state.

The reference has none: map and pose live only in process memory and a node
crash kills the pipeline (SURVEY.md §5; the only resilience is queues
dropping stale messages, ref: src/odomEstimationNode.cpp:96-110).  Here the
entire engine state is a pytree of device arrays (feature maps + persistence
counters + pose + optimizer schedule), so checkpointing is a single Orbax
save and restart-resume is exact.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def save_state(path: str | Path, state: Any, *, step: int = 0, extra: Optional[dict] = None):
    """Save a SLAM-state pytree (ESState / BPFState / sharded variants).

    Uses a flat .npz of the pytree leaves + a JSON treedef sidecar — fully
    deterministic, no async machinery, readable anywhere.  (Orbax is heavier
    than needed for a single-host state of a few hundred MB; the layout here
    is restart-exact and mirrors what an ocp.StandardCheckpointer would
    store.)
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path / "state.npz", **arrays)
    meta = {
        "step": step,
        "n_leaves": len(leaves),
        "treedef": str(treedef),
        "extra": extra or {},
    }
    (path / "meta.json").write_text(json.dumps(meta))


def restore_state(path: str | Path, template: Any) -> tuple[Any, dict]:
    """Restore into the structure of ``template`` (an initialized state of the
    same config).  Returns (state, meta)."""
    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    with np.load(path / "state.npz") as z:
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    t_leaves, treedef = jax.tree.flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has {len(t_leaves)} "
            "(config mismatch?)"
        )
    for i, (a, b) in enumerate(zip(leaves, t_leaves)):
        if np.shape(a) != np.shape(b):
            raise ValueError(f"leaf {i}: checkpoint shape {np.shape(a)} != template {np.shape(b)}")
    state = jax.tree.unflatten(treedef, [jax.numpy.asarray(x) for x in leaves])
    return state, meta


def save_trajectory(path: str | Path, records: list) -> None:
    """JSONL per-frame diagnostics (the structured twin of the reference's
    ROS_INFO timing prints + .dat dumps, ref: include/odomEstimationClass.h:96-109)."""
    path = Path(path)
    with open(path, "w") as f:
        for r in records:
            d = dataclasses.asdict(r) if dataclasses.is_dataclass(r) else dict(r)
            d = {
                k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in d.items()
            }
            f.write(json.dumps(d) + "\n")
