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


def _leaf_name(key_path) -> str:
    """Stable dotted name for a pytree leaf ("edge_map.xyz", "pg_h", ...)."""
    parts = []
    for k in key_path:
        if hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "key"):
            parts.append(str(k.key))
        else:
            parts.append(str(k))
    return ".".join(parts)


# Leaves that may be absent from / shape-mismatched against an older
# checkpoint without invalidating it: the pose-graph window is an additive,
# self-refilling diagnostic state (it repopulates within `window` frames), so
# a pre-pose-graph checkpoint or a changed PoseGraphConfig.window restores
# with the template's init values instead of hard-failing (ADVICE r3).
_OPTIONAL_PREFIXES = ("pg_",)


def _is_optional(name: str) -> bool:
    base = name.rsplit(".", 1)[-1]
    return any(base.startswith(p) for p in _OPTIONAL_PREFIXES)


def save_state(path: str | Path, state: Any, *, step: int = 0, extra: Optional[dict] = None):
    """Save a SLAM-state pytree (ESState / BPFState / sharded variants).

    Uses a flat .npz of the pytree leaves keyed by their pytree path + a JSON
    sidecar — fully deterministic, no async machinery, readable anywhere.
    (Orbax is heavier than needed for a single-host state of a few hundred
    MB; the layout here is restart-exact and mirrors what an
    ocp.StandardCheckpointer would store.)
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    names = [_leaf_name(kp) for kp, _ in flat]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate leaf names in state pytree: {names}")
    arrays = {n: np.asarray(x) for n, (_, x) in zip(names, flat)}
    np.savez_compressed(path / "state.npz", **arrays)
    meta = {
        "step": step,
        "n_leaves": len(flat),
        "leaf_names": names,
        "treedef": str(treedef),
        "extra": extra or {},
    }
    (path / "meta.json").write_text(json.dumps(meta))


def restore_state(path: str | Path, template: Any) -> tuple[Any, dict]:
    """Restore into the structure of ``template`` (an initialized state of the
    same config).  Returns (state, meta).

    Leaves are matched by pytree path.  A leaf missing from the checkpoint, or
    whose stored shape mismatches the template, falls back to the template's
    value *iff* it is an optional leaf (pose-graph window ``pg_*`` — additive
    state that refills itself; see ``_OPTIONAL_PREFIXES``); the fallbacks are
    listed in ``meta["restored_from_template"]``.  Any other mismatch is a
    config mismatch and raises.  Legacy positional checkpoints (``leaf_{i}``
    keys) restore strictly by position.
    """
    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    with np.load(path / "state.npz") as z:
        stored = {k: z[k] for k in z.files}

    if "leaf_names" not in meta:  # legacy positional format
        leaves = [stored[f"leaf_{i}"] for i in range(meta["n_leaves"])]
        if len(flat) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves, template has {len(flat)} "
                "(config mismatch?)"
            )
        for i, (a, (_, b)) in enumerate(zip(leaves, flat)):
            if np.shape(a) != np.shape(b):
                raise ValueError(
                    f"leaf {i}: checkpoint shape {np.shape(a)} != template {np.shape(b)}"
                )
        state = jax.tree.unflatten(treedef, [jax.numpy.asarray(x) for x in leaves])
        return state, meta

    out, fallbacks, names = [], [], []
    for kp, t_leaf in flat:
        name = _leaf_name(kp)
        names.append(name)
        a = stored.get(name)
        if a is not None and np.shape(a) == np.shape(t_leaf):
            out.append(jax.numpy.asarray(a))
        elif _is_optional(name):
            out.append(t_leaf)
            fallbacks.append(name)
        elif a is None:
            raise ValueError(f"checkpoint is missing required leaf {name!r}")
        else:
            raise ValueError(
                f"leaf {name!r}: checkpoint shape {np.shape(a)} != template "
                f"{np.shape(t_leaf)} (config mismatch?)"
            )
    extra_keys = sorted(set(stored) - set(names))
    if any(not _is_optional(k) for k in extra_keys):
        bad = [k for k in extra_keys if not _is_optional(k)]
        raise ValueError(f"checkpoint has leaves unknown to the template: {bad}")
    meta["restored_from_template"] = fallbacks
    state = jax.tree.unflatten(treedef, out)
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
