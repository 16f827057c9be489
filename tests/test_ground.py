"""Ground segmentation tests: constructed scenes with known ground truth
(flat plane + boxes + overhangs) rather than a re-implementation golden model
— validates the classification *rules* of the reference
(include/preProcess.hpp:398-505), not our code against itself."""

import jax.numpy as jnp
import numpy as np

from pfilter_tpu.config import GroundConfig
from pfilter_tpu.ops import ground


def _scene(rng):
    """Flat ground z~0, a 2m-tall box wall at x in [8,9], an elevated slab
    (floating at z=4, no points below it in its cells)."""
    pts = []
    labels = []  # 1 ground, 0 nonground, -1 dropped/don't-care

    # Dense ground plane patch, |x|,|y| < 20
    g = rng.uniform(-20, 20, size=(4000, 2))
    pts.append(np.column_stack([g, rng.normal(0, 0.02, 4000)]))
    labels.append(np.ones(4000))

    # Box wall: x in [8,9], y in [-2,2], z in [0.5, 2.5] (same cells also
    # contain ground points, so cell min-z ~ 0 and these sit > 0.3 above it)
    w = np.column_stack(
        [
            rng.uniform(8, 9, 600),
            rng.uniform(-2, 2, 600),
            rng.uniform(0.5, 2.5, 600),
        ]
    )
    pts.append(w)
    labels.append(np.zeros(600))

    xyz = np.concatenate(pts).astype(np.float32)
    lab = np.concatenate(labels)
    return xyz, lab


def test_plane_vs_wall():
    rng = np.random.default_rng(0)
    xyz, lab = _scene(rng)
    cfg = GroundConfig()
    res = ground.segment_ground(jnp.asarray(xyz), jnp.ones(len(xyz), bool), cfg)
    gm = np.asarray(res.ground_mask)
    ngm = np.asarray(res.nonground_mask)

    # Ground points: nearly all classified ground (cell boundaries aside).
    assert gm[lab == 1].mean() > 0.97
    # Wall points: none ground, all survive as non-ground.
    assert gm[lab == 0].sum() == 0
    assert ngm[lab == 0].mean() > 0.97
    # Masks are disjoint.
    assert not (gm & ngm).any()


def test_elevated_cell_not_ground():
    """A floating slab in cells with no true ground: its own min-z is the slab,
    but the 3x3 neighbor min (from surrounding ground cells) differs by > tol,
    so the cell is unreliable and nothing in it is ground (ref :456-470)."""
    rng = np.random.default_rng(1)
    g = rng.uniform(-15, 15, size=(3000, 2))
    ground_pts = np.column_stack([g, rng.normal(0, 0.02, 3000)])
    # slab at z=4 occupying exactly one 3m cell far from origin cell borders
    slab = np.column_stack(
        [
            rng.uniform(4.6, 5.9, 400),
            rng.uniform(4.6, 5.9, 400),
            np.full(400, 4.0) + rng.normal(0, 0.02, 400),
        ]
    )
    # remove ground beneath the slab so the slab owns its cell's min-z
    keep = ~(
        (ground_pts[:, 0] > 4.5)
        & (ground_pts[:, 0] < 6.0)
        & (ground_pts[:, 1] > 4.5)
        & (ground_pts[:, 1] < 6.0)
    )
    xyz = np.concatenate([ground_pts[keep], slab]).astype(np.float32)
    n_g = keep.sum()
    cfg = GroundConfig()
    res = ground.segment_ground(jnp.asarray(xyz), jnp.ones(len(xyz), bool), cfg)
    gm = np.asarray(res.ground_mask)
    assert gm[n_g:].sum() == 0  # slab never ground
    assert gm[:n_g].mean() > 0.9


def test_invalid_points_ignored():
    rng = np.random.default_rng(2)
    xyz, _ = _scene(rng)
    valid = np.ones(len(xyz), bool)
    valid[::3] = False
    res = ground.segment_ground(jnp.asarray(xyz), jnp.asarray(valid), GroundConfig())
    gm = np.asarray(res.ground_mask)
    ngm = np.asarray(res.nonground_mask)
    assert not gm[~valid].any()
    assert not ngm[~valid].any()
