"""PCA feature classification into beam/pillar/facade — TPU-native form of
``nongroundExtract::featureExtract`` (ref: include/preProcess.hpp:646-736).

Per non-ground point: eigendecompose the radius-neighborhood covariance
(from ops.pca_radius moments), compute linearity ``(l1-l2)/l1`` and planarity
``(l2-l3)/l1`` with eigenvalues sorted descending (PCL PCA convention,
ref: :300-320), then threshold (ref: :658-689, :709-721):

- linear > 0.65 and |principal_z| > 0.94          -> pillar
- linear > 0.65 and |principal_z| < 0.17, z > 0.5 -> beam
- elif planar > 0.65 and |normal_z| < 0.34        -> facade

Points need more than ``neigh_k_min`` (8) neighbors to be classified.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pfilter_tpu.ops import eig3

from pfilter_tpu.config import PCAClassifyConfig
from pfilter_tpu.ops.pca_radius import PCAMoments


class ClassifyResult(NamedTuple):
    beam_mask: jnp.ndarray  # [N] bool
    pillar_mask: jnp.ndarray
    facade_mask: jnp.ndarray
    linearity: jnp.ndarray  # [N] (diagnostics)
    planarity: jnp.ndarray


def classify(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    moments: PCAMoments,
    cfg: PCAClassifyConfig,
    neigh_k_min: int = 8,
) -> ClassifyResult:
    cov = moments.cov
    evals, evecs = eig3.eigh3(cov)  # ascending, closed form — see ops.eig3
    l1 = jnp.maximum(evals[..., 2], 1e-12)  # largest
    l2 = evals[..., 1]
    l3 = evals[..., 0]
    principal = evecs[..., 2]  # largest-eigenvalue direction
    normal = evecs[..., 0]  # smallest-eigenvalue direction

    linear = (l1 - l2) / l1
    planar = (l2 - l3) / l1

    enough = valid & (moments.count > neigh_k_min)
    pz = jnp.abs(principal[..., 2])
    nz = jnp.abs(normal[..., 2])
    z = xyz[:, 2]

    is_linear = enough & (linear > cfg.linear_vertical)
    pillar = is_linear & (pz > cfg.dir_z_pillar)
    beam = is_linear & ~pillar & (pz < cfg.dir_z_beam) & (z > cfg.beam_min_z)
    facade = enough & ~is_linear & (planar > cfg.planar_threshold) & (nz < cfg.norm_z_facade)

    return ClassifyResult(
        beam_mask=beam,
        pillar_mask=pillar,
        facade_mask=facade,
        linearity=jnp.where(enough, linear, 0.0),
        planarity=jnp.where(enough, planar, 0.0),
    )
