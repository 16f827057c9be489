"""Radius-PCA moment kernel (interpret mode) vs brute force, and the
beam/pillar/facade classifier on constructed geometry (ref thresholds
include/preProcess.hpp:709-721)."""

import jax.numpy as jnp
import numpy as np

from pfilter_tpu.config import PCAClassifyConfig
from pfilter_tpu.ops import knn_tiled, pca_classify, pca_radius

NT = 8
TILE_CELLS = 4
TILE_CAP = 256


def _tiled(xyz, valid):
    cap = len(xyz)
    rg = jnp.zeros((cap, 2), jnp.float32)
    origin = knn_tiled.tile_origin_for_pose(jnp.zeros(3), NT, TILE_CELLS)
    return knn_tiled.build_tiled(
        jnp.asarray(xyz), rg, jnp.asarray(valid), origin, NT, TILE_CELLS, TILE_CAP
    )


def test_moments_match_bruteforce():
    rng = np.random.default_rng(0)
    n = 800
    xyz = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::7] = False
    tmap = _tiled(xyz, valid)
    got = pca_radius.radius_pca_moments(
        tmap,
        jnp.asarray(xyz),
        jnp.asarray(valid),
        NT,
        TILE_CELLS,
        TILE_CAP,
        radius=1.0,
        interpret=True,
    )
    want = pca_radius.radius_pca_moments_reference(
        tmap, jnp.asarray(xyz), jnp.asarray(valid), radius=1.0
    )
    np.testing.assert_allclose(np.asarray(got.count)[valid], np.asarray(want.count)[valid])
    m = valid & (np.asarray(want.count) > 0)
    np.testing.assert_allclose(
        np.asarray(got.mean)[m], np.asarray(want.mean)[m], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.cov)[m], np.asarray(want.cov)[m], rtol=1e-3, atol=1e-3
    )


def _structures(rng):
    """Pillar (vertical line), beam (horizontal line above ground), facade
    (vertical plane), blob (isotropic -> none)."""
    pillar = np.column_stack(
        [
            rng.normal(5, 0.03, 120),
            rng.normal(5, 0.03, 120),
            rng.uniform(0, 4, 120),
        ]
    )
    beam = np.column_stack(
        [
            rng.uniform(-8, -2, 120),
            rng.normal(3, 0.03, 120),
            rng.normal(2.0, 0.03, 120),
        ]
    )
    # dense enough that radius-1 eigenvalue noise stays below the 0.65
    # linearity/planarity thresholds (LiDAR walls are this dense in practice)
    facade = np.column_stack(
        [
            rng.uniform(-6, 0, 1500),
            rng.normal(-5, 0.03, 1500),
            rng.uniform(0, 4, 1500),
        ]
    )
    blob = rng.normal([8, -8, 1], 0.5, size=(150, 3))
    xyz = np.concatenate([pillar, beam, facade, blob]).astype(np.float32)
    spans = np.cumsum([0, len(pillar), len(beam), len(facade), len(blob)])
    return xyz, spans


def test_classifier_on_structures():
    rng = np.random.default_rng(1)
    xyz, s = _structures(rng)
    valid = np.ones(len(xyz), bool)
    tmap = _tiled(xyz, valid)
    mom = pca_radius.radius_pca_moments(
        tmap, jnp.asarray(xyz), jnp.asarray(valid), NT, TILE_CELLS, TILE_CAP,
        radius=1.0, interpret=True,
    )
    cls = pca_classify.classify(jnp.asarray(xyz), jnp.asarray(valid), mom, PCAClassifyConfig())
    pm = np.asarray(cls.pillar_mask)
    bm = np.asarray(cls.beam_mask)
    fm = np.asarray(cls.facade_mask)

    # Assert on *interior* points only: near a structure's boundary the
    # radius-1 neighborhood is truncated (a half-disc looks linear, a line
    # end looks isotropic) — the reference classifier has the same behavior.
    pillar_int = (xyz[s[0] : s[1], 2] > 1.0) & (xyz[s[0] : s[1], 2] < 3.0)
    beam_int = (xyz[s[1] : s[2], 0] > -7.0) & (xyz[s[1] : s[2], 0] < -3.0)
    fac = xyz[s[2] : s[3]]
    facade_int = (
        (fac[:, 0] > -5.0) & (fac[:, 0] < -1.0) & (fac[:, 2] > 1.0) & (fac[:, 2] < 3.0)
    )
    assert pm[s[0] : s[1]][pillar_int].mean() > 0.8, "pillar points classified pillar"
    assert bm[s[1] : s[2]][beam_int].mean() > 0.8, "beam points classified beam"
    assert fm[s[2] : s[3]][facade_int].mean() > 0.9, "facade points classified facade"
    # blob: nothing
    blob_any = pm[s[3] : s[4]] | bm[s[3] : s[4]] | fm[s[3] : s[4]]
    assert blob_any.mean() < 0.1
    # masks mutually exclusive
    assert not (pm & bm).any() and not (pm & fm).any() and not (bm & fm).any()


def _cube_reference(xyz, valid, leaf):
    """Brute-force cube-neighborhood moments (query voxel's 3x3x3 block)."""
    import numpy as np

    ijk = np.floor(xyz / leaf).astype(np.int64)
    cnt = np.zeros(len(xyz))
    mean = np.zeros((len(xyz), 3))
    cov = np.zeros((len(xyz), 3, 3))
    for i in range(len(xyz)):
        if not valid[i]:
            continue
        d = np.abs(ijk - ijk[i])
        sel = valid & (d.max(1) <= 1)
        pts = xyz[sel]
        cnt[i] = len(pts)
        mu = pts.mean(0)
        mean[i] = mu
        zm = pts - mu
        cov[i] = zm.T @ zm
    return cnt, mean, cov


def test_voxel_moments_match_cube_bruteforce():
    """voxel_pca_moments == exact cube-neighborhood moments (its own
    semantics), including the fp32-safe local-frame shift identities —
    checked at world-scale coordinates where naive accumulation fails."""
    from pfilter_tpu.ops import pca_voxel

    rng = np.random.default_rng(1)
    n = 600
    # Offset far from origin: second moments ~ (60 m)^2 stress fp32.
    xyz = (rng.uniform(-8, 8, size=(n, 3)) + np.array([55.0, -62.0, 3.0])).astype(
        np.float32
    )
    valid = np.ones(n, bool)
    valid[::9] = False
    got = pca_voxel.voxel_pca_moments(jnp.asarray(xyz), jnp.asarray(valid), leaf=0.7)
    cnt, mean, cov = _cube_reference(xyz.astype(np.float64), valid, 0.7)
    np.testing.assert_allclose(np.asarray(got.count)[valid], cnt[valid])
    m = valid & (cnt > 0)
    np.testing.assert_allclose(np.asarray(got.mean)[m], mean[m], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.cov)[m], cov[m], rtol=2e-3, atol=2e-3)


def test_voxel_moments_classify_agreement():
    """Cube-neighborhood classification agrees with the exact-ball kernel on
    clean geometry (a pillar, a beam, a facade) — the thresholds consume
    eigenvalue ratios, which both neighborhoods preserve."""
    from pfilter_tpu.ops import pca_voxel

    rng = np.random.default_rng(2)
    pts = []
    # vertical pillar at (3, 3): 60 points over 6 m
    pts.append(
        np.stack(
            [np.full(60, 3.0), np.full(60, 3.0), np.linspace(0, 6, 60)], -1
        )
        + rng.normal(0, 0.02, (60, 3))
    )
    # horizontal beam at z=3 along x
    pts.append(
        np.stack(
            [np.linspace(-4, 4, 80), np.full(80, -3.0), np.full(80, 3.0)], -1
        )
        + rng.normal(0, 0.02, (80, 3))
    )
    # facade plane x = -3
    yy, zz = np.meshgrid(np.linspace(-6, 6, 48), np.linspace(0, 7, 28))
    pts.append(
        np.stack([np.full(yy.size, -5.0), yy.ravel(), zz.ravel()], -1)
        + rng.normal(0, 0.02, (yy.size, 3))
    )
    xyz = np.concatenate(pts).astype(np.float32)
    valid = np.ones(len(xyz), bool)
    cfg = PCAClassifyConfig()

    mom = pca_voxel.voxel_pca_moments(jnp.asarray(xyz), jnp.asarray(valid), leaf=0.7)
    cls = pca_classify.classify(jnp.asarray(xyz), jnp.asarray(valid), mom, cfg)
    pillar = np.asarray(cls.pillar_mask)
    beam = np.asarray(cls.beam_mask)
    facade = np.asarray(cls.facade_mask)
    # Majorities land in the right classes (ends/edges may miss).
    assert pillar[:60].mean() > 0.6, pillar[:60].mean()
    assert beam[60:140].mean() > 0.6, beam[60:140].mean()
    assert facade[140:].mean() > 0.6, facade[140:].mean()
    # Cross-contamination stays low.
    assert pillar[140:].mean() < 0.05
    assert beam[:60].mean() < 0.05
