"""Closed-form 3x3 symmetric eigensolver vs numpy.linalg.eigh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfilter_tpu.ops import eig3


def _random_sym(rng, n, scale=1.0):
    a = rng.normal(size=(n, 3, 3)).astype(np.float32) * scale
    return (a + np.swapaxes(a, -1, -2)) / 2.0


def _random_cov(rng, n, k=5, scale=1.0):
    pts = rng.normal(size=(n, k, 3)).astype(np.float32) * scale
    pts -= pts.mean(axis=1, keepdims=True)
    return np.einsum("mki,mkj->mij", pts, pts)


@pytest.mark.parametrize("maker", ["sym", "cov"])
def test_eigvals_match_numpy(maker):
    rng = np.random.default_rng(0)
    a = _random_sym(rng, 512) if maker == "sym" else _random_cov(rng, 512)
    w = np.asarray(jax.jit(eig3.eigvalsh3)(jnp.asarray(a)))
    w_np = np.linalg.eigvalsh(a.astype(np.float64))
    scale = np.abs(w_np).max(axis=-1, keepdims=True) + 1e-6
    np.testing.assert_allclose(w / scale, w_np / scale, atol=2e-5)


def test_eigvecs_are_eigvecs():
    rng = np.random.default_rng(1)
    a = _random_cov(rng, 512)
    w, v = jax.jit(eig3.eigh3)(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    for k in range(3):
        av = np.einsum("mij,mj->mi", a, v[..., k])
        lv = w[..., k : k + 1] * v[..., k]
        scale = np.abs(w).max(axis=-1, keepdims=True) + 1e-5
        np.testing.assert_allclose(av / scale, lv / scale, atol=5e-4)
    # Orthonormal columns.
    vtv = np.einsum("mik,mil->mkl", v, v)
    np.testing.assert_allclose(vtv, np.broadcast_to(np.eye(3), vtv.shape), atol=2e-3)


def test_smallest_largest_helpers():
    rng = np.random.default_rng(2)
    a = _random_cov(rng, 256)
    w_s, v_s = jax.jit(eig3.eigh3_smallest)(jnp.asarray(a))
    w_l, v_l = jax.jit(eig3.eigh3_largest)(jnp.asarray(a))
    w_np, v_np = np.linalg.eigh(a.astype(np.float64))
    np.testing.assert_allclose(np.asarray(w_s), w_np, rtol=1e-3, atol=1e-4)
    # Compare directions up to sign.
    for v_ours, v_ref in ((np.asarray(v_s), v_np[..., 0]), (np.asarray(v_l), v_np[..., 2])):
        dot = np.abs(np.sum(v_ours * v_ref, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-3)


def test_degenerate_spectra_finite():
    # Repeated eigenvalues and the zero matrix must not produce NaNs.
    mats = np.stack(
        [
            np.zeros((3, 3)),
            np.eye(3),
            np.diag([2.0, 2.0, 1.0]),
            np.diag([3.0, 1.0, 1.0]),
            np.diag([1e-20, 1e-20, 1e-20]),
        ]
    ).astype(np.float32)
    w, v = jax.jit(eig3.eigh3)(jnp.asarray(mats))
    assert np.isfinite(np.asarray(w)).all()
    assert np.isfinite(np.asarray(v)).all()
    # Unit-norm vectors even in degenerate cases.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v), axis=-2), 1.0, atol=1e-5
    )


def test_near_degenerate_line_and_plane():
    # A near-perfect line: large gap to the mid eigenvalue; direction must
    # match the line axis.  A near-perfect plane: smallest vector ~ normal.
    rng = np.random.default_rng(3)
    t = rng.normal(size=(128, 5, 1)).astype(np.float32)
    axis = np.array([0.6, 0.64, 0.48], np.float32)
    line_pts = t * axis + rng.normal(size=(128, 5, 3)).astype(np.float32) * 1e-3
    line_pts -= line_pts.mean(axis=1, keepdims=True)
    cov = np.einsum("mki,mkj->mij", line_pts, line_pts)
    _, v = jax.jit(eig3.eigh3_largest)(jnp.asarray(cov))
    dot = np.abs(np.asarray(v) @ axis)
    np.testing.assert_allclose(dot, 1.0, atol=1e-2)

    uv = rng.normal(size=(128, 5, 2)).astype(np.float32)
    basis = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    plane_pts = uv @ basis + rng.normal(size=(128, 5, 3)).astype(np.float32) * 1e-3
    plane_pts -= plane_pts.mean(axis=1, keepdims=True)
    cov = np.einsum("mki,mkj->mij", plane_pts, plane_pts)
    _, v = jax.jit(eig3.eigh3_smallest)(jnp.asarray(cov))
    dot = np.abs(np.asarray(v)[:, 2])
    np.testing.assert_allclose(dot, 1.0, atol=1e-2)
