"""Procrustes solver: recover known transforms; gradients stay finite."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from ogmm_tpu.core.procrustes import rigid_transform


def make_problem(rs, B=4, N=64, noise=0.0):
    src = rs.randn(B, N, 3).astype(np.float32)
    rot = Rotation.random(B, random_state=rs).as_matrix().astype(np.float32)
    t = rs.randn(B, 3).astype(np.float32)
    corr = src @ rot.transpose(0, 2, 1) + t[:, None, :]
    if noise:
        corr = corr + noise * rs.randn(*corr.shape).astype(np.float32)
    return src, corr, rot, t


@pytest.mark.parametrize("method", ["horn", "svd"])
def test_exact_recovery(rng, method):
    src, corr, rot, t = make_problem(rng)
    w = np.ones(src.shape[:2], dtype=np.float32)
    R, T = rigid_transform(jnp.asarray(src), jnp.asarray(corr), jnp.asarray(w),
                           method=method)
    # horn (4x4 eigh) is ~1e3x more accurate than jnp fp32 SVD; both acceptable
    atol = 1e-4 if method == "horn" else 5e-3
    np.testing.assert_allclose(np.asarray(R), rot, atol=atol)
    np.testing.assert_allclose(np.asarray(T)[..., 0], t, atol=atol)


@pytest.mark.parametrize("method", ["horn", "svd"])
def test_weighted_recovery(rng, method):
    """Outlier points with zero weight must not affect the solution."""
    src, corr, rot, t = make_problem(rng)
    corr_noisy = corr.copy()
    corr_noisy[:, :10] += 100.0  # corrupt 10 points
    w = np.ones(src.shape[:2], dtype=np.float32)
    w[:, :10] = 0.0
    R, T = rigid_transform(jnp.asarray(src), jnp.asarray(corr_noisy),
                           jnp.asarray(w), method=method)
    atol = 1e-4 if method == "horn" else 5e-3
    np.testing.assert_allclose(np.asarray(R), rot, atol=atol)
    np.testing.assert_allclose(np.asarray(T)[..., 0], t, atol=atol)


def test_proper_rotation(rng):
    src, corr, rot, t = make_problem(rng, noise=0.1)
    w = rng.rand(src.shape[0], src.shape[1]).astype(np.float32)
    R, _ = rigid_transform(jnp.asarray(src), jnp.asarray(corr), jnp.asarray(w))
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)
    rtr = np.asarray(R) @ np.asarray(R).transpose(0, 2, 1)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (4, 1, 1)), atol=1e-4)


def test_degenerate_input_is_finite(rng):
    """All-identical points (rank-0 covariance) must not produce NaNs
    (reference falls back via try/except, lib/se3.py:274-279)."""
    src = np.zeros((2, 32, 3), dtype=np.float32)
    corr = np.zeros((2, 32, 3), dtype=np.float32)
    w = np.ones((2, 32), dtype=np.float32)
    R, T = rigid_transform(jnp.asarray(src), jnp.asarray(corr), jnp.asarray(w))
    assert np.all(np.isfinite(np.asarray(R)))
    assert np.all(np.isfinite(np.asarray(T)))


def test_nonfinite_input_gives_identity(rng):
    src = np.full((1, 8, 3), np.nan, dtype=np.float32)
    corr = np.zeros((1, 8, 3), dtype=np.float32)
    w = np.ones((1, 8), dtype=np.float32)
    R, T = rigid_transform(jnp.asarray(src), jnp.asarray(corr), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)


def test_gradients_finite(rng):
    src, corr, rot, t = make_problem(rng, B=2, N=32, noise=0.05)
    w = np.ones(src.shape[:2], dtype=np.float32)

    def loss(corr_):
        R, T = rigid_transform(jnp.asarray(src), corr_, jnp.asarray(w))
        return (R.sum() + T.sum())

    g = jax.grad(loss)(jnp.asarray(corr))
    assert np.all(np.isfinite(np.asarray(g)))


def test_horn_power_iteration_matches_eigh(rng):
    """The shifted power-iteration Horn solve agrees with the eigh solve."""
    import jax.numpy as jnp
    from ogmm_tpu.core.procrustes import rigid_transform
    from scipy.spatial.transform import Rotation
    B, N = 6, 80
    src = rng.randn(B, N, 3).astype(np.float32)
    R = Rotation.random(B, random_state=4).as_matrix().astype(np.float32)
    t = rng.randn(B, 3).astype(np.float32)
    corr = np.einsum('bij,bnj->bni', R, src) + t[:, None]
    corr += 0.02 * rng.randn(B, N, 3).astype(np.float32)
    w = rng.rand(B, N).astype(np.float32)
    r1, t1 = rigid_transform(jnp.asarray(src), jnp.asarray(corr),
                             jnp.asarray(w), method="horn")
    r2, t2 = rigid_transform(jnp.asarray(src), jnp.asarray(corr),
                             jnp.asarray(w), method="horn_pi")
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                               rtol=1e-3, atol=1e-4)
    # proper rotations
    det = np.linalg.det(np.asarray(r2))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)
