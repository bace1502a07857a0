"""Unit tests for ogmm_tpu.core.se3 against numpy/scipy ground truth."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from ogmm_tpu.core import se3


def random_rotations(n, rs):
    return Rotation.random(n, random_state=rs).as_matrix().astype(np.float32)


def random_pose44(n, rs):
    rot = random_rotations(n, rs)
    t = rs.randn(n, 3, 1).astype(np.float32)
    g = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    g[:, :3, :3] = rot
    g[:, :3, 3:] = t
    return g


def test_decompose_integrate_roundtrip(rng):
    g = random_pose44(4, rng)
    rot, t = se3.decompose(jnp.asarray(g))
    g2 = se3.integrate(rot, t)
    np.testing.assert_allclose(np.asarray(g2), g, atol=1e-6)


def test_inverse_concatenate_identity(rng):
    g = random_pose44(4, rng)
    inv = se3.inverse(jnp.asarray(g))
    comp = se3.concatenate(jnp.asarray(g), inv)
    eye = np.tile(np.eye(3, 4, dtype=np.float32), (4, 1, 1))
    np.testing.assert_allclose(np.asarray(comp), eye, atol=1e-5)


def test_transform_matches_numpy(rng):
    g = random_pose44(3, rng)
    pts = rng.randn(3, 50, 3).astype(np.float32)
    got = se3.transform(jnp.asarray(g), jnp.asarray(pts))
    want = pts @ g[:, :3, :3].transpose(0, 2, 1) + g[:, :3, 3][:, None, :]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_quat_roundtrip(rng):
    rot = random_rotations(16, rng)
    q = se3.mat2quat(jnp.asarray(rot))
    # unit norm, positive w
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
    assert np.all(np.asarray(q)[:, 0] >= 0)
    rot2 = se3.quat2mat(q)
    np.testing.assert_allclose(np.asarray(rot2), rot, atol=1e-5)


def test_mat2quat_matches_scipy(rng):
    rot = random_rotations(16, rng)
    got = np.asarray(se3.mat2quat(jnp.asarray(rot)))
    want = Rotation.from_matrix(rot).as_quat()  # (x, y, z, w)
    want = np.concatenate([want[:, 3:4], want[:, :3]], axis=-1)
    want = np.where(want[:, :1] < 0, -want, want)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mat2euler_matches_scipy(rng):
    # stay away from gimbal lock: rotations <= 45 deg like the eval protocol
    rotvec = rng.uniform(-0.7, 0.7, size=(32, 3)).astype(np.float32)
    rot = Rotation.from_rotvec(rotvec).as_matrix().astype(np.float32)
    got = np.asarray(se3.mat2euler_zyx_deg(jnp.asarray(rot)))
    want = Rotation.from_matrix(rot).as_euler('zyx', degrees=True)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pose7_roundtrip(rng):
    g = random_pose44(8, rng)
    p7 = se3.mat2pose7(jnp.asarray(g))
    g2 = se3.pose72mat(p7)
    np.testing.assert_allclose(np.asarray(g2), g[:, :3, :], atol=1e-5)
