"""ICP refinement: recovers GT from a perturbed init; degenerate guards hold."""
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from ogmm_tpu.core import se3
from ogmm_tpu.ops import icp_point_to_point, refine_registration


def _setup(rs, B=4, N=256):
    src = rs.randn(B, N, 3).astype(np.float32) * 0.3
    rot = Rotation.from_rotvec(rs.uniform(-0.6, 0.6, (B, 3))).as_matrix().astype(np.float32)
    t = rs.uniform(-0.5, 0.5, (B, 3)).astype(np.float32)
    tgt = (src @ rot.transpose(0, 2, 1) + t[:, None, :])[:, rs.permutation(N)]
    return src, tgt, rot, t


def test_icp_refines_perturbed_init(rng):
    src, tgt, rot, t = _setup(rng)
    B = src.shape[0]
    drot = Rotation.from_rotvec(rng.uniform(-0.08, 0.08, (B, 3))).as_matrix().astype(np.float32)
    init = se3.integrate(jnp.asarray(drot @ rot),
                         jnp.asarray(t + rng.uniform(-0.04, 0.04, (B, 3)).astype(np.float32)))
    Ri, Ti = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init,
                                threshold=0.07, max_iter=30)
    assert Ri.shape == (B, 3, 3) and Ti.shape == (B, 3)  # regression: broadcast bug grew carry
    trace = np.einsum('bii->b', np.asarray(Ri).transpose(0, 2, 1) @ rot)
    rre = np.degrees(np.arccos(np.clip((trace - 1) / 2, -1, 1)))
    rte = np.linalg.norm(np.asarray(Ti) - t, axis=-1)
    assert np.all(rre < 0.5), rre
    assert np.all(rte < 0.01), rte


def test_icp_no_inliers_keeps_init(rng):
    src, tgt, rot, t = _setup(rng, B=2, N=64)
    init = se3.identity_pose((2,))
    Ri, Ti = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init,
                                threshold=0.0, max_iter=5)
    np.testing.assert_allclose(np.asarray(Ri), np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ti), 0.0, atol=1e-6)


def test_icp_degenerate_clouds_finite():
    z = jnp.zeros((2, 32, 3))
    Ri, Ti = icp_point_to_point(z, z, se3.identity_pose((2,)), threshold=0.1,
                                max_iter=3)
    assert np.all(np.isfinite(np.asarray(Ri)))
    np.testing.assert_allclose(np.asarray(Ri), np.tile(np.eye(3), (2, 1, 1)), atol=1e-5)


def test_refine_registration_wrapper(rng):
    src, tgt, rot, t = _setup(rng, B=2, N=128)
    Ri, Ti = refine_registration(jnp.asarray(src), jnp.asarray(tgt),
                                 jnp.asarray(rot), jnp.asarray(t),
                                 voxel_size=0.035)
    assert Ri.shape == (2, 3, 3) and Ti.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(Ri)))
