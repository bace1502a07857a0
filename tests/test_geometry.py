"""Classical geometry utilities (Open3D-bridge parity, lib/o3dutils.py)."""
import numpy as np

from ogmm_tpu.data.geometry import (compute_overlap_ratio, estimate_normals,
                                    fpfh, get_correspondences,
                                    integrate_trans, voxel_downsample)


def test_normals_of_plane_are_z(rng):
    pts = np.concatenate([rng.rand(200, 2), np.zeros((200, 1))],
                         axis=1).astype(np.float32)
    n = estimate_normals(pts, radius=0.3, max_nn=20)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)


def test_voxel_downsample_grid():
    # 8 points at the corners of a 2x2x2 grid, voxel 10 -> one mean point
    pts = np.array([[i, j, k] for i in (0, 1) for j in (0, 1)
                    for k in (0, 1)], np.float32)
    down, rep = voxel_downsample(pts, 10.0)
    assert down.shape == (1, 3)
    np.testing.assert_allclose(down[0], [0.5, 0.5, 0.5])
    # voxel 0.9 -> all 8 survive
    down2, _ = voxel_downsample(pts, 0.9)
    assert down2.shape == (8, 3)


def test_correspondences_identity(rng):
    src = rng.rand(100, 3).astype(np.float32)
    corr = get_correspondences(src, src, np.eye(4), 1e-4)
    # every point matches itself
    self_pairs = {(i, i) for i in range(100)}
    assert self_pairs.issubset({tuple(p) for p in corr})


def test_overlap_ratio_full_and_none(rng):
    src = rng.rand(50, 3).astype(np.float32)
    assert compute_overlap_ratio(src, src, np.eye(4), 0.05) == 1.0
    far = src + 50.0
    assert compute_overlap_ratio(src, far, np.eye(4), 0.05) == 0.0


def test_fpfh_shape_and_rotation_invariance(rng):
    pts = rng.randn(80, 3).astype(np.float32)
    f = fpfh(pts, radius=1.0)
    assert f.shape == (80, 33)
    assert np.all(np.isfinite(f))
    # FPFH built on local frames is invariant to a global rotation
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler('zyx', [20, -35, 50], degrees=True).as_matrix()
    n = estimate_normals(pts, radius=0.51, max_nn=30)
    f1 = fpfh(pts, normals=n, radius=1.0)
    f2 = fpfh(pts @ R.T.astype(np.float32),
              normals=(n @ R.T).astype(np.float32), radius=1.0)
    # angles sitting exactly on a bin edge can flip bins under rotation
    # (fp noise); require near-equality for the overwhelming majority
    close = np.isclose(f1, f2, atol=1e-2)
    assert close.mean() > 0.99, f"only {close.mean():.3%} entries match"


def test_integrate_trans():
    R = np.eye(3); t = np.array([1., 2., 3.])
    T = integrate_trans(R, t)
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[:3, 3], t)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1])
