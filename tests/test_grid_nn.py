"""Uniform-grid fixed-radius 1-NN (ops/grid_nn.py): exactness under the ICP
inlier gate, cap-overflow safety, and end-to-end ICP path equivalence.

The grid replaces the dense/streamed per-trip 1-NN inside large-M ICP
(reference lib/o3dutils.py:172-214 gates every correspondence at
`max_correspondence_distance`, so only within-radius neighbours are ever
consumed). The contract tested here:
  * any query whose true NN lies within `cell` gets EXACTLY that neighbour
    (same index; distance equal up to fp reassociation);
  * any query whose true NN lies beyond `cell` is gated identically on both
    paths (grid d2 is either +inf or >= cell^2 — weight 0 either way);
  * with a saturating `cap` the result can only move AWAY from the true NN
    (never invents a closer point), and `max_occupancy` reports saturation.
"""
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from ogmm_tpu.core import se3
from ogmm_tpu.ops import icp_point_to_point, icp_point_to_plane
from ogmm_tpu.ops.grid_nn import build_grid, nn1_radius


def _dense_nn(q, tgt):
    d = np.maximum(((q[:, :, None, :] - tgt[:, None, :, :]) ** 2).sum(-1),
                   1e-12)
    return d.min(-1), d.argmin(-1)


def test_grid_nn_gate_equivalence(rng):
    B, N, M, cell = 3, 300, 500, 0.3
    tgt = rng.randn(B, M, 3).astype(np.float32)
    q = rng.randn(B, N, 3).astype(np.float32)
    g = build_grid(jnp.asarray(tgt), cell=cell)
    d2, idx = nn1_radius(jnp.asarray(q), g, cell=cell, cap=16)
    d2, idx = np.asarray(d2), np.asarray(idx)
    bd, bi = _dense_nn(q, tgt)
    inlier = bd < cell * cell
    assert inlier.any() and (~inlier).any()  # exercise both regimes
    np.testing.assert_array_equal(idx[inlier], bi[inlier])
    np.testing.assert_allclose(d2[inlier], bd[inlier], rtol=1e-6)
    # out-of-radius queries: both paths produce weight 0 under d2 < cell^2
    assert np.all(d2[~inlier] >= cell * cell)


def test_grid_nn_tight_cloud_single_cell(rng):
    # whole cloud inside one cell: grid must degrade to exact dense 1-NN
    B, N, cell = 2, 128, 10.0
    tgt = rng.randn(B, N, 3).astype(np.float32)
    q = rng.randn(B, N, 3).astype(np.float32)
    g = build_grid(jnp.asarray(tgt), cell=cell)
    assert int(np.asarray(g.max_occupancy).max()) == N
    d2, idx = nn1_radius(jnp.asarray(q), g, cell=cell, cap=N)
    bd, bi = _dense_nn(q, tgt)
    np.testing.assert_array_equal(np.asarray(idx), bi)
    np.testing.assert_allclose(np.asarray(d2), bd, rtol=1e-6)


def test_grid_nn_cap_overflow_never_closer(rng):
    # saturating cap drops candidates — the survivor distance can only grow,
    # and whatever index is returned really is at the reported distance
    B, N, M, cell = 2, 200, 400, 0.5
    tgt = rng.randn(B, M, 3).astype(np.float32) * 0.4   # dense occupancy
    q = rng.randn(B, N, 3).astype(np.float32) * 0.4
    g = build_grid(jnp.asarray(tgt), cell=cell)
    assert int(np.asarray(g.max_occupancy).max()) > 2   # cap=2 saturates
    d2, idx = nn1_radius(jnp.asarray(q), g, cell=cell, cap=2)
    d2, idx = np.asarray(d2), np.asarray(idx)
    bd, _ = _dense_nn(q, tgt)
    finite = np.isfinite(d2)
    assert np.all(d2[finite] >= bd[finite] - 1e-6)
    gathered = tgt[np.arange(B)[:, None], idx]          # (B, N, 3)
    true_d = np.maximum(((q - gathered) ** 2).sum(-1), 1e-12)
    np.testing.assert_allclose(d2[finite], true_d[finite], rtol=1e-6)


def test_grid_nn_empty_stencil_is_inf():
    tgt = jnp.zeros((1, 8, 3))
    q = jnp.full((1, 4, 3), 100.0)                      # far outside
    g = build_grid(tgt, cell=0.1)
    d2, _ = nn1_radius(q, g, cell=0.1, cap=4)
    assert np.all(np.isinf(np.asarray(d2)))


def _rigid_problem(rs, B=2, N=512):
    src = rs.randn(B, N, 3).astype(np.float32) * 0.3
    rot = Rotation.from_rotvec(
        rs.uniform(-0.6, 0.6, (B, 3))).as_matrix().astype(np.float32)
    t = rs.uniform(-0.5, 0.5, (B, 3)).astype(np.float32)
    tgt = (src @ rot.transpose(0, 2, 1) + t[:, None, :])[:, rs.permutation(N)]
    drot = Rotation.from_rotvec(
        rs.uniform(-0.06, 0.06, (B, 3))).as_matrix().astype(np.float32)
    init = se3.integrate(jnp.asarray(drot @ rot), jnp.asarray(t))
    return src, tgt, rot, t, init


def test_icp_grid_path_matches_dense_path(rng):
    src, tgt, rot, t, init = _rigid_problem(rng)
    kw = dict(threshold=0.07, max_iter=15)
    Rd, Td = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init,
                                use_grid=False, **kw)
    Rg, Tg = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init,
                                use_grid=True, **kw)
    # identical correspondences each trip -> near-identical trajectories
    np.testing.assert_allclose(np.asarray(Rg), np.asarray(Rd), atol=5e-5)
    np.testing.assert_allclose(np.asarray(Tg), np.asarray(Td), atol=5e-5)
    trace = np.einsum('bii->b', np.asarray(Rg).transpose(0, 2, 1) @ rot)
    rre = np.degrees(np.arccos(np.clip((trace - 1) / 2, -1, 1)))
    assert np.all(rre < 0.5), rre


def test_icp_plane_grid_path_matches_dense_path(rng):
    src, tgt, rot, t, init = _rigid_problem(rng)
    kw = dict(threshold=0.07, max_iter=10)
    Rd, Td = icp_point_to_plane(jnp.asarray(src), jnp.asarray(tgt), init,
                                use_grid=False, **kw)
    Rg, Tg = icp_point_to_plane(jnp.asarray(src), jnp.asarray(tgt), init,
                                use_grid=True, **kw)
    np.testing.assert_allclose(np.asarray(Rg), np.asarray(Rd), atol=5e-5)
    np.testing.assert_allclose(np.asarray(Tg), np.asarray(Td), atol=5e-5)


def test_icp_grid_no_inliers_keeps_init(rng):
    src = rng.randn(2, 64, 3).astype(np.float32)
    tgt = src + 50.0                                    # far beyond threshold
    init = se3.identity_pose((2,))
    Ri, Ti = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init,
                                threshold=0.05, max_iter=5, use_grid=True)
    np.testing.assert_allclose(np.asarray(Ri),
                               np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ti), 0.0, atol=1e-6)
