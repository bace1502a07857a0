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


_AXES = np.array([1.0, 0.75, 0.55])     # ellipsoid semi-axes (no symmetry)


def _smooth_partial_pair(rs, B=3, N=400, jitter=0.002):
    """Partial-overlap pairs sampled from a smooth ANISOTROPIC surface (an
    ellipsoid — a sphere is rotation-degenerate for point-to-plane): src and
    tgt keep different half-spaces with an overlapping band; tgt is a
    transformed resample + jitter. Returns the tgt surface normals too."""
    from scipy.spatial.transform import Rotation
    src_list, tgt_list, rots, ts, norms = [], [], [], [], []
    for b in range(B):
        pts = rs.randn(4 * N, 3)
        pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * _AXES
        src = pts[pts[:, 0] < 0.35][:N]
        tgt0 = pts[pts[:, 0] > -0.35][-N:]
        # analytic ellipsoid normal before transform: n ∝ p / axes²
        n0 = tgt0 / (_AXES ** 2)
        n0 /= np.linalg.norm(n0, axis=1, keepdims=True)
        rot = Rotation.from_rotvec(rs.uniform(-0.3, 0.3, 3)).as_matrix()
        t = rs.uniform(-0.2, 0.2, 3)
        tgt = tgt0 @ rot.T + t + rs.randn(N, 3) * jitter
        src_list.append(src); tgt_list.append(tgt)
        rots.append(rot); ts.append(t); norms.append(n0 @ rot.T)
    return (np.stack(src_list).astype(np.float32),
            np.stack(tgt_list).astype(np.float32),
            np.stack(rots).astype(np.float32),
            np.stack(ts).astype(np.float32),
            np.stack(norms).astype(np.float32))


def _rre(R_pred, R_gt):
    trace = np.einsum('bii->b', np.asarray(R_pred).transpose(0, 2, 1) @ R_gt)
    return np.degrees(np.arccos(np.clip((trace - 1) / 2, -1, 1)))


def test_icp_point_to_plane_refines_at_least_as_well(rng):
    """VERDICT r1 #8: on smooth partial-overlap pairs, the point-to-plane
    option (reference lib/o3dutils.py:176-185) refines at least as well as
    point-to-point from the same perturbed init."""
    from scipy.spatial.transform import Rotation
    from ogmm_tpu.ops import icp_point_to_plane
    src, tgt, rot, t, _ = _smooth_partial_pair(rng)
    B = src.shape[0]
    drot = Rotation.from_rotvec(
        rng.uniform(-0.06, 0.06, (B, 3))).as_matrix().astype(np.float32)
    init = se3.integrate(
        jnp.asarray(drot @ rot),
        jnp.asarray(t + rng.uniform(-0.03, 0.03, (B, 3)).astype(np.float32)))
    rre0 = _rre(np.asarray(init)[:, :3, :3], rot)

    Rp, Tp = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init,
                                threshold=0.08, max_iter=30)
    Rl, Tl = icp_point_to_plane(jnp.asarray(src), jnp.asarray(tgt), init,
                                threshold=0.08, max_iter=30)
    rre_p, rre_l = _rre(Rp, rot), _rre(Rl, rot)
    rte_l = np.linalg.norm(np.asarray(Tl) - t, axis=-1)
    assert np.all(np.isfinite(np.asarray(Rl)))
    assert np.all(rre_l < rre0), (rre_l, rre0)          # improves the init
    assert rre_l.mean() <= rre_p.mean() + 0.05, (rre_l, rre_p)
    assert np.all(rte_l < 0.05), rte_l


def test_icp_point_to_plane_precomputed_normals(rng):
    """Supplying exact analytic surface normals must converge tightly."""
    from scipy.spatial.transform import Rotation
    from ogmm_tpu.ops import icp_point_to_plane
    src, tgt, rot, t, n_exact = _smooth_partial_pair(rng, jitter=0.0)
    B = src.shape[0]
    drot = Rotation.from_rotvec(
        rng.uniform(-0.05, 0.05, (B, 3))).as_matrix().astype(np.float32)
    init = se3.integrate(jnp.asarray(drot @ rot), jnp.asarray(t))
    R1, _ = icp_point_to_plane(jnp.asarray(src), jnp.asarray(tgt), init,
                               threshold=0.08, max_iter=20,
                               tgt_normals=jnp.asarray(n_exact))
    assert np.all(_rre(R1, rot) < 0.5), _rre(R1, rot)


def test_icp_point_to_plane_no_inliers_keeps_init(rng):
    from ogmm_tpu.ops import icp_point_to_plane
    src, tgt, rot, t = _setup(rng, B=2, N=64)
    init = se3.identity_pose((2,))
    Ri, Ti = icp_point_to_plane(jnp.asarray(src), jnp.asarray(tgt), init,
                                threshold=0.0, max_iter=5)
    np.testing.assert_allclose(np.asarray(Ri), np.tile(np.eye(3), (2, 1, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ti), 0.0, atol=1e-6)


def test_refine_registration_pl_flag(rng):
    src, tgt, rot, t, _ = _smooth_partial_pair(rng, B=2)
    Rl, Tl = refine_registration(jnp.asarray(src), jnp.asarray(tgt),
                                 jnp.asarray(rot), jnp.asarray(t),
                                 voxel_size=0.04, pl=True)
    assert Rl.shape == (2, 3, 3) and Tl.shape == (2, 3)
    assert np.all(_rre(Rl, rot) < 1.0)


def test_icp_pallas_whole_loop_matches_jnp():
    """The fused whole-loop ICP kernel (ops/pallas_icp.py, interpreter mode)
    reproduces the jnp scan path step for step (same 1-NN ties, inlier gate,
    Horn power-iteration solve)."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from ogmm_tpu.core import se3
    from ogmm_tpu.ops.icp import icp_point_to_point
    from ogmm_tpu.ops.pallas_icp import icp_pallas

    rs = np.random.RandomState(17)
    B, N = 3, 96
    src = rs.randn(B, N, 3).astype(np.float32) * 0.3
    rot = Rotation.from_rotvec(
        rs.uniform(-.5, .5, (B, 3))).as_matrix().astype(np.float32)
    t = rs.uniform(-.4, .4, (B, 3)).astype(np.float32)
    tgt = (src @ rot.transpose(0, 2, 1) + t[:, None, :])[:, rs.permutation(N)]
    drot = Rotation.from_rotvec(
        rs.uniform(-.1, .1, (B, 3))).as_matrix().astype(np.float32)
    init = se3.integrate(jnp.asarray(drot @ rot), jnp.asarray(t))
    thr = 0.07
    r_j, t_j = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init,
                                  thr, max_iter=20, method="horn_pi",
                                  use_pallas=False)
    r_p, t_p = icp_pallas(jnp.asarray(src), jnp.asarray(tgt), init,
                          thr * thr, iters=20, interpret=True)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_j),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_j),
                               rtol=1e-5, atol=1e-5)


def test_icp_grid_is_opt_in_only(rng, monkeypatch):
    """The grid 1-NN route never engages unless use_grid=True: the r3
    on-chip A/B measured it ~20x slower than the streamed 1-NN at N=M=35k
    and the cap-32 build faulted the TPU worker (ops/icp.py:_maybe_grid).
    An explicit use_pallas NN path conflicts with use_grid=True."""
    import pytest
    import ogmm_tpu.ops.grid_nn as grid_nn

    def boom(*a, **k):
        raise AssertionError("grid must not engage")

    monkeypatch.setattr(grid_nn, 'build_grid', boom)
    B, N, M = 1, 16, 4201                   # M > 4096: old auto territory
    src = rng.randn(B, N, 3).astype(np.float32)
    tgt = rng.randn(B, M, 3).astype(np.float32)
    init = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    for kw in (dict(use_pallas=False), dict()):     # forced and auto paths
        R, T = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init,
                                  threshold=0.07, max_iter=2, **kw)
        assert np.all(np.isfinite(np.asarray(R)))
    with pytest.raises(ValueError, match="use_grid"):
        icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init,
                           threshold=0.07, max_iter=2,
                           use_grid=True, use_pallas=False)


def test_grid_icp_serving_trace_has_no_host_callback(rng):
    """The grid-cap saturation warning is a jax.debug.print — a host
    callback, which is a hidden sync on TPU and UNIMPLEMENTED over
    callback-less PJRT transports (it broke the on-chip indoor bench, r3).
    Default serving traces must not contain one; the warning appears only
    under dispatch.set_debug_callbacks(True)."""
    from ogmm_tpu.ops.dispatch import debug_callbacks_override

    B, N, M = 1, 16, 4201                   # M > 4096: grid auto-route
    src = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    init = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    def lowered_text(max_iter):
        # distinct static max_iter per call: the gate is resolved at trace
        # time and jit would otherwise reuse the cached trace (the switch
        # is process-global and pre-trace, like dispatch.set_pallas)
        return icp_point_to_point.lower(
            src, tgt, init, threshold=0.07, max_iter=max_iter,
            use_grid=True).as_text()

    assert "callback" not in lowered_text(2)
    with debug_callbacks_override(True):
        assert "callback" in lowered_text(3)


def test_icp_spatial_route_matches_dense(rng, monkeypatch):
    """The large-M spatial auto route (Morton-sorted loop + culled
    streamed 1-NN gated at threshold^2, ops/icp.py) must refine to the
    same transform as the forced dense path — ICP is permutation-
    equivariant and the cull only skips blocks the inlier gate would
    discard. Runs the Pallas kernel in interpreter mode via monkeypatch
    (the auto route requires a TPU-ish dispatch, forced here)."""
    import functools
    import ogmm_tpu.ops.pallas_stream as ps
    from ogmm_tpu.ops.dispatch import pallas_override
    from scipy.spatial.transform import Rotation

    B, N = 2, 4201                              # M > 4096: spatial territory
    src = rng.randn(B, N, 3).astype(np.float32) * 0.3
    rot = Rotation.from_rotvec(
        rng.uniform(-.3, .3, (B, 3))).as_matrix().astype(np.float32)
    t = rng.uniform(-.2, .2, (B, 3)).astype(np.float32)
    tgt = (np.einsum('bij,bnj->bni', rot, src) + t[:, None])
    drot = Rotation.from_rotvec(
        rng.uniform(-.05, .05, (B, 3))).as_matrix().astype(np.float32)
    init = jnp.concatenate([
        jnp.asarray(np.einsum('bij,bjk->bik', drot, rot)),
        jnp.asarray(t)[..., None]], axis=-1)
    init = jnp.concatenate([init, jnp.broadcast_to(
        jnp.asarray([0, 0, 0, 1], jnp.float32), (B, 1, 4))], axis=1)

    monkeypatch.setattr(ps, 'nn1_stream',
                        functools.partial(ps.nn1_stream, interpret=True))
    with pallas_override(True):
        Rs, Ts = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt),
                                    init, threshold=0.07, max_iter=8)
    Rd, Td = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init,
                                threshold=0.07, max_iter=8,
                                use_pallas=False)
    np.testing.assert_allclose(np.asarray(Rs), np.asarray(Rd),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Ts), np.asarray(Td),
                               rtol=1e-4, atol=1e-4)
    # and it genuinely refines
    tr = np.einsum('bii->b', np.asarray(Rs).transpose(0, 2, 1) @ rot)
    rre = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
    assert np.all(rre < 0.5), rre
