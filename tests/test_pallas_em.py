"""Fused Pallas Sinkhorn-EM kernel vs the jnp reference composition.

Runs in interpreter mode on the CPU test platform (the TPU-compiled path is
exercised on-chip by bench.py / the verify flow); parity here is numerical,
comparing against ops/gmm.py's scan-of-sinkhorn composition.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ogmm_tpu.ops.common import index_points
from ogmm_tpu.ops.fps import farthest_point_sample
from ogmm_tpu.ops.gmm import _em_jnp, gmm_params, wkeans_plus
from ogmm_tpu.ops.pallas_em import sinkhorn_em


def _inputs(rng, B=2, N=96, K=16):
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.4)
    o = jnp.asarray(rng.rand(B, N).astype(np.float32))
    o = o / jnp.maximum(o.sum(axis=-1, keepdims=True), 1e-4)
    ids = farthest_point_sample(xyz, K, is_center=True)
    nodes0 = index_points(xyz, ids)
    return xyz, o, nodes0


def test_fused_em_matches_jnp_reference(rng):
    xyz, o, nodes0 = _inputs(rng)
    g_ref, pi_ref, n_ref = _em_jnp(xyz, o, nodes0, iters=4, tau=1.0)
    g, pi, n = sinkhorn_em(xyz, o, nodes0, iters=4, sk_iters=10, tau=1.0,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(pi_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(n), np.asarray(n_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_em_unaligned_shapes(rng):
    # N=717-like unaligned sublane count, K not a lane multiple
    xyz, o, nodes0 = _inputs(rng, B=1, N=101, K=8)
    g_ref, pi_ref, n_ref = _em_jnp(xyz, o, nodes0, iters=2, tau=0.5)
    g, pi, n = sinkhorn_em(xyz, o, nodes0, iters=2, sk_iters=10, tau=0.5,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n), np.asarray(n_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_em_multicloud_matches_single(rng):
    """clouds_per_block interleaves C chains per grid step; per-cloud math
    is op-for-op the C=1 kernel's — results must be exact."""
    xyz, o, nodes0 = _inputs(rng, B=8, N=96, K=16)
    g1, pi1, n1 = sinkhorn_em(xyz, o, nodes0, iters=4, sk_iters=10, tau=1.0,
                              interpret=True)
    for C in (2, 4, 8):
        gC, piC, nC = sinkhorn_em(xyz, o, nodes0, iters=4, sk_iters=10,
                                  tau=1.0, interpret=True,
                                  clouds_per_block=C)
        np.testing.assert_array_equal(np.asarray(gC), np.asarray(g1))
        np.testing.assert_array_equal(np.asarray(piC), np.asarray(pi1))
        np.testing.assert_array_equal(np.asarray(nC), np.asarray(n1))


def test_auto_clouds_per_block_gate():
    """The C selector must honour the lane-padded VMEM footprint (~10
    f32 (N, max(K,128)) resident blocks per cloud, 12 MB headroom) and
    the B-divisibility contract."""
    from ogmm_tpu.ops.pallas_em import auto_clouds_per_block

    # bench shape: per-cloud 720*128*4*10 = 3.69 MB -> C=4 would cross
    # the 12 MB band (14.7 MB), C=2 fits.
    assert auto_clouds_per_block(48, 717, 128) == 2
    # small clouds: C=4 fits comfortably.
    assert auto_clouds_per_block(8, 96, 16) == 4
    # B not divisible by 4 falls to 2, odd B to 1 — never pad/split.
    assert auto_clouds_per_block(6, 96, 16) == 2
    assert auto_clouds_per_block(5, 96, 16) == 1
    # big-N: even C=2 exceeds the band (2 * 10.5 MB) -> single-cloud.
    assert auto_clouds_per_block(4, 2048, 128) == 1
    # K below the 128-lane pad must cost the same as K=128 (the r3
    # lane-padding lesson): same verdicts as K=128 at these shapes.
    assert auto_clouds_per_block(48, 717, 16) == 2
    assert auto_clouds_per_block(4, 2048, 16) == 1


def test_fused_em_multicloud_guards(rng):
    xyz, o, nodes0 = _inputs(rng, B=2, N=32, K=8)
    import pytest
    with pytest.raises(ValueError, match="divide"):
        sinkhorn_em(xyz, o, nodes0, clouds_per_block=3, interpret=True)
    with pytest.raises(ValueError, match="mxu_lse"):
        sinkhorn_em(xyz, o, nodes0, clouds_per_block=2, mxu_lse=False,
                    interpret=True)


def test_wkeans_plus_pallas_flag_parity(rng):
    B, N, K, C = 2, 64, 8, 32
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    o = jnp.asarray(rng.rand(B, N).astype(np.float32))

    out_jnp = wkeans_plus(xyz, feats, o, K, iters=3, use_pallas=False)

    # route the pallas path through the interpreter on CPU
    import ogmm_tpu.ops.pallas_em as pe
    orig = pe.sinkhorn_em
    import functools
    try:
        pe.sinkhorn_em = functools.partial(orig, interpret=True)
        out_pl = wkeans_plus(xyz, feats, o, K, iters=3, use_pallas=True)
    finally:
        pe.sinkhorn_em = orig

    names = ["gamma", "pi", "node_xyz", "node_feats"]
    for name, a, b in zip(names, out_jnp, out_pl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_pallas_override_context():
    import jax
    from ogmm_tpu.ops.dispatch import pallas_override, set_pallas, use_pallas
    set_pallas(None)
    base = use_pallas()          # auto (cpu test platform -> False)
    assert base is False
    with pallas_override(True):
        assert use_pallas() is True
        with pallas_override(False):
            assert use_pallas() is False
        assert use_pallas() is True
    assert use_pallas() is base
