"""Model layer: shape/finiteness smoke + gradient flow + registration sanity.

Tiny dims throughout (CPU-host compile budget); real-size runs happen in
bench.py on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ogmm_tpu.configs import ModelConfig
from ogmm_tpu.nn import DGCNN, DeepGMR, GMMReg, gmm_register, gmm_svd
from ogmm_tpu.nn.attention import PositionEncoding, TransformerBlock

TINY = ModelConfig(emb_dims=32, n_clusters=8, km_clusters=8, num_heads=2,
                   gnn_k=8, pos_k=4, em_iters=3, sinkhorn_iters=5, icp_iters=3)


def _pair(rng, B=2, N=48):
    src = rng.randn(B, N, 3).astype(np.float32)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler('zyx', rng.uniform(-30, 30, (B, 3)),
                            degrees=True).as_matrix().astype(np.float32)
    t = 0.2 * rng.randn(B, 3).astype(np.float32)
    tgt = np.einsum('bij,bnj->bni', R, src) + t[:, None]
    return jnp.asarray(src), jnp.asarray(tgt), R, t


@pytest.fixture(scope="module")
def pair():
    return _pair(np.random.RandomState(1))


def test_dgcnn_shapes(pair):
    src, _, _, _ = pair
    model = DGCNN(emb_dims=32, k=8)
    vars_ = model.init(jax.random.PRNGKey(0), src, train=False)
    out = model.apply(vars_, src, train=False)
    assert out.shape == (src.shape[0], src.shape[1], 32)
    assert np.all(np.isfinite(np.asarray(out)))
    assert 'batch_stats' in vars_


def test_position_encoding_shape(pair):
    src, _, _, _ = pair
    model = PositionEncoding(dim=32)
    vars_ = model.init(jax.random.PRNGKey(0), src, 4, train=False)
    out = model.apply(vars_, src, 4, train=False)
    assert out.shape == (src.shape[0], src.shape[1], 32)


def test_transformer_block_cross_shapes(pair):
    src, _, _, _ = pair
    feats = jnp.asarray(np.random.RandomState(2).randn(2, 48, 32), jnp.float32)
    anchors = feats[:, :8]
    model = TransformerBlock(32, 2)
    vars_ = model.init(jax.random.PRNGKey(0), feats, anchors)
    out = model.apply(vars_, feats, anchors)
    assert out.shape == feats.shape


def test_gmm_svd_recovers_transform(rng):
    # perfectly matched node sets with distinctive features -> exact recovery
    B, K = 2, 8
    nodes = rng.randn(B, K, 3).astype(np.float32)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler('zyx', rng.uniform(-30, 30, (B, 3)),
                            degrees=True).as_matrix().astype(np.float32)
    t = 0.3 * rng.randn(B, 3).astype(np.float32)
    tgt_nodes = np.einsum('bij,bkj->bki', R, nodes) + t[:, None]
    feats = np.eye(K, dtype=np.float32)[None].repeat(B, 0) * 10.0  # orthogonal
    pi = np.full((B, K), 1.0 / K, dtype=np.float32)
    rot, trans, _, _ = gmm_svd(jnp.asarray(nodes), jnp.asarray(tgt_nodes),
                               jnp.asarray(feats), jnp.asarray(feats),
                               jnp.asarray(pi), jnp.asarray(pi))
    np.testing.assert_allclose(np.asarray(rot), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(trans), t, atol=1e-3)


def test_gmm_svd_sinkhorn_path_recovers_transform(rng):
    """is_sk=True (Sinkhorn-OT matching, models/dgcnn.py:96-108): the live
    reference option GMMReg doesn't default to — must also recover a known
    rigid transform from matched nodes."""
    B, K = 2, 8
    nodes = rng.randn(B, K, 3).astype(np.float32)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler('zyx', rng.uniform(-30, 30, (B, 3)),
                            degrees=True).as_matrix().astype(np.float32)
    t = 0.3 * rng.randn(B, 3).astype(np.float32)
    tgt_nodes = np.einsum('bij,bkj->bki', R, nodes) + t[:, None]
    feats = np.eye(K, dtype=np.float32)[None].repeat(B, 0) * 10.0
    pi = np.full((B, K), 1.0 / K, dtype=np.float32)
    rot, trans, _, _ = gmm_svd(jnp.asarray(nodes), jnp.asarray(tgt_nodes),
                               jnp.asarray(feats), jnp.asarray(feats),
                               jnp.asarray(pi), jnp.asarray(pi), is_sk=True)
    np.testing.assert_allclose(np.asarray(rot), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(trans), t, atol=1e-3)


def test_gmmreg_forward_is_sk(pair):
    """The full network runs (and stays finite) with the Sinkhorn matching
    branch enabled, matching the reference's is_sk config flag."""
    import dataclasses
    src, tgt, _, _ = pair
    model = GMMReg(cfg=dataclasses.replace(TINY, is_sk=True))
    vars_ = model.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                       train=False)
    rot, trans, src_o, tgt_o, clu = model.apply(vars_, src, tgt, train=False)
    assert np.all(np.isfinite(np.asarray(rot)))
    assert np.all(np.isfinite(np.asarray(trans)))
    np.testing.assert_allclose(np.linalg.det(np.asarray(rot)), 1.0, atol=1e-3)


def test_gmmreg_forward_shapes_and_grad(pair):
    src, tgt, _, _ = pair
    model = GMMReg(cfg=TINY)
    vars_ = model.init({'params': jax.random.PRNGKey(0)}, src, tgt, train=False)

    rot, trans, src_o, tgt_o, clu = model.apply(vars_, src, tgt, train=False)
    B, N = src.shape[0], src.shape[1]
    assert rot.shape == (B, 3, 3)
    assert trans.shape == (B, 3)
    assert src_o.shape == (B, N) and tgt_o.shape == (B, N)
    assert np.all(np.isfinite(np.asarray(rot)))
    # proper rotation
    dets = np.linalg.det(np.asarray(rot))
    np.testing.assert_allclose(dets, 1.0, atol=1e-3)
    assert np.all((np.asarray(src_o) >= 0) & (np.asarray(src_o) <= 1))

    # gradient flows into DGCNN params through the full pipeline
    def loss_fn(params):
        out = model.apply(
            {'params': params, 'batch_stats': vars_['batch_stats']},
            src, tgt, train=True, mutable=['batch_stats'])
        (rot, trans, so, to, clu) = out[0]
        return jnp.sum(rot ** 2) + jnp.sum(trans ** 2) + clu + jnp.sum(so)

    g = jax.grad(loss_fn)(vars_['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0.0


def test_gmmreg_test_mode_icp(pair):
    src, tgt, R, t = pair
    model = GMMReg(cfg=TINY)
    vars_ = model.init({'params': jax.random.PRNGKey(0)}, src, tgt, train=False)
    rot, trans, _, _, _ = model.apply(vars_, src, tgt, train=False, is_test=True)
    assert rot.shape == (2, 3, 3) and trans.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(rot)))


def test_deepgmr_forward_and_quirk(pair):
    src, tgt, _, _ = pair
    model = DeepGMR(cfg=TINY)
    vars_ = model.init(jax.random.PRNGKey(0), src, tgt, train=False)
    rot, trans = model.apply(vars_, src, tgt, train=False)
    assert rot.shape == (2, 3, 3)
    # reference quirk: translation is the (zero) bottom row (baseline/deepgmr.py:79)
    np.testing.assert_allclose(np.asarray(trans), 0.0, atol=1e-7)
    fixed = DeepGMR(cfg=TINY, quirk_translation_row=False)
    vars2 = fixed.init(jax.random.PRNGKey(0), src, tgt, train=False)
    _, trans2 = fixed.apply(vars2, src, tgt, train=False)
    assert float(jnp.abs(trans2).sum()) > 0.0


def test_gmm_register_exact_recovery(rng):
    B, K = 2, 8
    mu_s = rng.randn(B, K, 3).astype(np.float32)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler('zyx', rng.uniform(-30, 30, (B, 3)),
                            degrees=True).as_matrix().astype(np.float32)
    t = 0.3 * rng.randn(B, 3).astype(np.float32)
    mu_t = np.einsum('bij,bkj->bki', R, mu_s) + t[:, None]
    pi = np.full((B, K), 1.0 / K, dtype=np.float32)
    sigma = np.broadcast_to(0.1 * np.eye(3, dtype=np.float32), (B, K, 3, 3)).copy()
    T = gmm_register(jnp.asarray(pi), jnp.asarray(mu_s), jnp.asarray(mu_t),
                     jnp.asarray(sigma))
    np.testing.assert_allclose(np.asarray(T[:, :3, :3]), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(T[:, :3, 3]), t, atol=1e-3)


def test_gmmreg_bf16_matches_fp32(pair):
    """bf16 network body must register within recall tolerance of fp32.

    The bf16 policy casts only the dense/attention stack; geometry (kNN, FPS,
    EM clustering, Procrustes) stays fp32, so R/t drift should be ~1e-3, far
    below the 1-degree recall threshold (lib/metric.py:197,225).
    """
    src, tgt, _, _ = pair
    import dataclasses
    m32 = GMMReg(cfg=TINY)
    v = m32.init({'params': jax.random.PRNGKey(0)}, src, tgt, train=False)
    rot32, tr32, so32, to32, clu32 = m32.apply(v, src, tgt, train=False)

    mbf = GMMReg(cfg=dataclasses.replace(TINY, dtype='bfloat16'))
    vbf = mbf.init({'params': jax.random.PRNGKey(0)}, src, tgt, train=False)
    # param shapes/dtypes identical: bf16 is compute-only, params stay fp32
    chex_ok = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: a.shape == b.shape and a.dtype == b.dtype,
        v['params'], vbf['params']))
    assert chex_ok
    rotbf, trbf, sobf, tobf, clubf = mbf.apply(v, src, tgt, train=False)
    assert rotbf.dtype == jnp.float32 and trbf.dtype == jnp.float32
    assert sobf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(rotbf), np.asarray(rot32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(trbf), np.asarray(tr32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(clubf), np.asarray(clu32), atol=5e-2)

    # gradients flow and stay finite through the bf16 body
    def loss_fn(params):
        r, t, so, to, clu = mbf.apply({'params': params,
                                       'batch_stats': v['batch_stats']},
                                      src, tgt, train=False)
        return (r ** 2).sum() + (t ** 2).sum() + clu + so.sum() + to.sum()

    g = jax.grad(loss_fn)(v['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert all(x.dtype == jnp.float32 for x in leaves)


def test_gmmreg_eval_stacked_matches_per_cloud(pair):
    """Siamese stacking at eval is a pure layout change: per-sample math is
    identical, so outputs must match the per-cloud path (same zero-start FPS
    anchors when no rng is supplied)."""
    import dataclasses
    src, tgt, _, _ = pair
    m_stack = GMMReg(cfg=TINY)
    v = m_stack.init({'params': jax.random.PRNGKey(0)}, src, tgt, train=False)
    out_s = m_stack.apply(v, src, tgt, train=False)

    m_flat = GMMReg(cfg=dataclasses.replace(TINY, stack_eval=False))
    out_f = m_flat.apply(v, src, tgt, train=False)
    names = ["rot", "trans", "src_o", "tgt_o", "clu"]
    for name, a, b in zip(names, out_s, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_pointmlp_fused_eval_matches_naive():
    """Opt-in fused Dense+IN+relu+Dense kernel (ops/pallas_mlp.py) vs the
    jnp composition — exact in interpreter mode; the param tree keeps the
    Dense_{i} names (checkpoint/torch-importer compatible)."""
    import functools

    import jax
    import jax.numpy as jnp

    import ogmm_tpu.ops.pallas_mlp as pm
    from ogmm_tpu.nn.layers import PointMLP
    from ogmm_tpu.ops.dispatch import pallas_override

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 90, 64).astype(np.float32))
    naive = PointMLP((128, 64))
    v = naive.init(jax.random.PRNGKey(0), x)
    assert set(v['params']) == {'Dense_0', 'Dense_1'}
    ref = naive.apply(v, x, train=False)
    orig = pm.pointmlp_eval_pallas
    try:
        pm.pointmlp_eval_pallas = functools.partial(orig, interpret=True)
        with pallas_override(True):
            out = PointMLP((128, 64), fuse_eval=True).apply(v, x, train=False)
    finally:
        pm.pointmlp_eval_pallas = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pointmlp_fused_eval_matches_naive_bf16():
    """bf16 parity of the fused PointMLP kernel: the kernel must round the
    Dense output to the compute dtype BEFORE the InstanceNorm statistics,
    exactly like the naive nn.Dense(dtype=bf16) -> instance_norm chain
    (ADVICE r2: stats on the unrounded f32 accumulator diverge)."""
    import functools

    import jax
    import jax.numpy as jnp

    import ogmm_tpu.ops.pallas_mlp as pm
    from ogmm_tpu.nn.layers import PointMLP
    from ogmm_tpu.ops.dispatch import pallas_override

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 90, 64).astype(np.float32))
    naive = PointMLP((128, 64), dtype='bfloat16')
    v = naive.init(jax.random.PRNGKey(0), x)
    ref = naive.apply(v, x, train=False)
    orig = pm.pointmlp_eval_pallas
    try:
        pm.pointmlp_eval_pallas = functools.partial(orig, interpret=True)
        with pallas_override(True):
            out = PointMLP((128, 64), dtype='bfloat16',
                           fuse_eval=True).apply(v, x, train=False)
    finally:
        pm.pointmlp_eval_pallas = orig
    assert out.dtype == jnp.bfloat16
    # both sides round to bf16 at the same points; residual diff is the
    # matmul accumulation order only
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
