"""Differentiable fused DGCNN train path vs autodiff of the naive module.

VERDICT r1 next #3's acceptance: fused-train gradients match the naive path.
The jnp custom-VJP implementation (ops/dgcnn_train.py) is compared against
jax.grad through the naive nn/dgcnn.py composition — outputs, batch moments
(running-stat inputs), and gradients w.r.t. every weight, BN scale/bias, and
the input points.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ogmm_tpu.nn.dgcnn import DGCNN
from ogmm_tpu.ops.dgcnn_train import dgcnn_train_fused

B, N, K = 2, 96, 8


def _setup(rng, dtype=None):
    x = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.4)
    model = DGCNN(emb_dims=64, k=K, dtype=dtype, fused=False)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    # move BN params off their 1/0 init so scale/bias grads are non-trivial
    params = jax.tree_util.tree_map(lambda p: p, v['params'])
    for i in range(1, 6):
        params[f'bn{i}_scale'] = params[f'bn{i}_scale'] * jnp.asarray(
            1.0 + 0.1 * rng.randn(*params[f'bn{i}_scale'].shape),
            jnp.float32)
        params[f'bn{i}_bias'] = jnp.asarray(
            0.05 * rng.randn(*params[f'bn{i}_bias'].shape), jnp.float32)
    return x, model, {'params': params, 'batch_stats': v['batch_stats']}


def _unpack(params):
    ws = [params[f'w{i}'] for i in range(1, 6)]
    gs = [params[f'bn{i}_scale'] for i in range(1, 6)]
    bs = [params[f'bn{i}_bias'] for i in range(1, 6)]
    return ws, gs, bs


def _naive_loss(model, variables, x, wvec):
    def f(params, x):
        out, mut = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            x, train=True, mutable=['batch_stats'])
        return (out.astype(jnp.float32) * wvec).sum(), mut['batch_stats']
    return f


def _fused_loss(dtype):
    def f(params, x, wvec):
        ws, gs, bs = _unpack(params)
        out, moments, _ = dgcnn_train_fused(x, ws, gs, bs, k=K,
                                           dtype=dtype)
        return (out.astype(jnp.float32) * wvec).sum(), moments
    return f


def _compare(dtype, rtol_out, rtol_grad, atol_grad, mismatch_frac=0.0):
    rng = np.random.RandomState(3)
    x, model, variables = _setup(rng, dtype=dtype)
    wvec = jnp.asarray(rng.randn(B, N, 64).astype(np.float32))

    naive = _naive_loss(model, variables, x, wvec)
    (loss_n, stats_n), g_n = jax.value_and_grad(
        naive, argnums=(0, 1), has_aux=True)(variables['params'], x)
    gp_n, gx_n = g_n

    fused = _fused_loss(dtype or 'float32')
    (loss_f, moments), g_f = jax.value_and_grad(
        fused, argnums=(0, 1), has_aux=True)(variables['params'], x, wvec)
    gp_f, gx_f = g_f

    np.testing.assert_allclose(loss_f, loss_n, rtol=rtol_out)

    # batch moments must equal what the naive path fed its running stats:
    # new_ra = 0.9*old + 0.1*batch with old mean 0 / var 1
    for i, (mean, var) in enumerate(moments):
        np.testing.assert_allclose(np.asarray(mean) * 0.1,
                                   np.asarray(stats_n[f'bn{i+1}_mean']),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(0.9 + np.asarray(var) * 0.1,
                                   np.asarray(stats_n[f'bn{i+1}_var']),
                                   rtol=1e-5, atol=1e-6)

    def check(a, b, name):
        scale = np.abs(b).max() + 1e-12
        ok = np.isclose(a, b, rtol=rtol_grad, atol=atol_grad * scale)
        # mismatch_frac > 0 allows isolated deviations: the fused max-VJP
        # sends tie cotangents to the FIRST maximal element where jax splits
        # them evenly (ops/dgcnn_train._max_vjp) — bf16 ties are common
        # enough to surface as single-element differences
        assert 1.0 - ok.mean() <= mismatch_frac, (
            f"grad mismatch for {name}: {(~ok).sum()}/{ok.size} elements")

    for name in gp_n:
        check(np.asarray(gp_f[name]), np.asarray(gp_n[name]), name)
    check(np.asarray(gx_f), np.asarray(gx_n), "x")


def test_module_fused_train_matches_naive():
    """DGCNN(fused_train=True) shares the param/stat tree with the naive
    path: same outputs, same running-stat updates, grads flow."""
    rng = np.random.RandomState(7)
    x, model, variables = _setup(rng, dtype=None)
    fused = DGCNN(emb_dims=64, k=K, dtype=None, fused=False, fused_train=True)

    out_n, mut_n = model.apply(variables, x, train=True,
                               mutable=['batch_stats'])
    out_f, mut_f = fused.apply(variables, x, train=True,
                               mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                               rtol=1e-4, atol=1e-5)
    for kk in mut_n['batch_stats']:
        np.testing.assert_allclose(
            np.asarray(mut_f['batch_stats'][kk]),
            np.asarray(mut_n['batch_stats'][kk]), rtol=1e-5, atol=1e-6,
            err_msg=f"batch_stats mismatch for {kk}")

    def loss(params):
        out, _ = fused.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            x, train=True, mutable=['batch_stats'])
        return (out ** 2).sum()

    g = jax.grad(loss)(variables['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert all(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_fused_train_grads_fp32():
    _compare(None, rtol_out=1e-5, rtol_grad=1e-3, atol_grad=1e-4)


def test_fused_train_grads_bf16():
    # bf16 forward noise bounds the agreement; tolerances mirror the fused
    # eval kernel's bf16 parity test
    _compare('bfloat16', rtol_out=0.05, rtol_grad=0.1, atol_grad=0.05,
             mismatch_frac=0.03)


def _patch_interpret(monkeypatch, tile_n):
    import functools
    import ogmm_tpu.ops.pallas_dgcnn_train as pt
    for name in ("graph_stage1_pallas", "bwd_reduce_pallas",
                 "bwd_stage_pallas", "bwd_edge_pallas"):
        monkeypatch.setattr(pt, name, functools.partial(
            getattr(pt, name), interpret=True, tile_n=tile_n))


def _pallas_vs_jnp(monkeypatch, dtype, rtol, atol):
    """Full fused-train fwd+bwd: Pallas kernels (interpreter, tiled so the
    last tile is PADDED) vs the jnp reference."""
    from ogmm_tpu.ops.dispatch import pallas_override
    _patch_interpret(monkeypatch, tile_n=32)
    rng = np.random.RandomState(11)
    N = 90                                # 32+32+26: exercises row masking
    x = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.4)
    model = DGCNN(emb_dims=64, k=K, dtype=dtype, fused=False)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    wvec = jnp.asarray(rng.randn(B, N, 64).astype(np.float32))

    fused = _fused_loss(dtype or 'float32')
    with pallas_override(False):
        (l_j, m_j), g_j = jax.value_and_grad(
            fused, argnums=(0, 1), has_aux=True)(v['params'], x, wvec)
    with pallas_override(True):
        (l_p, m_p), g_p = jax.value_and_grad(
            fused, argnums=(0, 1), has_aux=True)(v['params'], x, wvec)

    np.testing.assert_allclose(l_p, l_j, rtol=rtol)
    for (mp, vp), (mj, vj) in zip(m_p, m_j):
        np.testing.assert_allclose(np.asarray(mp), np.asarray(mj),
                                   rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vj),
                                   rtol=rtol, atol=atol)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_p)
    flat_j, _ = jax.tree_util.tree_flatten_with_path(g_j)
    for (path, a), (_, b) in zip(flat_p, flat_j):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol * scale,
                                   err_msg=f"pallas-vs-jnp grad at {path}")


def test_pallas_backward_matches_jnp_fp32(monkeypatch):
    _pallas_vs_jnp(monkeypatch, None, rtol=2e-4, atol=2e-4)


def test_pallas_backward_matches_jnp_bf16(monkeypatch):
    _pallas_vs_jnp(monkeypatch, 'bfloat16', rtol=0.05, atol=0.02)


def test_fused_train_posenc_alpha_matches_jnp_formula():
    """posenc_k>0: the alpha returned by dgcnn_train_fused (jnp fallback on
    CPU; the Pallas stage-1 kernel's on TPU — interpreter-pinned below)
    must match PositionEncoding's gather formula on a fresh k=5 graph."""
    import jax
    from ogmm_tpu.ops.common import gather_neighbors, knn, l2_normalize

    rng = np.random.RandomState(5)
    x, model, variables = _setup(rng, dtype=None)
    ws, gs, bs = _unpack(variables['params'])
    out, moments, alpha = dgcnn_train_fused(x, ws, gs, bs, k=K,
                                            dtype='float32', posenc_k=5)
    idx = knn(x, x, 5)
    x32 = x.astype(jnp.float32)
    p2gc = x32 - x32.mean(axis=1, keepdims=True)
    p2lc = gather_neighbors(x32, idx) - x32[:, :, None, :]
    ref = jnp.einsum('bnkc,bnc->bnk', l2_normalize(p2lc), l2_normalize(p2gc))
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # grads still flow identically with the extra (grad-free) output
    def loss(params, x):
        ws, gs, bs = _unpack(params)
        out, _, a = dgcnn_train_fused(x, ws, gs, bs, k=K, dtype='float32',
                                      posenc_k=5)
        return out.astype(jnp.float32).sum() + 0.0 * a.sum()
    g = jax.grad(loss)(variables['params'], x)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())


def test_stage1_kernel_posenc_alpha_interpret():
    """The Pallas stage-1 kernel's alpha (f32 gather) is near-exact vs the
    standalone angle kernel."""
    from ogmm_tpu.ops.pallas_dgcnn_train import graph_stage1_pallas
    from ogmm_tpu.ops.pallas_knn import posenc_angles_pallas

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 96, 3).astype(np.float32) * 0.4)
    w1 = jnp.asarray(rng.randn(6, 64).astype(np.float32) * 0.1)
    z, e, idx, alpha = graph_stage1_pallas(x, w1, k=K, dtype=jnp.float32,
                                           interpret=True, posenc_k=5)
    ref = posenc_angles_pallas(x, 5, interpret=True)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
