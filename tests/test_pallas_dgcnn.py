"""Fused eval DGCNN kernel vs the naive jnp composition (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from ogmm_tpu.nn.dgcnn import DGCNN


def _model_pair(rng, dtype=None, B=2, N=96, k=8):
    x = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.4)
    naive = DGCNN(emb_dims=64, k=k, dtype=dtype, fused=False)
    v = naive.init(jax.random.PRNGKey(0), x, train=False)
    return x, naive, v


def _fused_apply(model, variables, x):
    """Run the fused path with the pallas kernel in interpreter mode."""
    import functools
    import ogmm_tpu.ops.pallas_dgcnn as pd
    orig = pd.dgcnn_eval_pallas
    fused = DGCNN(emb_dims=model.emb_dims, k=model.k, dtype=model.dtype,
                  fused=True)
    try:
        pd.dgcnn_eval_pallas = functools.partial(orig, interpret=True)
        return fused.apply(variables, x, train=False)
    finally:
        pd.dgcnn_eval_pallas = orig


def test_fused_matches_naive_fp32(rng):
    x, model, v = _model_pair(rng)
    ref = model.apply(v, x, train=False)
    out = _fused_apply(model, v, x)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_matches_naive_bf16(rng):
    x, model, v = _model_pair(rng, dtype="bfloat16")
    ref = model.apply(v, x, train=False)
    out = _fused_apply(model, v, x)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.05)


def test_fused_after_training_stats(rng):
    # run a few training steps so running stats move away from init,
    # then check the folded-affine eval path still matches naive eval
    x, model, v = _model_pair(rng)
    variables = v
    for i in range(3):
        xi = jnp.asarray(rng.randn(2, 96, 3).astype(np.float32))
        _, mut = model.apply(variables, xi, train=True,
                             mutable=['batch_stats'])
        variables = {'params': variables['params'],
                     'batch_stats': mut['batch_stats']}
    ref = model.apply(variables, x, train=False)
    out = _fused_apply(model, variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_padded_tail_tile(rng):
    """N not divisible by tile_n: the tail tile is padded; padded query rows
    compute garbage that must be dropped, not leak into real outputs."""
    import functools
    import ogmm_tpu.ops.pallas_dgcnn as pd
    x, model, v = _model_pair(rng, B=2, N=90, k=8)
    ref = model.apply(v, x, train=False)
    orig = pd.dgcnn_eval_pallas
    fused = DGCNN(emb_dims=model.emb_dims, k=model.k, dtype=model.dtype,
                  fused=True)
    try:
        pd.dgcnn_eval_pallas = functools.partial(orig, interpret=True,
                                                 tile_n=32)   # 32+32+26pad
        out = fused.apply(v, x, train=False)
    finally:
        pd.dgcnn_eval_pallas = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_naive_train_grads_flow(rng):
    x, model, v = _model_pair(rng)

    def loss(params):
        out, _ = model.apply({'params': params,
                              'batch_stats': v['batch_stats']},
                             x, train=True, mutable=['batch_stats'])
        return (out ** 2).sum()

    g = jax.grad(loss)(v['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_fused_posenc_alpha_matches_angle_kernel(rng):
    """The alpha emitted by the fused DGCNN kernel must match the
    standalone posenc_angles_pallas (same selection, same angle math)."""
    import functools
    import ogmm_tpu.ops.pallas_dgcnn as pd
    from ogmm_tpu.ops.pallas_knn import posenc_angles_pallas

    # both dtypes near-exact: the angle prefix always gathers coordinates
    # f32 HIGHEST (the r4 bf16-coordinate gather failed the on-chip gate at
    # max err 1.0 — p2lc cancellation; fixed in r5)
    for dtype, atol in ((None, 1e-5), ("bfloat16", 1e-5)):
        x, model, v = _model_pair(rng, dtype=dtype)
        fused = DGCNN(emb_dims=model.emb_dims, k=model.k, dtype=dtype,
                      fused=True)
        orig = pd.dgcnn_eval_pallas
        try:
            pd.dgcnn_eval_pallas = functools.partial(orig, interpret=True)
            out, alpha = fused.apply(v, x, train=False, with_posenc_alpha=5)
        finally:
            pd.dgcnn_eval_pallas = orig
        ref = posenc_angles_pallas(x, 5, interpret=True)
        assert alpha.shape == ref.shape and alpha.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref),
                                   rtol=1e-3, atol=atol,
                                   err_msg=f"dtype={dtype}")


def test_with_posenc_alpha_none_on_naive_path(rng):
    x, model, v = _model_pair(rng)
    out, alpha = model.apply(v, x, train=False, with_posenc_alpha=5)
    assert alpha is None
    ref = model.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
