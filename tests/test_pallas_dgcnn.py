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


# ---------------------------------------------------------------------------
# Large-N edges-fused kernel (dgcnn_edges_pallas): pre-gathered graph path
# ---------------------------------------------------------------------------

def _edges_apply(model, variables, x, idx=None, nbr=None, tile_n=64,
                 with_posenc_alpha=0, posenc_centroid=None):
    """Run the fused_edges path with the kernel in interpreter mode."""
    import functools
    import ogmm_tpu.ops.pallas_dgcnn as pd
    orig = pd.dgcnn_edges_pallas
    fused = DGCNN(emb_dims=model.emb_dims, k=model.k, dtype=model.dtype,
                  fused=False, fused_edges=True)
    try:
        pd.dgcnn_edges_pallas = functools.partial(orig, interpret=True,
                                                  tile_n=tile_n)
        return fused.apply(variables, x, train=False, nbr_idx=idx,
                           nbr_xyz=nbr, with_posenc_alpha=with_posenc_alpha,
                           posenc_centroid=posenc_centroid)
    finally:
        pd.dgcnn_edges_pallas = orig


def _trained_stats(rng, model, v, steps=3):
    variables = v
    for _ in range(steps):
        xi = jnp.asarray(rng.randn(2, 96, 3).astype(np.float32))
        _, mut = model.apply(variables, xi, train=True,
                             mutable=['batch_stats'])
        variables = {'params': variables['params'],
                     'batch_stats': mut['batch_stats']}
    return variables


def test_edges_fused_matches_naive_fp32(rng):
    """Same precomputed graph, f32: identical op sequence, different
    fusion/BN-fold order only. Includes a tail tile (N=97 % 64 != 0)."""
    from ogmm_tpu.ops.common import knn
    x = jnp.asarray(rng.randn(2, 97, 3).astype(np.float32) * 0.4)
    model = DGCNN(emb_dims=64, k=8, fused=False, fused_edges=False)
    v = _trained_stats(rng, model, model.init(jax.random.PRNGKey(0), x,
                                              train=False))
    idx = knn(x, x, 8, use_pallas=False)
    ref = model.apply(v, x, train=False, nbr_idx=idx)
    out = _edges_apply(model, v, x, idx=idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_edges_fused_bf16_as_close_to_f32_truth_as_naive(rng):
    """bf16 mode: the kernel folds BN scale into the weights while the
    naive path applies it post-matmul, so per-element max deltas between
    the two bf16 paths are unbounded at ReLU boundaries. The honest bar:
    the kernel's bf16 output must sit as close to the f32 truth as the
    naive bf16 output does (both are valid bf16 roundings of one f32
    function)."""
    from ogmm_tpu.ops.common import knn
    x = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.4)
    f32 = DGCNN(emb_dims=64, k=8, fused=False, fused_edges=False)
    v = _trained_stats(rng, f32, f32.init(jax.random.PRNGKey(0), x,
                                          train=False))
    idx = knn(x, x, 8, use_pallas=False)
    truth = np.asarray(f32.apply(v, x, train=False, nbr_idx=idx), np.float32)

    bf = DGCNN(emb_dims=64, k=8, dtype="bfloat16", fused=False,
               fused_edges=False)
    naive16 = np.asarray(bf.apply(v, x, train=False, nbr_idx=idx),
                         np.float32)
    kern16 = np.asarray(_edges_apply(bf, v, x, idx=idx), np.float32)

    def dev(a):
        d = np.abs(a - truth) / (np.abs(truth) + 0.05)
        return d.mean(), np.percentile(d, 99)

    nm, np99 = dev(naive16)
    km, kp99 = dev(kern16)
    assert km <= max(2.0 * nm, 0.01), (km, nm)
    assert kp99 <= max(2.0 * np99, 0.05), (kp99, np99)


def test_edges_fused_nbr_xyz_and_alpha(rng):
    """nbr_xyz (pre-gathered coords, the v-space path) equals the nbr_idx
    route, and the returned alpha matches PositionEncoding's angle math."""
    from ogmm_tpu.ops.common import gather_neighbors, knn, posenc_alpha
    x = jnp.asarray(rng.randn(2, 96, 3).astype(np.float32) * 0.4)
    model = DGCNN(emb_dims=64, k=8, fused=False, fused_edges=False)
    v = _trained_stats(rng, model, model.init(jax.random.PRNGKey(0), x,
                                              train=False))
    idx = knn(x, x, 8, use_pallas=False)
    nbr = gather_neighbors(x, idx)
    out_idx = _edges_apply(model, v, x, idx=idx)
    out_xyz, alpha = _edges_apply(model, v, x, nbr=nbr, with_posenc_alpha=5)
    np.testing.assert_array_equal(np.asarray(out_idx), np.asarray(out_xyz))
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(posenc_alpha(x, nbr[:, :, :5])),
        rtol=1e-6, atol=1e-6)


def test_posenc_centroid_plumbing(rng):
    """posenc_centroid overrides the alpha centroid on BOTH nbr_xyz paths
    (naive and edges-fused). The v-space caller (nn/gmmreg.py) passes the
    ORIGINAL-order centroid so a permuted-row x cannot change the f32
    reduction order — the r5c chip gate measured 0.097 deg of rotation
    drift from the sorted-order sum alone."""
    from ogmm_tpu.ops.common import gather_neighbors, knn, posenc_alpha
    x = jnp.asarray(rng.randn(1, 80, 3).astype(np.float32) * 0.4)
    cen = jnp.asarray(rng.randn(1, 1, 3).astype(np.float32) * 0.1)
    model = DGCNN(emb_dims=64, k=8, fused=False, fused_edges=False)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    idx = knn(x, x, 8, use_pallas=False)
    nbr = gather_neighbors(x, idx)
    want = np.asarray(posenc_alpha(x, nbr[:, :, :5], cen))
    assert not np.allclose(want, np.asarray(posenc_alpha(x, nbr[:, :, :5])))
    _, a_naive = model.apply(v, x, train=False, nbr_xyz=nbr,
                             with_posenc_alpha=5, posenc_centroid=cen)
    _, a_kern = _edges_apply(model, v, x, nbr=nbr, with_posenc_alpha=5,
                             posenc_centroid=cen)
    np.testing.assert_allclose(np.asarray(a_naive), want, rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_kern), want, rtol=1e-6,
                               atol=1e-6)


def test_naive_nbr_xyz_matches_nbr_idx(rng):
    """The naive composition fed pre-gathered coordinates is bit-identical
    to the idx route (same gather, same cast point), and emits the same
    alpha the shared-graph path consumes."""
    from ogmm_tpu.ops.common import gather_neighbors, knn, posenc_alpha
    for dtype in (None, "bfloat16"):
        x, model, v = _model_pair(rng, dtype=dtype)
        idx = knn(x, x, model.k, use_pallas=False)
        nbr = gather_neighbors(x, idx)
        ref = model.apply(v, x, train=False, nbr_idx=idx)
        out, alpha = model.apply(v, x, train=False, nbr_xyz=nbr,
                                 with_posenc_alpha=5)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(ref, np.float32))
        np.testing.assert_allclose(
            np.asarray(alpha), np.asarray(posenc_alpha(x, nbr[:, :, :5])),
            rtol=1e-6, atol=1e-6)
        # train mode too (the indoor train step takes this path)
        out_t, _ = model.apply(v, x, train=True, nbr_xyz=nbr,
                               with_posenc_alpha=5,
                               mutable=['batch_stats'])[0], None
        assert np.isfinite(np.asarray(out_t[0], np.float32)).all()


def test_edges_fused_forced_flag_contract():
    x = jnp.zeros((1, 32, 3), jnp.float32)
    model = DGCNN(emb_dims=64, k=4, fused=False, fused_edges=False)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    forced = DGCNN(emb_dims=64, k=4, fused=False, fused_edges=True)
    # no graph supplied -> must raise, not silently take the naive path
    import pytest
    with pytest.raises(ValueError):
        forced.apply(v, x, train=False)
    with pytest.raises(ValueError):
        forced.apply(v, x, train=True,
                     nbr_idx=jnp.zeros((1, 32, 4), jnp.int32),
                     mutable=['batch_stats'])
