"""End-to-end equivalence of the large-N (indoor) code path.

The indoor preset runs the SAME GMMReg network at N ~ 35,000 (reference
configs/cfgs.py:77, datasets/realdata.py:114-119) where every (N, M) matrix
must be streamed or chunked. These tests force the streaming/chunked routing
at CPU-affordable shapes and require the full forward (and the eval metric
suite) to match the dense path — so the indoor regime differs from the
ModelNet regime only in dispatch, never in math.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ogmm_tpu.ops.common as common
from ogmm_tpu.configs import indoor
from ogmm_tpu.nn import GMMReg


@pytest.fixture
def indoor_model_cfg():
    # indoor architecture (K=16 clusters, configs/cfgs.py:84-85) shrunk in
    # width only — the point count is what's under test
    cfg = indoor().model
    return dataclasses.replace(cfg, emb_dims=32, n_clusters=8, km_clusters=8,
                               num_heads=2, gnn_k=6, pos_k=4, em_iters=2,
                               sinkhorn_iters=3, icp_iters=2)


def test_indoor_forward_chunked_equals_dense(indoor_model_cfg, rng,
                                             monkeypatch):
    B, N = 1, 600
    src = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)

    dense_cfg = dataclasses.replace(indoor_model_cfg, overlap_stream=False)
    model = GMMReg(cfg=dense_cfg)
    variables = model.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                           train=False)
    ref = model.apply(variables, src, tgt, train=False, is_test=True)

    # force every (N, M) consumer through the chunked/streamed routing the
    # real 35k shape takes (kNN, 1-NN for ICP/chamfer, overlap wproject)
    monkeypatch.setattr(common, "_DENSE_ELEMS", 10_000)
    stream_cfg = dataclasses.replace(indoor_model_cfg, overlap_stream=True)
    out = GMMReg(cfg=stream_cfg).apply(variables, src, tgt, train=False,
                                       is_test=True)

    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_indoor_eval_metrics_chunked(indoor_model_cfg, rng, monkeypatch):
    """dcp_metrics (chamfer / pcab via 1-NN) under chunked routing."""
    from ogmm_tpu.core.metrics import dcp_metrics

    B, N = 2, 300
    src = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    rot = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    trans = jnp.zeros((B, 3))
    ref = dcp_metrics(src, tgt, rot, trans, rot, trans)
    monkeypatch.setattr(common, "_DENSE_ELEMS", 5_000)
    out = dcp_metrics(src, tgt, rot, trans, rot, trans)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_indoor_welsch_chunked(rng, monkeypatch):
    from ogmm_tpu.losses import welsch_loss

    B, N = 1, 400
    src = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    tsfm = jnp.broadcast_to(jnp.concatenate(
        [jnp.eye(3), jnp.zeros((3, 1))], axis=1), (B, 3, 4))
    so = jnp.asarray(rng.rand(B, N).astype(np.float32))
    to = jnp.asarray(rng.rand(B, N).astype(np.float32))
    ref = welsch_loss(src, tgt, tsfm, so, to, alpha=10.0, top_k=64)
    monkeypatch.setattr(common, "_DENSE_ELEMS", 2_000)
    out = welsch_loss(src, tgt, tsfm, so, to, alpha=10.0, top_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_indoor_vspace_matches_original_order_routing(indoor_model_cfg, rng):
    """The round-5 v-space graph routing (sorted-space graph + one
    coordinate gather + one feature un-sort, ops/common.py:knn_self_vspace)
    vs the round-4 original-order routing (dgcnn_vspace=False): identical
    math, so the full forward must agree to fp-reduction tolerance."""
    B, N = 1, 1200                       # > 1024 -> shared graph engages
    src = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)

    model = GMMReg(cfg=indoor_model_cfg)
    v = model.init({'params': jax.random.PRNGKey(0)}, src, tgt, train=False)
    out = model.apply(v, src, tgt, train=False, is_test=False)

    ctrl_cfg = dataclasses.replace(indoor_model_cfg, dgcnn_vspace=False)
    ref = GMMReg(cfg=ctrl_cfg).apply(v, src, tgt, train=False, is_test=False)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    # train mode rides the same routing (the indoor train step): loss grads
    # must flow and stay finite through the gather/un-sort pair
    def loss(params):
        o, _ = model.apply({'params': params,
                            'batch_stats': v['batch_stats']},
                           src, tgt, train=True, mutable=['batch_stats'])
        rot, trans, so, to_, clu = o
        return (rot.sum() + trans.sum() + so.sum() + to_.sum()
                + clu).astype(jnp.float32)

    g = jax.grad(loss)(v['params'])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_indoor_fused_edges_full_forward(indoor_model_cfg, rng, monkeypatch):
    """cfg.dgcnn_fused_edges=True (opt-in — chip parity gated by
    verify_r5c but no measured indoor timing win) through the whole GMMReg
    forward, kernel in interpreter mode: rotations must match the naive
    stage chain to geometry tolerance."""
    import functools
    import ogmm_tpu.ops.pallas_dgcnn as pd

    B, N = 1, 1100
    src = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    model = GMMReg(cfg=indoor_model_cfg)
    v = model.init({'params': jax.random.PRNGKey(0)}, src, tgt, train=False)
    ref = model.apply(v, src, tgt, train=False, is_test=False)

    monkeypatch.setattr(pd, "dgcnn_edges_pallas",
                        functools.partial(pd.dgcnn_edges_pallas,
                                          interpret=True))
    fe_cfg = dataclasses.replace(indoor_model_cfg, dgcnn_fused_edges=True)
    out = GMMReg(cfg=fe_cfg).apply(v, src, tgt, train=False, is_test=False)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
