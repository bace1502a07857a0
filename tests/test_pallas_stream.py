"""M-streamed kernels (ops/pallas_stream.py) vs dense references.

The streamed kernels exist for the indoor regime (reference
configs/cfgs.py:77: n_points=50000 -> ~35k into the network) where the
(N, M) distance/similarity matrices cannot be materialised. Tests run the
kernels in interpreter mode at small shapes whose tile counts force every
code path: multiple m-tiles (the carry merge), ragged tails on BOTH axes,
and exact-tie index ordering.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ogmm_tpu.ops.common import knn, nn1, square_distance
from ogmm_tpu.ops.pallas_stream import (knn_chunked, knn_stream, nn1_chunked,
                                        nn1_stream, wproject_chunked,
                                        wproject_stream)


def _clouds(rng, B=2, N=150, M=117):
    src = rng.randn(B, N, 3).astype(np.float32)
    tgt = rng.randn(B, M, 3).astype(np.float32)
    # duplicate a handful of target points ACROSS m-tile boundaries so exact
    # distance ties exercise the lowest-index merge ordering
    tgt[:, M - 17] = tgt[:, 3]
    tgt[:, M - 40] = tgt[:, M // 2]
    src[:, 5] = tgt[:, 3]          # exact-zero distance hit
    return jnp.asarray(src), jnp.asarray(tgt)


def test_nn1_stream_matches_dense(rng):
    src, tgt = _clouds(rng)
    dm = square_distance(src, tgt)
    d, i = nn1_stream(src, tgt, tile_n=64, tile_m=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(jnp.argmin(dm, -1)))
    np.testing.assert_allclose(np.asarray(d), np.asarray(jnp.min(dm, -1)),
                               rtol=1e-5, atol=1e-6)


def test_nn1_stream_single_tile_degenerates(rng):
    # tile_m >= M: one m-tile — must equal the whole-M kernel semantics
    src, tgt = _clouds(rng, M=60)
    dm = square_distance(src, tgt)
    d, i = nn1_stream(src, tgt, tile_n=64, tile_m=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(jnp.argmin(dm, -1)))


def test_knn_stream_matches_topk(rng):
    src, tgt = _clouds(rng)
    ref = knn(src, tgt, 8, use_pallas=False)
    out = knn_stream(src, tgt, 8, tile_n=64, tile_m=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_knn_stream_self_graph(rng):
    x = jnp.asarray(rng.randn(2, 117, 3).astype(np.float32))
    ref = knn(x, x, 20, use_pallas=False)
    out = knn_stream(x, x, 20, tile_n=64, tile_m=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(out[..., 0]),
                                  np.arange(117)[None].repeat(2, 0))


def test_knn_stream_tie_order_lowest_index():
    # every target point identical: top-k must be 0..k-1 (stable tie order),
    # ties spanning several m-tiles
    src = jnp.zeros((1, 8, 3), jnp.float32)
    tgt = jnp.ones((1, 40, 3), jnp.float32)
    out = knn_stream(src, tgt, 6, tile_n=8, tile_m=16, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.broadcast_to(np.arange(6), (1, 8, 6)))


def test_wproject_stream_matches_softmax_einsum(rng):
    B, N, M, D = 2, 70, 53, 32
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, 1).astype(np.float32))
    sim = jnp.einsum('bnd,bmd->bnm', q, k)
    ref = jnp.einsum('bnm,bmd->bnd', jax.nn.softmax(sim, axis=-1), v)
    out = wproject_stream(q, k, v, tile_n=32, tile_m=16, interpret=True)
    # online softmax reassociates the sum: agreement to ~1e-5 rel, not bitwise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_wproject_stream_large_logits_stable(rng):
    # online-softmax max tracking: huge logits must not overflow
    B, N, M, D = 1, 16, 48, 8
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32)) * 30.0
    k = jnp.asarray(rng.randn(B, M, D).astype(np.float32)) * 30.0
    v = jnp.asarray(rng.randn(B, M, 1).astype(np.float32))
    sim = jnp.einsum('bnd,bmd->bnm', q, k)
    ref = jnp.einsum('bnm,bmd->bnd', jax.nn.softmax(sim, axis=-1), v)
    out = wproject_stream(q, k, v, tile_n=16, tile_m=16, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- chunked --

def test_nn1_chunked_matches_dense(rng):
    src, tgt = _clouds(rng)
    dm = square_distance(src, tgt)
    d, i = nn1_chunked(src, tgt, chunk=64)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(jnp.argmin(dm, -1)))
    np.testing.assert_allclose(np.asarray(d), np.asarray(jnp.min(dm, -1)),
                               rtol=1e-5, atol=1e-6)


def test_knn_chunked_matches_topk(rng):
    src, tgt = _clouds(rng)
    ref = knn(src, tgt, 8, use_pallas=False)
    out = knn_chunked(src, tgt, 8, chunk=64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_wproject_chunked_matches_softmax_einsum(rng):
    B, N, M, D = 2, 70, 53, 16
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, 1).astype(np.float32))
    sim = jnp.einsum('bnd,bmd->bnm', q, k)
    ref = jnp.einsum('bnm,bmd->bnd', jax.nn.softmax(sim, axis=-1), v)
    out = wproject_chunked(q, k, v, chunk=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_wproject_chunked_differentiable(rng):
    # the chunked path trains through plain autodiff (the streamed kernel
    # trains through its custom VJP, tested separately)
    B, N, M, D = 1, 20, 30, 8
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, 1).astype(np.float32))

    def loss_chunk(q):
        return wproject_chunked(q, k, v, chunk=8).sum()

    def loss_dense(q):
        sim = jnp.einsum('bnd,bmd->bnm', q, k)
        return jnp.einsum('bnm,bmd->bnd',
                          jax.nn.softmax(sim, axis=-1), v).sum()

    g1 = jax.grad(loss_chunk)(q)
    g2 = jax.grad(loss_dense)(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------- routing --

def test_nn1_router_dense_small(rng):
    src, tgt = _clouds(rng, B=1, N=40, M=30)
    dm = square_distance(src, tgt)
    d, i = nn1(src, tgt)    # CPU small -> dense
    np.testing.assert_array_equal(np.asarray(i), np.asarray(jnp.argmin(dm, -1)))


def test_router_chunks_beyond_dense_limit(rng, monkeypatch):
    import ogmm_tpu.ops.common as common
    monkeypatch.setattr(common, "_DENSE_ELEMS", 1000)
    src, tgt = _clouds(rng, B=1, N=60, M=50)
    dm = square_distance(src, tgt)
    d, i = common.nn1(src, tgt)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(jnp.argmin(dm, -1)))
    idx = common.knn(src, tgt, 7)
    ref = jax.lax.top_k(-dm, 7)[1]
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


def test_gmmreg_streaming_overlap_matches_dense(rng):
    """GMMReg forward with the streamed overlap head (chunked fallback on
    CPU) must match the materialised-similarity path."""
    import dataclasses

    from ogmm_tpu.configs import mnet
    from ogmm_tpu.nn import GMMReg

    cfg = mnet().model
    small = dataclasses.replace(cfg, emb_dims=32, n_clusters=8, km_clusters=8,
                                num_heads=2, gnn_k=6, pos_k=4, em_iters=2,
                                sinkhorn_iters=3, icp_iters=2)
    B, N = 2, 48
    src = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)

    dense_m = GMMReg(cfg=dataclasses.replace(small, overlap_stream=False))
    variables = dense_m.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                             train=False)
    stream_m = GMMReg(cfg=dataclasses.replace(small, overlap_stream=True))

    for train in (False, True):
        kw = ({'mutable': ['batch_stats']} if train else {})
        out_d = dense_m.apply(variables, src, tgt, train=train, **kw)
        out_s = stream_m.apply(variables, src, tgt, train=train, **kw)
        if train:
            out_d, out_s = out_d[0], out_s[0]
        for a, b in zip(out_d, out_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)


def test_gmmreg_streaming_overlap_trains(rng):
    """Gradients flow through the chunked streaming overlap head."""
    import dataclasses

    from ogmm_tpu.configs import mnet
    from ogmm_tpu.nn import GMMReg

    cfg = dataclasses.replace(mnet().model, emb_dims=32, n_clusters=8,
                              km_clusters=8, num_heads=2, gnn_k=6, pos_k=4,
                              em_iters=2, sinkhorn_iters=3,
                              overlap_stream=True)
    B, N = 2, 32
    src = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    model = GMMReg(cfg=cfg)
    variables = model.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                           train=False)

    def loss(params):
        rot, trans, src_o, tgt_o, clu = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            src, tgt, train=True, mutable=['batch_stats'])[0]
        return (rot.sum() + trans.sum() + src_o.sum() + tgt_o.sum()
                + clu.sum())

    g = jax.grad(loss)(variables['params'])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(np.any(np.asarray(x) != 0) for x in flat)


def test_knn_prefix_property(rng):
    """The k=5 graph is exactly the k=20 graph's prefix (both ascending
    distance, stable ties) — the invariant behind GMMReg's shared large-N
    graph (nn/gmmreg.py cloud_graph)."""
    x = jnp.asarray(rng.randn(2, 300, 3).astype(np.float32))
    x = x.at[:, 100].set(x[:, 3])          # exact ties too
    k20 = knn(x, x, 20, use_pallas=False)
    k5 = knn(x, x, 5, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(k20[..., :5]), np.asarray(k5))
    # and the streamed kernel agrees with the same prefix
    ks = knn_stream(x, x, 20, tile_n=64, tile_m=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(ks[..., :5]), np.asarray(k5))


def test_wproject_stream_custom_vjp_grads(rng):
    """The streamed overlap projection trains: its flash-style recompute
    backward must match autodiff through the dense softmax einsum for all
    three inputs (incl. ragged tails, where padded upstream grads must
    contribute exactly nothing)."""
    B, N, M, D = 2, 70, 53, 16
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(B, N, 1).astype(np.float32))  # cotangent mix

    def loss_stream(q, k, v):
        return (wproject_stream(q, k, v, tile_n=32, tile_m=16,
                                interpret=True) * w).sum()

    def loss_dense(q, k, v):
        sim = jnp.einsum('bnd,bmd->bnm', q, k)
        return (jnp.einsum('bnm,bmd->bnd',
                           jax.nn.softmax(sim, axis=-1), v) * w).sum()

    gs = jax.grad(loss_stream, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gs, gd, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_wproject_stream_lse_matches_dense(rng):
    B, N, M, D = 1, 24, 40, 8
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, 1).astype(np.float32))
    from ogmm_tpu.ops.pallas_stream import wproject_stream_lse
    _, lse = wproject_stream_lse(q, k, v, tile_n=16, tile_m=16,
                                 interpret=True)
    sim = jnp.einsum('bnd,bmd->bnm', q, k)
    ref = jax.nn.logsumexp(sim, axis=-1)[..., None]
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_nn1_stream_t_matches_dense(rng):
    """Transposed-layout 1-NN (channels on sublanes) vs the dense reference.
    The kernel minimises r = |t|^2 - 2<q,t> (row-constant |q|^2 added at
    flush) — same exact math, but different fp rounding than the d2
    expression, so near-ties may legitimately pick the other of two
    equidistant points; assert index equality OR distance equality."""
    from ogmm_tpu.ops.pallas_stream import nn1_stream_t
    src, tgt = _clouds(rng)
    dm = np.asarray(square_distance(src, tgt))
    ref_i = dm.argmin(-1)
    ref_d = dm.min(-1)
    d, i = nn1_stream_t(src, tgt, tile_n=64, tile_m=32, interpret=True)
    d, i = np.asarray(d), np.asarray(i)
    same = i == ref_i
    np.testing.assert_allclose(d[~same],
                               dm[np.nonzero(~same)[0], np.nonzero(~same)[1],
                                  i[~same]], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d, ref_d, rtol=1e-4, atol=1e-6)
    assert same.mean() > 0.99
    # exact duplicate ties (constructed in _clouds) must break to the
    # lowest index like the dense argmin
    assert np.all(i[:, 5] == ref_i[:, 5])


def test_knn_stream_diag_order_matches_ascending(rng):
    """Diagonal-first tile visiting + lexicographic merge must produce
    EXACTLY the ascending-order result (incl. exact ties)."""
    src, tgt = _clouds(rng)
    ref = knn_stream(src, tgt, 8, tile_n=64, tile_m=32, interpret=True)
    out = knn_stream(src, tgt, 8, tile_n=64, tile_m=32, interpret=True,
                     diag_order=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # and both equal the dense reference
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(knn(src, tgt, 8, use_pallas=False)))


def test_knn_self_spatial_same_neighbour_sets(rng):
    """Morton-sorted self-kNN returns the same (point, distance) sets as
    the dense reference; tie INDEX choice may differ, so compare gathered
    neighbour distances row-wise (sorted ascending in both)."""
    from ogmm_tpu.ops.pallas_stream import knn_self_spatial

    # spatially coherent surface-like cloud (the indoor shape class)
    u = rng.rand(2, 300, 2).astype(np.float32)
    z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
    x = jnp.asarray(np.concatenate([u, 0.3 * z], axis=-1))

    ref = knn(x, x, 10, use_pallas=False)
    out = knn_self_spatial(x, 10, tile_n=64, tile_m=64, interpret=True)

    pts = np.asarray(x)
    for b in range(2):
        d_ref = np.linalg.norm(pts[b][np.asarray(ref)[b]] - pts[b][:, None],
                               axis=-1)
        d_out = np.linalg.norm(pts[b][np.asarray(out)[b]] - pts[b][:, None],
                               axis=-1)
        np.testing.assert_allclose(d_out, d_ref, rtol=1e-5, atol=1e-6)
    # self is always the nearest neighbour of itself
    np.testing.assert_array_equal(np.asarray(out)[..., 0],
                                  np.arange(300)[None].repeat(2, 0))


def test_knn_stream_diag_order_tie_in_late_tile():
    """Adversarial exact-tie layout for the tile-skip gate: under
    diag_order, query tile 1 visits its diagonal m-tile FIRST and the
    lower-index m-tile 0 second. Every row of the query tile ties (never
    strictly improves) in tile 0, whose duplicate carries the LOWER global
    index — a strict (<) skip gate prunes the tile and returns the higher
    index, diverging from top_k. The <= gate keeps exact-tie results
    independent of the visiting order."""
    N = M = 16
    tile = 8
    p = np.array([5.0, 5.0, 5.0], np.float32)
    src = np.full((1, N, 3), 100.0, np.float32)
    src[0, 8:] = p                         # the whole second query tile
    tgt = np.full((1, M, 3), -100.0, np.float32)
    tgt[0, 2] = p + np.array([1.0, 0.0, 0.0], np.float32)   # low idx, tile 0
    tgt[0, 12] = tgt[0, 2]                                  # high idx, tile 1
    s, t = jnp.asarray(src), jnp.asarray(tgt)
    ref = knn(s, t, 1, use_pallas=False)
    out = knn_stream(s, t, 1, tile_n=tile, tile_m=tile, interpret=True,
                     diag_order=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_knn_self_spatial_cull_is_a_no_op_on_results(rng):
    """The AABB block cull may only skip blocks that provably cannot change
    the carry, so culled and uncull runs of the SAME pipeline must be
    bit-identical — even on an adversarial layout where >50% of tile-pair
    bounds are positive (well-separated clusters, coords at scale ~14 where
    f32 d2 cancellation error is ~1e-4) and an exact duplicate pair lives
    in a far tile (its block bound is 0 and must survive)."""
    from ogmm_tpu.ops.pallas_stream import (_morton3, _tile_pair_bounds,
                                            knn_stream)

    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [10, 10, 10]],
                       np.float32)
    pts = (centers[:, None] +
           0.2 * rng.randn(4, 90, 3).astype(np.float32)).reshape(1, 360, 3)
    pts[0, 359] = pts[0, 0]            # exact duplicate, distant indices
    x = jnp.asarray(pts)
    order = jnp.argsort(_morton3(x), axis=-1).astype(jnp.int32)
    xs = jnp.take_along_axis(x, order[..., None], axis=1)
    lb = _tile_pair_bounds(xs, 32, 64)
    assert float((np.asarray(lb) > 0).mean()) > 0.5   # cull pressure is real
    kw = dict(tile_n=32, tile_m=64, interpret=True, diag_order=True)
    plain = knn_stream(xs, xs, 8, **kw)
    culled = knn_stream(xs, xs, 8, cull_lb=lb, **kw)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(culled))


def test_knn_self_spatial_cull_exact_on_separated_clusters(rng):
    """End-to-end exactness under heavy culling at the data scale the
    models actually use (unit-ish clouds): well-separated clusters so most
    off-diagonal blocks cull, plus an exact duplicate pair in a far tile —
    neighbour distance sets must match the dense XLA reference."""
    from ogmm_tpu.ops.pallas_stream import knn_self_spatial

    centers = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]],
                       np.float32)
    pts = (centers[:, None] +
           0.02 * rng.randn(4, 90, 3).astype(np.float32)).reshape(1, 360, 3)
    pts[0, 359] = pts[0, 0]            # exact duplicate, distant indices
    x = jnp.asarray(pts)

    ref = knn(x, x, 8, use_pallas=False)
    out = knn_self_spatial(x, 8, tile_n=32, tile_m=64, interpret=True)

    d_ref = np.linalg.norm(pts[0][np.asarray(ref)[0]] - pts[0][:, None],
                           axis=-1)
    d_out = np.linalg.norm(pts[0][np.asarray(out)[0]] - pts[0][:, None],
                           axis=-1)
    # tolerance covers f32 d2 cancellation noise (~4e-7 abs at |x|^2~3 ->
    # ~1e-5 in distance here): near-equidistant candidates can legitimately
    # swap picks between the two summation orders; the bit-identity of
    # culled vs uncull runs is asserted in the no-op test above
    np.testing.assert_allclose(d_out, d_ref, rtol=1e-3, atol=5e-5)
    # the duplicate pair must find each other at distance zero
    assert d_out[0, :2].max() == 0.0 and d_out[359, :2].max() == 0.0


def test_tile_pair_bounds_are_true_lower_bounds(rng):
    """Every entry of _tile_pair_bounds must lower-bound the minimum true
    squared distance between its tile pair — on random clouds at several
    tile shapes (soundness is what makes the kernel cull exact)."""
    from ogmm_tpu.ops.pallas_stream import _tile_pair_bounds

    x = jnp.asarray(rng.randn(2, 137, 3).astype(np.float32))
    for tn, tm in ((32, 64), (64, 32), (137, 137), (50, 70)):
        lb = np.asarray(_tile_pair_bounds(x, tn, tm))
        pts = np.asarray(x)
        for b in range(2):
            for i in range(lb.shape[1]):
                qi = pts[b, i * tn:(i + 1) * tn]
                for j in range(lb.shape[2]):
                    tj = pts[b, j * tm:(j + 1) * tm]
                    d2 = (((qi[:, None] - tj[None]) ** 2).sum(-1)).min()
                    assert lb[b, i, j] <= d2 + 1e-12, (tn, tm, b, i, j)


def test_nn1_stream_cull_identity_and_threshold(rng):
    """Culled nn1_stream must equal the uncull run wherever a consumer
    within max_dist_sq could see a difference: indices identical for rows
    whose true 1-NN is inside the gate; rows beyond the gate may report
    anything (their weight is zero at every consumer) but must report a
    distance that still fails the gate."""
    from ogmm_tpu.ops.pallas_stream import (_morton3, _pair_tile_bounds,
                                            nn1_stream)

    centers = np.array([[0, 0, 0], [1.2, 0, 0], [0, 1.2, 0]], np.float32)
    q = (centers[:, None] + 0.05 * rng.randn(3, 50, 3)
         .astype(np.float32)).reshape(1, 150, 3)
    # target covers only the first two clusters: the third cluster's
    # queries have no within-gate neighbour at all
    t = (centers[:2, None] + 0.05 * rng.randn(2, 90, 3)
         .astype(np.float32)).reshape(1, 180, 3)
    qs = jnp.take_along_axis(jnp.asarray(q),
                             jnp.argsort(_morton3(jnp.asarray(q)))[..., None],
                             axis=1)
    ts = jnp.take_along_axis(jnp.asarray(t),
                             jnp.argsort(_morton3(jnp.asarray(t)))[..., None],
                             axis=1)
    lb = _pair_tile_bounds(qs, ts, 32, 32)
    kw = dict(tile_n=32, tile_m=32, interpret=True)
    d0, i0 = nn1_stream(qs, ts, **kw)
    d1, i1 = nn1_stream(qs, ts, cull_lb=lb, **kw)
    # plain cull (no gate): bit-identical
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # threshold cull: identical within the gate, gated-out beyond it
    gate = 0.04                                          # squared distance
    d2_, i2_ = nn1_stream(qs, ts, cull_lb=lb, max_dist_sq=gate, **kw)
    inside = np.asarray(d0)[0] < gate
    assert inside.any() and not inside.all()             # both regimes hit
    np.testing.assert_array_equal(np.asarray(i2_)[0][inside],
                                  np.asarray(i0)[0][inside])
    np.testing.assert_array_equal(np.asarray(d2_)[0][inside],
                                  np.asarray(d0)[0][inside])
    assert (np.asarray(d2_)[0][~inside] >= gate).all()   # still fails gate


# --------------------------------------------------------------------------
# dynamic-trip selection (dyn_select=True): exactness vs the static path
# --------------------------------------------------------------------------

def test_knn_stream_dyn_select_matches_topk(rng):
    src, tgt = _clouds(rng)
    ref = knn(src, tgt, 8, use_pallas=False)
    out = knn_stream(src, tgt, 8, tile_n=64, tile_m=32, interpret=True,
                     dyn_select=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_knn_stream_dyn_select_tie_order_lowest_index():
    # all-identical targets: the dyn mask keeps exact ties (<=), so the
    # lexicographic merge must still yield 0..k-1 across m-tiles
    src = jnp.zeros((1, 8, 3), jnp.float32)
    tgt = jnp.ones((1, 40, 3), jnp.float32)
    out = knn_stream(src, tgt, 6, tile_n=8, tile_m=16, interpret=True,
                     dyn_select=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.broadcast_to(np.arange(6), (1, 8, 6)))


def test_knn_stream_dyn_select_diag_order_and_cull(rng):
    # the full indoor composition: Morton sort + diag-first + AABB cull +
    # dynamic-trip selection must be bit-identical to the plain kernel
    from ogmm_tpu.ops.pallas_stream import (_morton3, _tile_pair_bounds)
    x = rng.randn(2, 150, 3).astype(np.float32)
    x[:, 97] = x[:, 12]                     # exact tie across tiles
    xs = jnp.take_along_axis(jnp.asarray(x),
                             jnp.argsort(_morton3(jnp.asarray(x)))[..., None],
                             axis=1)
    lb = _tile_pair_bounds(xs, 32, 32)
    kw = dict(tile_n=32, tile_m=32, interpret=True)
    ref = knn_stream(xs, xs, 8, **kw)
    out = knn_stream(xs, xs, 8, diag_order=True, cull_lb=lb,
                     dyn_select=True, **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_knn_self_spatial_dyn_select_same_result(rng):
    from ogmm_tpu.ops.pallas_stream import knn_self_spatial
    x = jnp.asarray(rng.randn(2, 150, 3).astype(np.float32))
    a = knn_self_spatial(x, 10, tile_n=64, tile_m=64, interpret=True)
    b = knn_self_spatial(x, 10, tile_n=64, tile_m=64, interpret=True,
                         dyn_select=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_knn_cross_spatial_same_neighbour_sets(rng):
    """The sp self-graph shape: a random SUBSET of a surface-like cloud
    queries the full cloud (local rank ~ global rank / stretch). Exact
    neighbour distance sets vs the dense reference; rows come back in the
    query's original order, ids in the target's original order."""
    from ogmm_tpu.ops.pallas_stream import knn_cross_spatial

    u = rng.rand(2, 320, 2).astype(np.float32)
    z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
    t = np.concatenate([u, 0.3 * z], axis=-1)
    rows = np.sort(rng.choice(320, size=80, replace=False))    # shard-like
    q = jnp.asarray(t[:, rows])
    t = jnp.asarray(t)

    ref = knn(q, t, 10, use_pallas=False)
    out = knn_cross_spatial(q, t, 10, tile_n=32, tile_m=64, interpret=True)

    pts = np.asarray(t)
    qts = np.asarray(q)
    for b in range(2):
        d_ref = np.linalg.norm(pts[b][np.asarray(ref)[b]] - qts[b][:, None],
                               axis=-1)
        d_out = np.linalg.norm(pts[b][np.asarray(out)[b]] - qts[b][:, None],
                               axis=-1)
        np.testing.assert_allclose(d_out, d_ref, rtol=1e-5, atol=1e-6)
    # each query point is a target point: nearest neighbour is itself
    np.testing.assert_array_equal(np.asarray(out)[..., 0],
                                  rows[None].repeat(2, 0))


def test_knn_cross_spatial_cull_exact_on_separated_clusters(rng):
    """Heavy-cull exactness for the cross flavour: separated clusters so
    most tile-pair bounds are positive, plus an exact duplicate pair
    (query point dupes a far-indexed target point)."""
    from ogmm_tpu.ops.pallas_stream import knn_cross_spatial

    centers = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]],
                       np.float32)
    t = (centers[:, None] +
         0.02 * rng.randn(4, 90, 3).astype(np.float32)).reshape(1, 360, 3)
    q = t[:, rng.choice(360, size=90, replace=False)].copy()
    q[0, 7] = t[0, 359]               # exact duplicate in a far tile
    qj, tj = jnp.asarray(q), jnp.asarray(t)

    ref = knn(qj, tj, 8, use_pallas=False)
    out = knn_cross_spatial(qj, tj, 8, tile_n=32, tile_m=64, interpret=True)

    d_ref = np.linalg.norm(t[0][np.asarray(ref)[0]] - q[0][:, None], axis=-1)
    d_out = np.linalg.norm(t[0][np.asarray(out)[0]] - q[0][:, None], axis=-1)
    np.testing.assert_allclose(d_out, d_ref, rtol=1e-3, atol=5e-5)
    assert d_out[7, 0] == 0.0         # the duplicate found its twin


def test_knn_stream_diag_stretch_is_result_invariant(rng):
    """diag_stretch only reorders tile visits — results must be
    bit-identical across stretch values (incl. the merge's tie handling)."""
    src, tgt = _clouds(rng)
    ref = knn_stream(src, tgt, 8, tile_n=64, tile_m=32, interpret=True,
                     diag_order=True)
    for s in (2, 5):
        out = knn_stream(src, tgt, 8, tile_n=64, tile_m=32, interpret=True,
                         diag_order=True, diag_stretch=s)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_knn_self_vspace_matches_spatial(rng):
    """The v-space result, mapped back through (inv's inverse, inv),
    equals knn_self_spatial bit-for-bit — same kernel, same tie rule; the
    only difference is WHO pays the id remap (here: nobody)."""
    from ogmm_tpu.ops.pallas_stream import knn_self_spatial, knn_self_vspace

    u = rng.rand(2, 300, 2).astype(np.float32)
    z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
    x = jnp.asarray(np.concatenate([u, 0.3 * z], axis=-1))
    B, N, k = 2, 300, 10

    xs, idx_s, inv = knn_self_vspace(x, k, tile_n=64, tile_m=64,
                                     interpret=True)
    ref = knn_self_spatial(x, k, tile_n=64, tile_m=64, interpret=True)

    order = np.argsort(np.asarray(inv), axis=-1)        # inv's inverse
    # xs is x reordered by `order`
    np.testing.assert_array_equal(
        np.asarray(xs), np.take_along_axis(np.asarray(x),
                                           order[..., None], axis=1))
    # sorted-space ids -> original ids -> original row order == spatial
    orig = np.take_along_axis(order, np.asarray(idx_s).reshape(B, -1),
                              axis=1).reshape(B, N, k)
    back = np.take_along_axis(orig, np.asarray(inv)[..., None], axis=1)
    np.testing.assert_array_equal(back, np.asarray(ref))


def test_knn_self_vspace_coordinate_gather_equivalence(rng):
    """What the model actually consumes: gathering COORDINATES through the
    v-space graph and un-sorting the per-point result equals gathering
    through the original-order graph — no id remap needed anywhere."""
    from ogmm_tpu.ops.common import gather_neighbors
    from ogmm_tpu.ops.pallas_stream import knn_self_spatial, knn_self_vspace

    x = jnp.asarray(rng.randn(2, 257, 3).astype(np.float32))
    B, N, k = 2, 257, 6
    xs, idx_s, inv = knn_self_vspace(x, k, tile_n=32, tile_m=64,
                                     interpret=True)
    ref_idx = knn_self_spatial(x, k, tile_n=32, tile_m=64, interpret=True)

    nbr_s = gather_neighbors(xs, idx_s)                  # (B, N, k, 3)
    nbr = jnp.take_along_axis(nbr_s.reshape(B, N, -1), inv[..., None],
                              axis=1).reshape(B, N, k, 3)
    np.testing.assert_array_equal(np.asarray(nbr),
                                  np.asarray(gather_neighbors(x, ref_idx)))


def test_knn_self_vspace_router_fallback(rng):
    """ops/common.py:knn_self_vspace degenerates to the original-order
    graph (inv None, xs is x) off-TPU / at small N."""
    from ogmm_tpu.ops.common import knn_self_vspace as router

    x = jnp.asarray(rng.randn(1, 120, 3).astype(np.float32))
    xs, idx, inv = router(x, 5, use_pallas=False)
    assert inv is None and xs is x
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(knn(x, x, 5, use_pallas=False)))
