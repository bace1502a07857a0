"""Unit tests for ops: knn vs brute force, sinkhorn marginals, FPS, GMM."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ogmm_tpu.ops import (farthest_point_sample, gather_neighbors,
                          get_anchor_corrs, get_local_corrs, gmm_params,
                          graph_feature, index_points, knn, og_params,
                          sinkhorn, square_distance, wkeans_plus)


def test_square_distance_matches_numpy(rng):
    a = rng.randn(2, 20, 3).astype(np.float32)
    b = rng.randn(2, 30, 3).astype(np.float32)
    got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_knn_matches_bruteforce(rng):
    a = rng.randn(2, 50, 3).astype(np.float32)
    idx = np.asarray(knn(jnp.asarray(a), jnp.asarray(a), k=5))
    d = ((a[:, :, None, :] - a[:, None, :, :]) ** 2).sum(-1)
    want = np.argsort(d, axis=-1, kind='stable')[:, :, :5]
    # compare distances not indices (ties may reorder)
    got_d = np.take_along_axis(d, idx, axis=-1)
    want_d = np.take_along_axis(d, want, axis=-1)
    np.testing.assert_allclose(got_d, want_d, atol=1e-5)
    # first neighbour of each point is itself
    np.testing.assert_array_equal(idx[:, :, 0], np.tile(np.arange(50), (2, 1)))


def test_graph_feature_shape_and_content(rng):
    x = rng.randn(2, 16, 3).astype(np.float32)
    f = np.asarray(graph_feature(jnp.asarray(x), k=4))
    assert f.shape == (2, 16, 4, 6)
    # center channel is x itself
    np.testing.assert_allclose(f[:, :, 0, 3:], x, atol=1e-6)
    # self-edge difference is zero (nearest neighbour is self)
    np.testing.assert_allclose(f[:, :, 0, :3], 0.0, atol=1e-6)


def test_index_points(rng):
    pts = rng.randn(2, 10, 4).astype(np.float32)
    idx = np.array([[0, 3, 9], [1, 1, 2]], dtype=np.int32)
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], pts[b][idx[b]])


def test_sinkhorn_marginals(rng):
    cost = np.abs(rng.randn(3, 12, 17)).astype(np.float32)
    gamma, loss = sinkhorn(jnp.asarray(cost), epsilon=1e-2, max_iter=200)
    g = np.asarray(gamma)
    np.testing.assert_allclose(g.sum(-1), np.full((3, 12), 1 / 12), atol=1e-3)
    np.testing.assert_allclose(g.sum(-2), np.full((3, 17), 1 / 17), atol=1e-3)
    assert np.isfinite(float(loss))


def test_sinkhorn_custom_marginals(rng):
    cost = np.abs(rng.randn(2, 8, 8)).astype(np.float32)
    p = rng.rand(2, 8).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    gamma, _ = sinkhorn(jnp.asarray(cost), p=jnp.asarray(p), epsilon=1e-2,
                        max_iter=300)
    np.testing.assert_allclose(np.asarray(gamma).sum(-1), p, atol=1e-3)


def test_fps_coverage_and_determinism(rng):
    x = rng.randn(2, 100, 3).astype(np.float32)
    idx1 = np.asarray(farthest_point_sample(jnp.asarray(x), 16, is_center=True))
    idx2 = np.asarray(farthest_point_sample(jnp.asarray(x), 16, is_center=True))
    np.testing.assert_array_equal(idx1, idx2)  # deterministic
    # no duplicate samples
    for b in range(2):
        assert len(set(idx1[b].tolist())) == 16


def test_fps_spreads_points(rng):
    """FPS on a cloud with two far clusters must pick from both."""
    a = rng.randn(1, 50, 3).astype(np.float32)
    b = rng.randn(1, 50, 3).astype(np.float32) + 100.0
    x = np.concatenate([a, b], axis=1)
    idx = np.asarray(farthest_point_sample(jnp.asarray(x), 8, is_center=True))[0]
    assert np.any(idx < 50) and np.any(idx >= 50)


def test_gmm_params_moments(rng):
    gamma = rng.rand(2, 40, 5).astype(np.float32)
    gamma /= gamma.sum(-1, keepdims=True)
    pts = rng.randn(2, 40, 3).astype(np.float32)
    pi, mu = gmm_params(jnp.asarray(gamma), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(pi), gamma.mean(1), atol=1e-5)
    want_mu = np.einsum('bnj,bnd->bjd', gamma.astype(np.float64),
                        pts.astype(np.float64)) / (
        gamma.astype(np.float64).mean(1) * 40 + 1e-5)[..., None]
    np.testing.assert_allclose(np.asarray(mu), want_mu, atol=3e-3)


def test_gmm_params_sigma_isotropic(rng):
    gamma = rng.rand(1, 30, 4).astype(np.float32)
    gamma /= gamma.sum(-1, keepdims=True)
    pts = rng.randn(1, 30, 3).astype(np.float32)
    pi, mu, sigma = gmm_params(jnp.asarray(gamma), jnp.asarray(pts), True)
    s = np.asarray(sigma)
    assert s.shape == (1, 4, 3, 3)
    # isotropic: off-diagonals zero, diagonals equal
    np.testing.assert_allclose(s[..., 0, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(s[..., 0, 0], s[..., 1, 1], atol=1e-6)
    assert np.all(s[..., 0, 0] > 0)


def test_og_params_adds_trash_column(rng):
    gamma = rng.rand(1, 20, 3).astype(np.float32)
    gamma /= gamma.sum(-1, keepdims=True)
    pts = rng.randn(1, 20, 3).astype(np.float32)
    o = rng.rand(1, 20).astype(np.float32)
    pi, mu = og_params(jnp.asarray(pts), jnp.asarray(gamma), jnp.asarray(o))
    assert pi.shape == (1, 4) and mu.shape == (1, 4, 3)


def test_wkeans_plus_shapes_and_grad_path(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    feats = rng.randn(2, 64, 8).astype(np.float32)
    o = rng.rand(2, 64).astype(np.float32)
    gamma, pi, node_xyz, node_feats = wkeans_plus(
        jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(o), n_clusters=8,
        iters=3)
    assert gamma.shape == (2, 64, 8)
    assert node_xyz.shape == (2, 8, 3)
    assert node_feats.shape == (2, 8, 8)
    assert np.all(np.isfinite(np.asarray(node_xyz)))

    # gradient flows through feats (via node_feats) but NOT through xyz/o
    def f(feats_):
        return wkeans_plus(jnp.asarray(xyz), feats_, jnp.asarray(o), 8, 3)[3].sum()
    g = jax.grad(f)(jnp.asarray(feats))
    assert np.abs(np.asarray(g)).sum() > 0

    def f2(xyz_):
        return wkeans_plus(xyz_, jnp.asarray(feats), jnp.asarray(o), 8, 3)[2].sum()
    g2 = jax.grad(f2)(jnp.asarray(xyz))
    np.testing.assert_allclose(np.asarray(g2), 0.0, atol=1e-8)


def test_get_local_corrs(rng):
    xyz = rng.randn(1, 30, 3).astype(np.float32)
    feats = rng.randn(1, 30, 6).astype(np.float32)
    mu = xyz[:, [3, 7, 11]]  # cluster means exactly at points 3, 7, 11
    got = np.asarray(get_local_corrs(jnp.asarray(xyz), jnp.asarray(mu),
                                     jnp.asarray(feats)))
    np.testing.assert_allclose(got, feats[:, [3, 7, 11]], atol=1e-6)


def test_get_anchor_corrs(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    feats = rng.randn(2, 64, 16).astype(np.float32)
    fa, fp, mu, ids = get_anchor_corrs(jnp.asarray(xyz), jnp.asarray(feats), 8)
    assert fa.shape == (2, 8, 16) and fp.shape == (2, 8, 16)
    assert mu.shape == (2, 8, 3) and ids.shape == (2, 8)
    # anchors are actual points => anchor feats == gathered feats
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fp), atol=1e-6)


def test_wkeans_separates_blobs(rng):
    """Sinkhorn k-means (euclidean mode) recovers two well-separated blobs
    (reference lib/utils.py:201-219)."""
    from ogmm_tpu.ops.gmm import wkeans
    import jax.numpy as jnp
    a = rng.randn(1, 32, 3).astype(np.float32) * 0.1 + 5.0
    b = rng.randn(1, 32, 3).astype(np.float32) * 0.1 - 5.0
    x = jnp.asarray(np.concatenate([a, b], axis=1))
    gamma, pi, centroids = wkeans(x, 2, dst='eu', iters=10)
    assert gamma.shape == (1, 64, 2) and centroids.shape == (1, 2, 3)
    c = np.sort(np.asarray(centroids)[0, :, 0])
    assert c[0] < -4.0 and c[1] > 4.0          # one centroid per blob
    # points assign to their own blob's centroid
    am = np.asarray(gamma.argmax(-1))[0]
    assert len(np.unique(am[:32])) == 1 and len(np.unique(am[32:])) == 1
    assert am[0] != am[-1]


def test_km_loss_finite_and_grad(rng):
    """KMLoss parity op (reference lib/loss.py:60-80, off the main path)."""
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.losses import km_loss
    pts = jnp.asarray(rng.randn(2, 48, 3).astype(np.float32))
    log_gamma = jnp.asarray(rng.randn(2, 48, 8).astype(np.float32))
    prob = jnp.asarray(rng.rand(2, 48).astype(np.float32))
    loss = km_loss(pts, log_gamma, prob, top_k=16)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda lg: km_loss(pts, lg, prob, top_k=16))(log_gamma)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_fps_combined_matches_separate(rng):
    """One merged 2B-row FPS loop must reproduce both separate passes."""
    import jax.numpy as jnp
    from ogmm_tpu.ops.fps import farthest_point_sample, fps_combined
    xyz = jnp.asarray(rng.randn(3, 90, 3).astype(np.float32))
    a, c = fps_combined(xyz, 16, key=None)
    a_ref = farthest_point_sample(xyz, 16, is_center=False, use_pallas=False)
    c_ref = farthest_point_sample(xyz, 16, is_center=True, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a_ref))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))


def test_nn1_both_matches_directed(rng):
    """nn1_both (single-matrix dense path for chamfer metrics) returns the
    same bidirectional min distances as two directed nn1 calls."""
    from ogmm_tpu.ops.common import nn1, nn1_both
    src = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(2, 70, 3).astype(np.float32))
    d_s, d_t = nn1_both(src, tgt)
    assert d_s.shape == (2, 50) and d_t.shape == (2, 70)
    np.testing.assert_allclose(np.asarray(d_s),
                               np.asarray(nn1(src, tgt)[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_t),
                               np.asarray(nn1(tgt, src)[0]),
                               rtol=1e-6, atol=1e-6)
