"""Tiled Pallas kNN kernel vs the top_k reference (interpret mode)."""
import jax.numpy as jnp
import numpy as np

from ogmm_tpu.ops.common import knn
from ogmm_tpu.ops.pallas_knn import knn_pallas


def test_knn_pallas_matches_topk(rng):
    src = jnp.asarray(rng.randn(2, 150, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(2, 97, 3).astype(np.float32))
    ref = knn(src, tgt, 8, use_pallas=False)
    out = knn_pallas(src, tgt, 8, tile_n=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_knn_pallas_self_graph_tail_tile(rng):
    # N=117 with tile 64 -> ragged tail tile must still write correct rows
    x = jnp.asarray(rng.randn(3, 117, 3).astype(np.float32))
    ref = knn(x, x, 20, use_pallas=False)
    out = knn_pallas(x, x, 20, tile_n=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # nearest neighbour of each point in its own cloud is itself
    np.testing.assert_array_equal(np.asarray(out[..., 0]),
                                  np.arange(117)[None].repeat(3, 0))


def test_knn_pallas_sorted_by_distance(rng):
    src = jnp.asarray(rng.randn(1, 80, 3).astype(np.float32))
    out = np.asarray(knn_pallas(src, src, 10, tile_n=64, interpret=True))[0]
    pts = np.asarray(src)[0]
    for i in range(0, 80, 13):
        d = np.sum((pts[out[i]] - pts[i]) ** 2, -1)
        assert np.all(np.diff(d) >= -1e-12), "neighbours not distance-sorted"


def test_nn1_pallas_matches_min_argmin(rng):
    from ogmm_tpu.ops.pallas_knn import nn1_pallas
    from ogmm_tpu.ops.common import square_distance
    src = jnp.asarray(rng.randn(2, 130, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(2, 75, 3).astype(np.float32))
    d, i = nn1_pallas(src, tgt, tile_n=64, interpret=True)
    dm = square_distance(src, tgt)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(jnp.argmin(dm, -1)))
    np.testing.assert_allclose(np.asarray(d), np.asarray(jnp.min(dm, -1)),
                               rtol=1e-4, atol=1e-6)


def test_posenc_angles_matches_jnp():
    """Fused angle kernel vs the jnp composition (interpreter mode), incl.
    a padded tail tile."""
    import jax.numpy as jnp

    from ogmm_tpu.ops.common import gather_neighbors, knn, l2_normalize
    from ogmm_tpu.ops.pallas_knn import posenc_angles_pallas

    rs = np.random.RandomState(5)
    B, N, k = 2, 90, 5
    pts = jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.4)
    centroid = pts.mean(axis=1, keepdims=True)
    p2gc = pts - centroid
    idx = knn(pts, pts, k)
    p2lc = gather_neighbors(pts, idx) - pts[:, :, None, :]
    ref = jnp.einsum('bnkc,bnc->bnk', l2_normalize(p2lc), l2_normalize(p2gc))
    out = posenc_angles_pallas(pts, k=k, tile_n=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
