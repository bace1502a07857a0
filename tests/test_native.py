"""Native host library (C++ grid-hash) vs scipy reference semantics.

The native lib replaces the reference's third-party C++ surface
(Open3D radius search lib/o3dutils.py:217-226, sklearn 1-NN
datasets/datautils.py:23-39, Python FPS loop datasets/datautils.py:249-272).
Every test cross-checks against an independent scipy/numpy oracle.
"""
import numpy as np
import pytest
from scipy.spatial import cKDTree

from ogmm_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.available(), "native lib must build on this image (g++ baked in)"


def test_radius_overlap_matches_kdtree(rng):
    src = rng.randn(400, 3).astype(np.float32)
    tgt = (rng.randn(500, 3) * 1.1).astype(np.float32)
    thresh = 0.35
    s_lab, t_lab = native.radius_overlap(src, tgt, thresh)

    tree = cKDTree(tgt)
    neigh = tree.query_ball_point(src, thresh)
    s_ref = np.array([len(n) > 0 for n in neigh], np.float32)
    t_ref = np.zeros(len(tgt), np.float32)
    for n in neigh:
        t_ref[n] = 1.0
    np.testing.assert_array_equal(s_lab, s_ref)
    np.testing.assert_array_equal(t_lab, t_ref)


def test_radius_overlap_empty_overlap(rng):
    src = rng.randn(50, 3).astype(np.float32)
    tgt = rng.randn(60, 3).astype(np.float32) + 100.0
    s_lab, t_lab = native.radius_overlap(src, tgt, 0.1)
    assert s_lab.sum() == 0 and t_lab.sum() == 0


def test_nearest_neighbor_matches_kdtree(rng):
    src = rng.randn(300, 3).astype(np.float32)
    dst = rng.randn(400, 3).astype(np.float32)
    dist, idx = native.nearest_neighbor(src, dst)
    tree = cKDTree(dst)
    dref, iref = tree.query(src, k=1)
    np.testing.assert_array_equal(idx, iref)
    np.testing.assert_allclose(dist, dref, rtol=1e-5)


def test_nearest_neighbor_degenerate_cluster(rng):
    # all dst points identical: grid is a single cell; must still answer
    src = rng.randn(10, 3).astype(np.float32)
    dst = np.zeros((5, 3), np.float32)
    dist, idx = native.nearest_neighbor(src, dst)
    np.testing.assert_allclose(dist, np.linalg.norm(src, axis=1), rtol=1e-5)
    assert np.all((idx >= 0) & (idx < 5))


def test_fps_matches_numpy_oracle(rng):
    pts = rng.randn(200, 3).astype(np.float32)
    start = 7
    idx = native.fps_indices(pts, 32, start)

    # independent numpy oracle (reference datautils.py:249-272 recurrence)
    n = len(pts)
    dist = np.full(n, np.inf)
    ref = np.zeros(32, np.int64)
    far = start
    for i in range(32):
        ref[i] = far
        d = np.sum((pts - pts[far]) ** 2, -1)
        np.minimum(dist, d, out=dist)
        far = int(np.argmax(dist))
    np.testing.assert_array_equal(idx, ref)
    assert len(np.unique(idx)) == 32  # FPS never repeats while n > npoint


def test_fps_via_datautils_rng_determinism():
    from ogmm_tpu.data.datautils import farthest_point_sample
    pts = np.random.RandomState(3).randn(150, 3).astype(np.float32)
    a, ia = farthest_point_sample(pts, 16, is_idx=True,
                                  rng=np.random.RandomState(5))
    b, ib = farthest_point_sample(pts, 16, is_idx=True,
                                  rng=np.random.RandomState(5))
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(a, b)
