"""Tests for the round-2 datautils ports: get_inner_labels, mutual_selection,
pose helpers (identity/inverse/from_xyzquat), file-listing helpers,
Mesh2Points, ModelNetCP category filter, objread.

get_inner_labels and the file helpers run the reference's own code as an
oracle (reference datasets/datautils.py:42-90, 352-394). mutual_selection
and from_xyzquat cannot run on this image (reference uses removed np.bool /
scipy as_dcm APIs), so they are checked against hand-computed expectations
that encode the same definitions.
"""
import os
import sys
import types

import numpy as np
import pytest

from ogmm_tpu.data import datautils as du


def _ref_datautils():
    for name in ("open3d",):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    pytest.importorskip("torch")
    return pytest.importorskip("datasets.datautils")


def _overlapping_pair(rng, n=60, m=50):
    """Two partially overlapping clouds + the GT pose between them."""
    from scipy.spatial.transform import Rotation
    base = rng.randn(80, 3).astype(np.float64) * 0.5
    rot = Rotation.from_rotvec([0.1, -0.2, 0.3]).as_matrix()
    trans = np.array([0.05, -0.02, 0.08])
    src = base[:n]
    tgt = base[30:30 + m] @ rot.T + trans
    # GT maps src into tgt's frame
    pose = np.concatenate([rot, trans[:, None]], axis=1)
    return src, tgt, pose


@pytest.mark.parametrize("label_type", [1, 2, 3])
def test_get_inner_labels_matches_reference(rng, label_type):
    ref = _ref_datautils()
    src, tgt, pose = _overlapping_pair(rng)
    # jitter so NNs are unambiguous but within thresh
    src = src + rng.randn(*src.shape) * 1e-3
    p_ref, is_ref, it_ref = ref.get_inner_labels(
        src, tgt, pose, thresh=0.05, label_type=label_type)
    p_our, is_our, it_our = du.get_inner_labels(
        src, tgt, pose, thresh=0.05, label_type=label_type)
    np.testing.assert_array_equal(p_our, p_ref)
    np.testing.assert_array_equal(is_our, is_ref)
    np.testing.assert_array_equal(it_our, it_ref)


def test_get_inner_labels_type3_fill_order(rng):
    """Type-3's greedy fill is order-dependent: two unmatched rows sharing a
    NN column — only the first may claim it."""
    src = np.array([[0.0, 0, 0], [0.011, 0, 0], [5.0, 5, 5]])
    tgt = np.array([[0.005, 0, 0], [9.0, 9, 9]])
    pose = np.eye(3, 4)
    perm, in_s, in_t = du.get_inner_labels(src, tgt, pose, thresh=0.05,
                                           label_type=3)
    assert perm.sum() == 1.0          # one-to-one: column 0 claimed once
    assert perm[0, 0] == 1.0          # row 0 wins (visited first)
    assert in_s.ravel().tolist() == [1.0, 0.0, 0.0]
    ref = _ref_datautils()
    p_ref, _, _ = ref.get_inner_labels(src, tgt, pose, thresh=0.05,
                                       label_type=3)
    np.testing.assert_array_equal(perm, p_ref)


def test_mutual_selection_definition(rng):
    s = rng.rand(3, 8, 8)
    out = du.mutual_selection(s)
    assert out.shape == (3, 8, 8) and out.dtype == bool
    for b in range(3):
        for i in range(8):
            for j in range(8):
                expect = (s[b, i].argmax() == j) and (s[b, :, j].argmax() == i)
                assert out[b, i, j] == expect
    # 2-D input keeps the added batch dim (reference behavior)
    assert du.mutual_selection(s[0]).shape == (1, 8, 8)


def test_pose_helpers(rng):
    assert du.identity().shape == (3, 4)
    np.testing.assert_array_equal(du.identity(), np.eye(3, 4))

    from scipy.spatial.transform import Rotation
    rot = Rotation.from_rotvec(rng.randn(4, 3) * 0.4).as_matrix()
    trans = rng.randn(4, 3)
    inv = du.inverse(rot, trans)
    assert inv.shape == (4, 3, 4)
    # composing pose ∘ inverse gives identity
    pts = rng.randn(4, 10, 3)
    fwd = np.einsum('bij,bnj->bni', rot, pts) + trans[:, None]
    back = np.einsum('bij,bnj->bni', inv[:, :, :3], fwd) + inv[:, None, :, 3]
    np.testing.assert_allclose(back, pts, atol=1e-10)

    # from_xyzquat: R from the quaternion, t = R @ (-xyz), 4x4 output
    xyz = rng.randn(3)
    q = Rotation.from_rotvec([0.2, 0.1, -0.3]).as_quat()  # (x, y, z, w)
    g = du.from_xyzquat(np.concatenate([xyz, q]))
    assert g.shape == (4, 4)
    r_expect = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(g[:3, :3], r_expect, atol=1e-12)
    np.testing.assert_allclose(g[:3, 3], r_expect @ (-xyz), atol=1e-12)
    np.testing.assert_array_equal(g[3], [0, 0, 0, 1])


def test_file_helpers_match_reference(tmp_path):
    ref = _ref_datautils()
    d = tmp_path / "seq"
    d.mkdir()
    for name in ["frame-10.ply", "frame-2.ply", "frame-2.txt", "b.ply",
                 "depth-1.png", "color-1.png", "color-12.png"]:
        (d / name).write_text("x")
    (d / "sub2").mkdir()
    (d / "sub10").mkdir()

    assert du.sorted_alphanum(["a10", "a2", "b1"]) == \
        ref.sorted_alphanum(["a10", "a2", "b1"])
    assert du.get_file_list(str(d)) == ref.get_file_list(str(d))
    assert du.get_file_list(str(d), ".ply") == ref.get_file_list(str(d), ".ply")
    assert du.get_file_list_specific(str(d), "color", ".png") == \
        ref.get_file_list_specific(str(d), "color", ".png")
    assert sorted(du.get_file_list_specific(str(d), "color")) == \
        sorted(ref.get_file_list_specific(str(d), "color"))
    assert du.get_folder_list(str(d)) == ref.get_folder_list(str(d))

    new = str(d / "made" / "deep")
    du.ensure_dir(new)
    assert os.path.isdir(new)
    du.ensure_dir(new)  # idempotent


def test_mesh2points_and_objread(tmp_path, rng):
    from ogmm_tpu.data.mesh import Mesh, Mesh2Points, objread
    v = rng.rand(7, 3)
    pts = Mesh2Points()(Mesh(v))
    assert pts.dtype == np.float32 and pts.shape == (7, 3)
    np.testing.assert_allclose(pts, v.astype(np.float32))

    obj = tmp_path / "tri.obj"
    obj.write_text(
        "# comment\n"
        "v 0.0 0.0 0.0\n"
        "v 1.0 0.5 0.25\n"
        "v -1.0 2.0 3.0\n"
        "f 1 2 3\n")
    mesh = objread(str(obj))
    np.testing.assert_allclose(
        mesh.vertex_array,
        [[0, 0, 0], [1.0, 0.5, 0.25], [-1.0, 2.0, 3.0]])
    pts = Mesh2Points()(mesh)
    assert pts.shape == (3, 3)


def test_modelnetcp_category_filter():
    from ogmm_tpu.data.modelnet import ModelNetCP
    ds_all = ModelNetCP("synthetic:32", n_points=64, unseen=False,
                        partition='train')
    labels = np.unique(ds_all.label)
    cat = int(labels[0])
    ds_cat = ModelNetCP("synthetic:32", n_points=64, unseen=False,
                        partition='train', category=cat)
    assert len(ds_cat) > 0
    assert np.all(ds_cat.label == cat)
    assert len(ds_cat) == int((ds_all.label == cat).sum())
