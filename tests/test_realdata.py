"""Scene7 / IclNuim readers end-to-end on generated fixtures.

Real 7-Scenes/ICL-NUIM data can't be downloaded here; these tests build
tiny on-disk datasets in the exact layouts the readers expect (reference
datasets/realdata.py) and drive the full __getitem__ pipeline, including the
documented `tgt_overlap = src_overlap` quirk (realdata.py:127, 187).
"""
import numpy as np
import pytest

from ogmm_tpu.data.realdata import IclNuim, Scene7

N_RAW = 400
N_POINTS = 200


def _write_ply(path, verts):
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex %d\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"end_header\n" % len(verts))
    path.write_bytes(header + verts.astype('<f4').tobytes())


@pytest.fixture
def scene7_root(tmp_path):
    rs = np.random.RandomState(0)
    for scene in ("7-scenes-office", "7-scenes-chess", "7-scenes-fire",
                  "7-scenes-heads", "7-scenes-pumpkin",
                  "7-scenes-redkitchen", "7-scenes-stairs"):
        d = tmp_path / "7scene" / scene
        d.mkdir(parents=True)
        for i in range(2):
            _write_ply(d / f"cloud_{i}.ply",
                       rs.randn(N_RAW, 3).astype(np.float32))
    return str(tmp_path)


def test_scene7_item_contract(scene7_root):
    ds = Scene7(scene7_root, n_points=N_POINTS, partial=[0.7, 0.7],
                partition='test')
    assert len(ds) == 2                      # office only at test
    item = ds[0]
    n_sub = int(0.7 * N_POINTS)
    assert item['src_xyz'].shape == (n_sub, 3)
    assert item['tgt_xyz'].shape == (n_sub, 3)
    assert item['src_overlap'].shape == (n_sub,)
    # quirk preserved: tgt_overlap aliases src_overlap (realdata.py:127)
    np.testing.assert_array_equal(item['tgt_overlap'], item['src_overlap'])
    assert item['transform_gt'].shape == (4, 4)
    assert item['pose_gt'].shape == (7,)
    # train split sees the other six scenes
    tr = Scene7(scene7_root, n_points=N_POINTS, partial=[0.7, 0.7],
                partition='train')
    assert len(tr) == 12


def _write_iclnuim(tmp_path, partition, n_items=3):
    import h5py
    rs = np.random.RandomState(1)
    d = tmp_path / "icl_nuim" / partition
    d.mkdir(parents=True)
    with h5py.File(d / "icl_nuim.h5", "w") as f:
        pts = rs.randn(n_items, N_RAW, 3).astype(np.float32)
        if partition == "test":
            f['source'] = pts
            f['target'] = rs.randn(n_items, N_RAW, 3).astype(np.float32)
            tsfm = np.broadcast_to(np.eye(4, dtype=np.float32),
                                   (n_items, 4, 4)).copy()
            f['transform'] = tsfm
        else:
            f['points'] = pts
    return str(tmp_path)


def test_iclnuim_test_split(tmp_path):
    root = _write_iclnuim(tmp_path, "test")
    ds = IclNuim(root, n_points=N_POINTS, partial=[0.7, 0.7],
                 partition='test')
    assert len(ds) == 3
    item = ds[1]
    n_sub = int(0.7 * N_POINTS)
    assert item['src_xyz'].shape == (n_sub, 3)
    assert item['tgt_xyz'].shape == (n_sub, 3)
    np.testing.assert_array_equal(item['tgt_overlap'], item['src_overlap'])
    # per-index seeding makes items reproducible (reference realdata.py:160)
    again = ds[1]
    np.testing.assert_array_equal(item['src_xyz'], again['src_xyz'])
    np.testing.assert_array_equal(item['transform_gt'], again['transform_gt'])


def test_iclnuim_train_split(tmp_path):
    root = _write_iclnuim(tmp_path, "train")
    ds = IclNuim(root, n_points=N_POINTS, partial=[0.7, 0.7],
                 partition='train')
    item = ds[0]
    n_sub = int(0.7 * N_POINTS)
    assert item['src_xyz'].shape == (n_sub, 3)
    assert np.all(np.isfinite(item['src_xyz']))
