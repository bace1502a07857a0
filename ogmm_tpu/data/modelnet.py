"""ModelNet40 dataset family (host-side, torch-free).

Reference: datasets/modelnet.py. Four variants:
  * ModelNetHdf  — the primary '--dataset modelnet' path: h5 clouds, unseen
    split (labels >= 20 at test), 1024-pt permutation, dict-transform chain.
  * ModelNetCP   — crop pair + KD-tree overlap labels.
  * ModelNetDV   — density variation (src 768 / tgt 1536 via FPS).
  * ModelNetGMR  — RRI features, 55% crop (DeepGMR protocol).

Plus `SyntheticPointClouds`, a drop-in h5-free source that samples structured
random shapes so the full pipeline trains/benches without the ModelNet40
download (the reference hard-requires the h5 files, datautils.py:146-159).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ogmm_tpu.data import transforms as T
from ogmm_tpu.data.datautils import (RandomCropPair, farthest_point_sample,
                                     get_rri, jitter_pcd, load_modelnet_h5,
                                     np_mat2quat, overlap_labels, random_pose)


def get_transforms(noise_type: str, rot_mag: float = 45.0,
                   trans_mag: float = 0.5, num_points: int = 1024,
                   partial_p_keep: Optional[List[float]] = None):
    """Train/test transform chains per noise regime.

    Reference: datasets/modelnet.py:22-92 — clean / jitter / crop orders
    preserved exactly (crop resamples AFTER the SE3 perturbation).
    """
    partial_p_keep = partial_p_keep if partial_p_keep is not None else [0.7, 0.7]
    if noise_type == "clean":
        train = [T.Resampler(num_points), T.SplitSourceRef(),
                 T.RandomTransformSE3_euler(rot_mag=rot_mag, trans_mag=trans_mag),
                 T.ShufflePoints()]
        test = [T.SetDeterministic()] + [T.Resampler(num_points),
                T.SplitSourceRef(),
                T.RandomTransformSE3_euler(rot_mag=rot_mag, trans_mag=trans_mag),
                T.ShufflePoints()]
    elif noise_type == "jitter":
        train = [T.Resampler(num_points), T.SplitSourceRef(),
                 T.RandomTransformSE3_euler(rot_mag=rot_mag, trans_mag=trans_mag),
                 T.RandomJitter(), T.ShufflePoints()]
        test = [T.SetDeterministic(), T.Resampler(num_points), T.SplitSourceRef(),
                T.RandomTransformSE3_euler(rot_mag=rot_mag, trans_mag=trans_mag),
                T.RandomJitter(), T.ShufflePoints()]
    elif noise_type == "crop":
        train = [T.SplitSourceRef(), T.RandomCrop(partial_p_keep),
                 T.RandomTransformSE3_euler(rot_mag=rot_mag, trans_mag=trans_mag),
                 T.Resampler(num_points), T.RandomJitter(), T.ShufflePoints()]
        test = [T.SetDeterministic(), T.SplitSourceRef(),
                T.RandomCrop(partial_p_keep),
                T.RandomTransformSE3_euler(rot_mag=rot_mag, trans_mag=trans_mag),
                T.Resampler(num_points), T.RandomJitter(), T.ShufflePoints()]
    else:
        raise NotImplementedError(noise_type)
    return T.Compose(train), T.Compose(test)


def synthetic_clouds(n_shapes: int, n_raw: int = 2048, seed: int = 0):
    """Structured random shapes standing in for ModelNet40 meshes.

    Mixes per-shape gaussian blobs, boxes and cylinders so kNN graphs and FPS
    see realistic non-uniform density; unit-sphere normalised like ModelNet.
    Returns (data (S, n_raw, 6) xyz+pseudo-normals, labels (S, 1)).
    """
    rng = np.random.RandomState(seed)
    data = np.zeros((n_shapes, n_raw, 6), dtype=np.float32)
    labels = (np.arange(n_shapes) % 40).astype(np.int64)[:, None]
    for s in range(n_shapes):
        kind = s % 3
        if kind == 0:       # gaussian blob mixture
            centers = rng.randn(4, 3) * 0.5
            pts = np.concatenate([
                c + 0.25 * rng.randn(n_raw // 4, 3) for c in centers], 0)
        elif kind == 1:     # box surface
            face = rng.randint(0, 6, n_raw)
            pts = rng.uniform(-1, 1, (n_raw, 3))
            pts[np.arange(n_raw), face % 3] = np.where(face < 3, 1.0, -1.0)
        else:               # cylinder
            theta = rng.uniform(0, 2 * np.pi, n_raw)
            z = rng.uniform(-1, 1, n_raw)
            pts = np.stack([np.cos(theta), np.sin(theta), z], -1)
        pts = pts[:n_raw]
        pts = pts - pts.mean(0)
        pts = pts / np.abs(pts).max()
        normals = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-6)
        data[s, :, :3] = pts
        data[s, :, 3:] = normals
    return data, labels


class SyntheticPointClouds:
    """In-memory (data, label) source with the ModelNetHdf array contract."""

    def __init__(self, n_shapes: int = 64, n_raw: int = 2048, seed: int = 0):
        self.data, self.label = synthetic_clouds(n_shapes, n_raw, seed)


def _load_source(root: str, partition: str):
    """h5 from disk, or synthetic fallback when root == 'synthetic[:N]'."""
    if root.startswith("synthetic"):
        n_shapes = int(root.split(":")[1]) if ":" in root else 64
        seed = 0 if partition == "train" else 1
        src = SyntheticPointClouds(n_shapes=n_shapes, seed=seed)
        return src.data, src.label
    return load_modelnet_h5(partition, root)


class ModelNetHdf:
    """Primary ModelNet40 dataset (reference datasets/modelnet.py:293-351).

    Split quirk preserved: test-unseen keeps labels >= 20, every other
    combination keeps labels < 20 (reference lines 315-320). `category`
    restricts to a single class id BEFORE the split (reference lines
    308-310 — NB the reference's own filter is dead code: its double-load
    bug at line 314 reloads `self.data` unfiltered, so a category-filtered
    mask no longer matches; here the filter actually works, applied to the
    single load, consistent with the conscious double-load fix).
    """

    def __init__(self, root: str, unseen: bool = False, transform=None,
                 partition: str = 'train', category: int | None = None):
        data, label = _load_source(root, partition)
        label = label.squeeze()
        if category is not None:
            data = data[label == category]
            label = label[label == category]
        if unseen and partition == 'test':
            keep = label >= 20
        else:
            keep = label < 20
        self.data = data[keep]
        self.label = label[keep]
        self._transform = transform

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item: int):
        points = np.random.permutation(self.data[item, :, :])[:1024]
        sample = {'points': points, 'label': self.label[item],
                  'idx': np.array(item, dtype=np.int32)}
        if self._transform:
            sample = self._transform(sample)
        return {
            'src_xyz': sample['points_src'][:, :3].astype('float32'),
            'tgt_xyz': sample['points_ref'][:, :3].astype('float32'),
            'tgt_raw': sample['points_raw'][:, :3].astype('float32'),
            'src_overlap': np.asarray(sample['src_overlap']).astype('float32'),
            'tgt_overlap': np.asarray(sample['ref_overlap']).astype('float32'),
            'transform_gt': sample['transform_gt'].astype('float32'),
            'pose_gt': np_mat2quat(sample['transform_gt'].astype('float32')),
            'idx': np.asarray(item, dtype=np.int32),
        }


class ModelNetCP:
    """Crop-pair variant with KD-tree overlap labels.

    Reference: datasets/modelnet.py:171-230.
    """

    def __init__(self, root: str, n_points: int, rot_mag: float = 45.0,
                 trans_mag: float = 0.5, unseen: bool = True,
                 partial: List[float] = (0.7,), noise_type: str = 'crop',
                 partition: str = 'train', category: int | None = None):
        data, label = _load_source(root, partition)
        label = label.squeeze()
        if category is not None:
            # single-category filter (reference modelnet.py:175-177), applied
            # before the unseen split like the reference
            data = data[label == category]
            label = label[label == category]
        keep = (label >= 20) if (unseen and partition == 'test') else (label < 20)
        self.data = data[keep]
        self.label = label[keep]
        self.num_points = n_points
        self.partition = partition
        self.max_angle = rot_mag
        self.max_trans = trans_mag
        self.crop = RandomCropPair(p_keep=list(partial)[:1])
        self.noisy = noise_type

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item: int):
        points = self.data[item]
        src = np.random.permutation(points[:, :3])[:self.num_points]
        tgt = np.random.permutation(points[:, :3])[:self.num_points]
        if self.partition != 'train':
            np.random.seed(item)
        src, tgt = self.crop(src, tgt)
        tsfm = random_pose(self.max_angle, self.max_trans / 2)
        if self.partition == 'train':
            pose1 = random_pose(np.pi, self.max_trans)
            pose2 = tsfm @ pose1
            src = src @ pose1[:3, :3].T + pose1[:3, 3]
            tgt = tgt @ pose2[:3, :3].T + pose2[:3, 3]
        else:
            tgt = tgt @ tsfm[:3, :3].T + tsfm[:3, 3]
        if self.noisy != 'clean':
            src = jitter_pcd(src)
            tgt = jitter_pcd(tgt)
        src_label, tgt_label = overlap_labels(src, tgt, tsfm)
        return {
            'src_xyz': src[:, :3].astype('float32'),
            'tgt_xyz': tgt[:, :3].astype('float32'),
            'tgt_raw': points[:, :3].astype('float32'),
            'src_overlap': src_label.astype('float32'),
            'tgt_overlap': tgt_label.astype('float32'),
            'transform_gt': tsfm.astype('float32'),
            'pose_gt': np_mat2quat(tsfm.astype('float32')),
            'idx': np.asarray(item, dtype=np.int32),
        }


class ModelNetDV:
    """Density-variation variant: src FPS->768, tgt FPS->1536.

    Reference: datasets/modelnet.py:233-290.
    """

    def __init__(self, root: str, num_points: int = 2048,
                 num_subsampled_points: int = 768, partition: str = 'train',
                 gaussian_noise: bool = False, unseen: bool = False,
                 rot_factor: float = 4.0, category: int | None = None):
        data, label = _load_source(root, partition)
        label = label.squeeze()
        if category is not None:
            # single-category filter (reference modelnet.py:238-240),
            # applied before the unseen split like the reference
            data = data[label == category]
            label = label[label == category]
        keep = (label >= 20) if (unseen and partition == 'test') else (label < 20)
        self.data = data[keep]
        self.label = label[keep]
        self.num_points = num_points
        self.num_subsampled_points = num_subsampled_points
        self.partition = partition
        self.max_angle = np.pi / rot_factor
        self.max_trans = 0.5
        self.noisy = gaussian_noise
        self.subsampled = num_points != num_subsampled_points
        self.crop = RandomCropPair(p_keep=[0.75, 0.75])

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item: int):
        points = self.data[item][:self.num_points]
        src = np.random.permutation(points[:, :3])[:self.num_points]
        tgt = np.random.permutation(points[:, :3])[:self.num_points]
        if self.partition != 'train':
            np.random.seed(item)
        if self.subsampled:
            src, tgt = self.crop(src, tgt)
            if self.num_subsampled_points < src.shape[0]:
                src = farthest_point_sample(src, self.num_subsampled_points)
            if self.num_subsampled_points < tgt.shape[0] // 2:
                tgt = farthest_point_sample(tgt, 2 * self.num_subsampled_points)
        tsfm = random_pose(self.max_angle, self.max_trans / 2)
        if self.partition == 'train':
            pose1 = random_pose(np.pi, self.max_trans)
            pose2 = tsfm @ pose1
            src = src @ pose1[:3, :3].T + pose1[:3, 3]
            tgt = tgt @ pose2[:3, :3].T + pose2[:3, 3]
        else:
            tgt = tgt @ tsfm[:3, :3].T + tsfm[:3, 3]
        if self.noisy:
            src = jitter_pcd(src)
            tgt = jitter_pcd(tgt)
        return [src.astype('float32'), tgt.astype('float32'),
                tsfm.astype('float32')]


class ModelNetGMR:
    """DeepGMR-protocol variant with RRI features and 55% crop.

    Reference: datasets/modelnet.py:108-168.
    """

    def __init__(self, root: str, num_points: int,
                 num_subsampled_points: int = 768, partition: str = 'train',
                 gaussian_noise: bool = False, unseen: bool = False,
                 rot_factor: float = 4.0, k: int = 20,
                 category: int | None = None):
        data, label = _load_source(root, partition)
        label = label.squeeze()
        if category is not None:
            # single-category filter (reference modelnet.py:113-115),
            # applied before the unseen split like the reference
            data = data[label == category]
            label = label[label == category]
        keep = (label >= 20) if (unseen and partition == 'test') else (label < 20)
        self.data = data[keep]
        self.label = label[keep]
        self.num_subsampled_points = num_subsampled_points
        self.partition = partition
        self.n_points = num_points
        self.subsampled = num_points != num_subsampled_points
        self.crop = RandomCropPair(p_keep=[0.55, 0.55])
        self.max_angle = np.pi / rot_factor
        self.max_trans = 0.5
        self.noisy = gaussian_noise
        self.k = k

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, index: int):
        if self.partition != 'train':
            np.random.seed(index)
        points = self.data[index]
        src = np.random.permutation(points[:, :3])[:self.n_points]
        tgt = np.random.permutation(points[:, :3])[:self.n_points]
        if self.subsampled:
            src, tgt = self.crop(src, tgt)
            if self.num_subsampled_points < src.shape[0]:
                src = farthest_point_sample(src, self.num_subsampled_points)
                tgt = farthest_point_sample(tgt, self.num_subsampled_points)
        tsfm = random_pose(self.max_angle, self.max_trans / 2)
        if self.partition == 'train':
            pose1 = random_pose(np.pi, self.max_trans)
            pose2 = tsfm @ pose1
            src = src @ pose1[:3, :3].T + pose1[:3, 3]
            tgt = tgt @ pose2[:3, :3].T + pose2[:3, 3]
        else:
            tgt = tgt @ tsfm[:3, :3].T + tsfm[:3, 3]
        if self.noisy:
            src = jitter_pcd(src)
            tgt = jitter_pcd(tgt)
        src = np.concatenate([src, get_rri(src - src.mean(0), self.k)], axis=1)
        tgt = np.concatenate([tgt, get_rri(tgt - tgt.mean(0), self.k)], axis=1)
        return (src.astype('float32'), tgt.astype('float32'),
                tsfm.astype('float32'))
