"""Real-world datasets: 7-Scenes (.ply fragments) and ICL-NUIM (DeepGMR h5).

Reference: datasets/realdata.py. Quirk preserved (documented, reference
lines 127 & 187): both emit `tgt_overlap = src_overlap`. Pass
`fix_tgt_overlap=True` for the corrected labels.
"""
from __future__ import annotations

import copy
import glob
import os
from typing import List

import numpy as np

from ogmm_tpu.data.datautils import (RandomCropPair, farthest_point_sample,
                                     np_mat2quat, overlap_labels, random_pose)
from ogmm_tpu.data.mesh import plyread


def glob_dataset(root: str, class_to_idx: dict, patterns: List[str]):
    """${root}/${class}/${pattern} enumeration (reference realdata.py:41-61)."""
    root = os.path.expanduser(root)
    samples = []
    for target in sorted(os.listdir(root)):
        d = os.path.join(root, target)
        if not os.path.isdir(d):
            continue
        target_idx = class_to_idx.get(target)
        if target_idx is None:
            continue
        for ptn in patterns:
            for path in sorted(glob.glob(os.path.join(d, ptn))):
                samples.append((path, target_idx))
    return samples


class Scene7:
    """7-Scenes fragments (reference realdata.py:64-135): office at test,
    the other six scenes at train; crop to partial[0] * n_points via FPS."""

    # host overlap-label radius (reference realdata.py:126); the loader
    # validates TrainConfig.overlap_thresh against this when the labels are
    # recomputed on device (ADVICE r4: the pair used to be synced only in
    # the CLI glue)
    overlap_thresh = 0.05

    def __init__(self, root: str, n_points: int = 50000,
                 partial: List[float] = (0.7, 0.7), partition: str = 'test',
                 fix_tgt_overlap: bool = False,
                 compute_overlap: bool = True):
        if partition == "test":
            classes = ["7-scenes-office"]
        else:
            classes = ["7-scenes-chess", "7-scenes-fire", "7-scenes-heads",
                       "7-scenes-pumpkin", "7-scenes-redkitchen",
                       "7-scenes-stairs"]
        classes.sort()
        class_to_idx = {c: i for i, c in enumerate(classes)}
        rootdir = os.path.join(root, '7scene')
        self.samples = glob_dataset(rootdir, class_to_idx, ['*.ply'])
        if not self.samples:
            raise RuntimeError(f"Empty: rootdir={rootdir}")
        self.partition = partition
        self.rot_factor = 4.0
        self.max_trans = 0.5
        self.crop = RandomCropPair(p_keep=list(partial))
        self.n_points = n_points
        self.partial = list(partial)
        self.fix_tgt_overlap = fix_tgt_overlap
        # compute_overlap=False: emit zero placeholders — the trainer
        # recomputes the same labels on device (TrainConfig.device_overlap;
        # the host KD-tree pass dominates per-sample wall time at N=35k)
        self.compute_overlap = compute_overlap

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int):
        path, _ = self.samples[index]
        points = np.asarray(plyread(path).vertex_array)[:self.n_points].astype('float32')
        if points.shape[0] > self.n_points:
            src = np.random.permutation(points)[:self.n_points]
            tgt = np.random.permutation(points)[:self.n_points]
        else:
            src = copy.deepcopy(points)
            tgt = copy.deepcopy(points)
        tsfm = random_pose(np.pi / self.rot_factor, self.max_trans)
        tgt = tgt @ tsfm[:3, :3].T + tsfm[:3, 3]
        src, tgt = self.crop(src, tgt)
        n_sub = int(self.partial[0] * self.n_points)
        if src.shape[0] != n_sub:
            src = farthest_point_sample(src, n_sub)
        if tgt.shape[0] != n_sub:
            tgt = farthest_point_sample(tgt, n_sub)
        if self.compute_overlap:
            src_overlap, tgt_overlap = overlap_labels(src, tgt, tsfm)
            if not self.fix_tgt_overlap:
                tgt_overlap = src_overlap   # reference realdata.py:127
        else:
            src_overlap = np.zeros(src.shape[0])
            tgt_overlap = np.zeros(tgt.shape[0])
        return {
            'src_xyz': src.astype('float32'),
            'tgt_xyz': tgt.astype('float32'),
            'tgt_raw': points.astype('float32'),
            'src_overlap': src_overlap.astype('float32'),
            'tgt_overlap': tgt_overlap.astype('float32'),
            'transform_gt': tsfm.astype('float32'),
            'pose_gt': np_mat2quat(tsfm.astype('float32')),
            'idx': np.asarray(index, dtype=np.int32),
        }


class IclNuim:
    """ICL-NUIM depth scans from the DeepGMR-provided h5 (reference
    realdata.py:138-196). Test split ships precomputed source/target/transform;
    train split self-pairs `points`."""

    overlap_thresh = 0.075      # reference realdata.py:186; see Scene7

    def __init__(self, root: str, n_points: int = 50000,
                 partial: List[float] = (0.7, 0.7), partition: str = 'test',
                 fix_tgt_overlap: bool = False,
                 compute_overlap: bool = True):
        import h5py
        d_path = os.path.join(root, 'icl_nuim', partition, 'icl_nuim.h5')
        with h5py.File(d_path, 'r') as f:
            if partition == 'test':
                self.source = f['source'][...]
                self.target = f['target'][...]
                self.transform = f['transform'][...]
            else:
                self.source = f['points'][...]
                self.target = None
                self.transform = None
        self.max_angle = 45.0 / 180 * np.pi
        self.max_trans = 0.5
        self.crop = RandomCropPair(p_keep=list(partial))
        self.n_points = n_points
        self.partial = list(partial)
        self.partition = partition
        self.fix_tgt_overlap = fix_tgt_overlap
        self.compute_overlap = compute_overlap   # see Scene7

    def __len__(self):
        return self.source.shape[0]

    def __getitem__(self, index: int):
        np.random.seed(index)       # reference realdata.py:160 (always seeded)
        if self.partition == 'test':
            tsfm0 = self.transform[index]
            src = self.source[index][:self.n_points]
            src = src @ tsfm0[:3, :3].T + tsfm0[:3, 3]
            tgt = self.target[index][:self.n_points]
        else:
            src = np.random.permutation(self.source[index])[:self.n_points]
            tgt = np.random.permutation(
                copy.deepcopy(self.source[index]))[:self.n_points]
        src, tgt = self.crop(src, tgt)
        n_sub = int(self.partial[0] * self.n_points)
        if src.shape[0] != n_sub:
            src = farthest_point_sample(src, n_sub)
        if tgt.shape[0] != n_sub:
            tgt = farthest_point_sample(tgt, n_sub)
        tsfm = random_pose(self.max_angle, self.max_trans)
        tgt = tgt @ tsfm[:3, :3].T + tsfm[:3, 3]
        if self.compute_overlap:
            src_overlap, tgt_overlap = overlap_labels(src, tgt, tsfm,
                                                      thresh=0.075)
            if not self.fix_tgt_overlap:
                tgt_overlap = src_overlap   # reference realdata.py:187
        else:
            src_overlap = np.zeros(src.shape[0])
            tgt_overlap = np.zeros(tgt.shape[0])
        return {
            'src_xyz': src.astype('float32'),
            'tgt_xyz': tgt.astype('float32'),
            'tgt_raw': self.source[index].astype('float32'),
            'src_overlap': src_overlap.astype('float32'),
            'tgt_overlap': tgt_overlap.astype('float32'),
            'transform_gt': tsfm.astype('float32'),
            'pose_gt': np_mat2quat(tsfm.astype('float32')),
            'idx': np.asarray(index, dtype=np.int32),
        }
