"""Host-side numpy utilities for the data pipeline (no torch, no Open3D).

Replaces reference datasets/datautils.py plus the Open3D label generation in
lib/o3dutils.py:96-135, 217-226: the GT overlap labels come from a scipy
cKDTree radius query — same radius-search semantics as Open3D's
KDTreeFlann.search_radius_vector_3d, running in the input pipeline where a
C++ KD-tree is the right tool (SURVEY.md §2.9).
"""
from __future__ import annotations

import glob
import os
from typing import List, Tuple

import numpy as np
from scipy.spatial import cKDTree

from ogmm_tpu import native


# --------------------------------------------------------------------------
# SE(3) numpy family (reference datasets/datautils.py:192-236, 425-460)
# --------------------------------------------------------------------------

def so3_transform(rot: np.ndarray, xyz: np.ndarray) -> np.ndarray:
    return np.einsum('...ij,...bj->...bi', rot, xyz)


def se3_transform(pose: np.ndarray, xyz: np.ndarray) -> np.ndarray:
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    return np.einsum('...ij,...bj->...bi', rot, xyz) + np.swapaxes(trans, -1, -2)


def se3_init(rot: np.ndarray, trans: np.ndarray) -> np.ndarray:
    return np.concatenate([rot, trans], axis=-1)


def se3_inv(pose: np.ndarray) -> np.ndarray:
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    irot = np.swapaxes(rot, -1, -2)
    return se3_init(irot, -irot @ trans)


def transform(g: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply ([B,] 3/4, 4) to ([B,] N, 3) — reference datautils.py:425-439."""
    rot = g[..., :3, :3]
    trans = g[..., :3, 3]
    return pts[..., :3] @ np.swapaxes(rot, -1, -2) + trans[..., None, :]


def to_tsfm(rot: np.ndarray, trans: np.ndarray) -> np.ndarray:
    tsfm = np.eye(4)
    tsfm[:3, :3] = rot
    tsfm[:3, 3] = trans.flatten()
    return tsfm


def identity() -> np.ndarray:
    """(3, 4) identity pose (reference datautils.py:421-422)."""
    return np.eye(3, 4)


def inverse(rot: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Inverse SE(3) from (rot ([B,] 3, 3), trans ([B,] 3)) as a ([B,] 3, 4)
    matrix [Rᵀ | -Rᵀt] (reference datautils.py:443-460)."""
    irot = np.swapaxes(rot, -1, -2)
    return np.concatenate([irot, irot @ -trans[..., None]], axis=-1)


def from_xyzquat(xyzquat: np.ndarray) -> np.ndarray:
    """SE3 4x4 from [x, y, z, qx, qy, qz, qw] (reference datautils.py:463-477).

    Preserves the reference's convention: the stored translation is the
    ROTATED negative offset (t = R @ -xyz), i.e. the 7-vector describes the
    inverse-style camera pose used by the trajectory files.
    """
    from scipy.spatial.transform import Rotation
    xyzquat = np.asarray(xyzquat, dtype=np.float64)
    rot = Rotation.from_quat(xyzquat[3:])
    trans = rot.apply(-xyzquat[:3])
    tsfm = np.concatenate([rot.as_matrix(), trans[:, None]], axis=1)
    return np.concatenate([tsfm, [[0.0, 0.0, 0.0, 1.0]]], axis=0)


def np_mat2quat(pose: np.ndarray) -> np.ndarray:
    """(3/4, 4) -> 7-vector [qw,qx,qy,qz,tx,ty,tz] (reference lib/se3.py:224-229)."""
    from scipy.spatial.transform import Rotation
    rot = pose[:3, :3]
    q = Rotation.from_matrix(rot).as_quat()          # (x, y, z, w)
    q = np.array([q[3], q[0], q[1], q[2]])           # -> (w, x, y, z)
    if q[0] < 0:
        q = -q
    return np.concatenate([q, pose[:3, 3]], axis=0).astype(np.float32)


# --------------------------------------------------------------------------
# Random pose sampling (reference datasets/transforms.py:240-274)
# --------------------------------------------------------------------------

def uniform2sphere(rng: np.random.RandomState | None = None):
    """Uniform direction on S^2 (reference datautils.py:93-114)."""
    r = rng if rng is not None else np.random
    phi = r.uniform(0.0, 2 * np.pi)
    cos_theta = r.uniform(-1.0, 1.0)
    theta = np.arccos(cos_theta)
    return np.stack([np.sin(theta) * np.cos(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(theta)], axis=-1)


def random_rotation(max_angle: float, rng=None) -> np.ndarray:
    r = rng if rng is not None else np.random
    axis = r.randn(3) if rng is not None else np.random.randn(3)
    axis /= np.linalg.norm(axis)
    angle = r.rand() * max_angle
    A = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * A + (1 - np.cos(angle)) * A @ A


def random_translation(max_dist: float, rng=None) -> np.ndarray:
    r = rng if rng is not None else np.random
    t = r.randn(3)
    t /= np.linalg.norm(t)
    t *= r.rand() * max_dist
    return t[:, None]


def random_pose(max_angle: float, max_trans: float, rng=None) -> np.ndarray:
    """(4, 4) random pose (reference transforms.py:240-243)."""
    R = random_rotation(max_angle, rng)
    t = random_translation(max_trans, rng)
    return np.concatenate([np.concatenate([R, t], 1), [[0, 0, 0, 1]]], 0)


def jitter_pcd(pcd: np.ndarray, sigma=0.01, clip=0.05, rng=None) -> np.ndarray:
    r = rng if rng is not None else np.random
    return pcd + np.clip(sigma * r.randn(*pcd.shape), -clip, clip)


# --------------------------------------------------------------------------
# Sampling / cropping (reference datautils.py:249-313)
# --------------------------------------------------------------------------

def farthest_point_sample(point: np.ndarray, npoint: int, is_idx=False,
                          rng=None):
    """Sequential FPS over one cloud, random start (reference datautils.py:249-272)."""
    r = rng if rng is not None else np.random
    N = point.shape[0]
    farthest = int(r.randint(0, N))  # one RNG draw either path (determinism)
    centroids = native.fps_indices(point, npoint, farthest)
    sampled = point[centroids]
    return (sampled, centroids.astype(np.int32)) if is_idx else sampled


class RandomCropPair:
    """Half-space crop of src/tgt clouds (reference datautils.py:275-313).

    Unlike transforms.RandomCrop this variant keeps no correspondence
    bookkeeping; used by ModelNetCP/DV/GMR and the real-data sets.
    """

    def __init__(self, p_keep: List[float] | None = None):
        self.p_keep = np.array([0.7, 0.7] if p_keep is None else p_keep,
                               dtype=np.float32)

    @staticmethod
    def crop(points: np.ndarray, p_keep: float, rng=None) -> np.ndarray:
        rand_xyz = uniform2sphere(rng)
        centered = points[:, :3] - points[:, :3].mean(axis=0)
        dist = centered @ rand_xyz
        if p_keep == 0.5:
            mask = dist > 0
        else:
            mask = dist > np.percentile(dist, (1.0 - p_keep) * 100)
        return points[mask]

    def __call__(self, src, tgt, seed=None):
        if np.all(self.p_keep == 1.0):
            return src, tgt
        if seed is not None:
            np.random.seed(seed)
        src = self.crop(src, float(self.p_keep[0]))
        if len(self.p_keep) > 1:
            tgt = self.crop(tgt, float(self.p_keep[1]))
        return src, tgt


# --------------------------------------------------------------------------
# Overlap labels — scipy KD-tree replaces Open3D (lib/o3dutils.py:217-226)
# --------------------------------------------------------------------------

def overlap_labels(src: np.ndarray, tgt: np.ndarray, transf: np.ndarray,
                   thresh: float = 0.05) -> Tuple[np.ndarray, np.ndarray]:
    """GT overlap masks: a point overlaps if any point of the other (GT-
    aligned) cloud lies within `thresh`. Matches the reference's KD-tree
    radius search semantics (lib/o3dutils.py:123-135, 217-226)."""
    src_t = transform(transf, src[:, :3])
    src_label, tgt_label = native.radius_overlap(src_t, tgt, thresh)
    return src_label.astype(np.float64), tgt_label.astype(np.float64)


def nearest_neighbor(src: np.ndarray, dst: np.ndarray):
    """1-NN (reference datautils.py:23-39 uses sklearn KD-trees)."""
    distances, indices = native.nearest_neighbor(src, dst)
    return distances, indices


def get_inner_labels(src: np.ndarray, tgt: np.ndarray, transf: np.ndarray,
                     thresh: float = 0.05, label_type: int = 3):
    """GT correspondence permutation matrix + per-point inlier flags.

    Reference: datasets/datautils.py:42-90. Three label regimes:
      1 — mutual-NN pairs within thresh only;
      2 — all NN pairs within thresh, filled from both sides;
      3 — mutual pairs, then greedy one-to-one fill of still-unmatched
          rows/cols (fill ORDER matters: an earlier row claiming a column
          blocks later rows — preserved here with incremental row/col
          occupancy flags instead of re-summing the matrix), then a second
          mutual-NN pass among leftover outliers at 2x thresh.

    Returns (perm_mat (N, M), inlier_src (N, 1), inlier_tgt (M, 1)).
    """
    n, m = src.shape[0], tgt.shape[0]
    perm = np.zeros((n, m))
    src_t = transform(transf, src[:, :3])
    tgt_p = tgt[:, :3]
    d_se, i_se = nearest_neighbor(src_t, tgt_p)     # src -> tgt
    d_te, i_te = nearest_neighbor(tgt_p, src_t)     # tgt -> src
    mutual = (i_te[i_se] == np.arange(n)) & (d_se < thresh)

    if label_type == 1:
        perm[np.flatnonzero(mutual), i_se[mutual]] = 1
    elif label_type == 2:
        row_ok = d_se < thresh
        perm[np.flatnonzero(row_ok), i_se[row_ok]] = 1
        col_ok = d_te < thresh
        perm[i_te[col_ok], np.flatnonzero(col_ok)] = 1
    elif label_type == 3:
        perm[np.flatnonzero(mutual), i_se[mutual]] = 1
        row_used = perm.sum(axis=1) > 0
        col_used = perm.sum(axis=0) > 0
        for r in np.flatnonzero(~row_used & (d_se < thresh)):
            c = i_se[r]
            if not col_used[c]:
                perm[r, c] = 1
                row_used[r] = col_used[c] = True
        for c in np.flatnonzero(~col_used & (d_te < thresh)):
            r = i_te[c]
            if not row_used[r]:
                perm[r, c] = 1
                row_used[r] = col_used[c] = True
        out_r = np.flatnonzero(~row_used)
        out_c = np.flatnonzero(~col_used)
        if out_r.size and out_c.size:
            d_se2, i_se2 = nearest_neighbor(src_t[out_r], tgt_p[out_c])
            _, i_te2 = nearest_neighbor(tgt_p[out_c], src_t[out_r])
            mut2 = (i_te2[i_se2] == np.arange(out_r.size)) & (d_se2 < 2 * thresh)
            perm[out_r[mut2], out_c[i_se2[mut2]]] = 1
    else:
        raise ValueError(f"label_type must be 1/2/3, got {label_type}")

    inlier_src = (perm.sum(axis=1, keepdims=True) > 0).astype(np.float64)
    inlier_tgt = (perm.sum(axis=0, keepdims=True).T > 0).astype(np.float64)
    return perm, inlier_src, inlier_tgt


def mutual_selection(score_mat: np.ndarray) -> np.ndarray:
    """Boolean mask of entries that are the argmax of BOTH their row and
    their column (reference datasets/datautils.py:316-340, minus the
    torch->numpy hop — this pipeline is numpy-native)."""
    score_mat = np.asarray(score_mat)
    if score_mat.ndim == 2:
        # the reference keeps the added batch dim on 2-D input — match it
        score_mat = score_mat[None]
    rows = np.zeros_like(score_mat, dtype=bool)
    cols = np.zeros_like(score_mat, dtype=bool)
    np.put_along_axis(rows, score_mat.argmax(axis=2)[..., None], True, axis=2)
    np.put_along_axis(cols, score_mat.argmax(axis=1)[:, None, :], True, axis=1)
    return rows & cols


# --------------------------------------------------------------------------
# RRI rotation-invariant features (reference datautils.py:162-189)
# --------------------------------------------------------------------------

def knn_idx(pts: np.ndarray, k: int) -> np.ndarray:
    """Each point's k nearest neighbours, self excluded, via the host-side
    cKDTree this data layer already uses for overlap labels. (N,) -> (N, k)."""
    _, nbr = cKDTree(pts).query(pts, k=k + 1)
    return nbr[:, 1:]                 # column 0 is the query point itself


def get_rri(pts: np.ndarray, k: int) -> np.ndarray:
    """Rotation-invariant relative-position features, (N, 3) -> (N, 4k).

    Per point p with neighbours q_1..q_k, emits [|p|, |q_j|, theta_j, phi_j]
    where theta_j is the p/q_j angle and phi_j the azimuthal gap from q_j to
    its nearest other neighbour around the p axis — all invariant under a
    global rotation. Numerically equivalent to the reference
    (datasets/datautils.py:168-189, consumed only by ModelNetGMR; parity
    tested against the reference in tests/test_reference_parity.py),
    including its transverse-component convention t_j = q_j - cos(theta_j) p
    (the full vector p, not the unit projection).
    """
    nbrs = pts[knn_idx(pts, k)]                          # (N, k, 3)
    r_p = np.linalg.norm(pts, axis=-1)                   # (N,)
    r_q = np.linalg.norm(nbrs, axis=-1)                  # (N, k)
    p_hat = pts / r_p[:, None]
    q_hat = nbrs / r_q[..., None]
    cos_theta = np.clip(np.einsum('nkc,nc->nk', q_hat, p_hat), -1.0, 1.0)
    theta = np.arccos(cos_theta)

    # azimuth of neighbour a seen from neighbour b around p_hat, from the
    # transverse components: psi_ab = atan2(p_hat . (t_b x t_a), t_b . t_a)
    # wrapped to [0, 2pi)
    t = nbrs - cos_theta[..., None] * pts[:, None, :]    # (N, k, 3)
    sin_psi = np.einsum('nabc,nc->nab',
                        np.cross(t[:, None, :, :], t[:, :, None, :]), p_hat)
    cos_psi = np.einsum('nac,nbc->nab', t, t)
    psi = np.arctan2(sin_psi, cos_psi) % (2.0 * np.pi)
    # psi[a, a] == 0 by construction, so the gap to the azimuthally nearest
    # OTHER neighbour is each row's second-smallest entry
    phi = np.partition(psi, 1, axis=-1)[:, :, 1]

    feats = np.stack([np.broadcast_to(r_p[:, None], r_q.shape),
                      r_q, theta, phi], axis=-1)         # (N, k, 4)
    return feats.reshape(len(pts), 4 * k)


# --------------------------------------------------------------------------
# ModelNet40 HDF5 loading (reference datautils.py:146-159)
# --------------------------------------------------------------------------

def load_modelnet_h5(partition: str, root: str):
    """Load ply_data_{train,test}*.h5 -> (data (S, 2048, 6) xyz+normals, labels)."""
    import h5py
    all_data, all_label = [], []
    pattern = os.path.join(root, 'modelnet40_ply_hdf5_2048',
                           f'ply_data_{partition}*.h5')
    for h5_name in sorted(glob.glob(pattern)):
        with h5py.File(h5_name, 'r') as f:
            data = np.concatenate([f['data'][:], f['normal'][:]],
                                  axis=-1).astype('float32')
            label = f['label'][:].astype('int64')
        all_data.append(data)
        all_label.append(label)
    if not all_data:
        raise FileNotFoundError(f"no ModelNet40 h5 files under {pattern}")
    return np.concatenate(all_data, 0), np.concatenate(all_label, 0)


def read_txt(path: str):
    with open(path) as f:
        return [x.strip() for x in f.readlines()]


# --------------------------------------------------------------------------
# File-listing helpers (reference datautils.py:352-394)
# --------------------------------------------------------------------------

def ensure_dir(path: str) -> None:
    os.makedirs(path, mode=0o755, exist_ok=True)


def sorted_alphanum(file_list):
    """Sort treating digit runs numerically: frame-2 < frame-10."""
    import re

    def alphanum_key(key):
        return [int(c) if c.isdigit() else c
                for c in re.split(r'([0-9]+)', key)]

    return sorted(file_list, key=alphanum_key)


def get_file_list(path: str, extension: str | None = None):
    names = [f for f in os.listdir(path)
             if os.path.isfile(os.path.join(path, f))]
    if extension is not None:
        names = [f for f in names if os.path.splitext(f)[1] == extension]
    return sorted_alphanum([os.path.join(path, f) for f in names])


def get_file_list_specific(path: str, color_depth: str,
                           extension: str | None = None):
    """Files whose name contains `color_depth` with the given extension.
    Reference quirk kept: with extension=None the list is returned
    UNSORTED and unfiltered (datautils.py:377-386)."""
    names = [f for f in os.listdir(path)
             if os.path.isfile(os.path.join(path, f))]
    if extension is None:
        return [os.path.join(path, f) for f in names]
    names = [f for f in names
             if color_depth in f and os.path.splitext(f)[1] == extension]
    return sorted_alphanum([os.path.join(path, f) for f in names])


def get_folder_list(path: str):
    return sorted_alphanum([os.path.join(path, f) for f in os.listdir(path)
                            if os.path.isdir(os.path.join(path, f))])


def read_trajectory(filename: str, dim: int = 4):
    """3DMatch/Redwood trajectory reader (reference datautils.py:397-418)."""
    traj = []
    with open(filename, 'r') as f:
        metastr = f.readline()
        while metastr:
            metadata = list(map(int, metastr.split()))
            mat = np.zeros((dim, dim))
            for i in range(dim):
                mat[i, :] = np.fromstring(f.readline(), dtype=float, sep=' \t')
            traj.append((metadata, mat))
            metastr = f.readline()
    return traj


def write_trajectory(traj: np.ndarray, metadata: np.ndarray, filename: str,
                     dim: int = 4):
    """3DMatch/Redwood trajectory writer (reference datautils.py:124-143)."""
    with open(filename, 'w') as f:
        for idx in range(traj.shape[0]):
            if metadata[idx][2]:
                p = traj[idx].tolist()
                f.write('\t'.join(map(str, metadata[idx])) + '\n')
                f.write('\n'.join(
                    '\t'.join(map('{0:.12f}'.format, p[i])) for i in range(dim)))
                f.write('\n')
