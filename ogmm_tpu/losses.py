"""Loss functions — pure jnp, jit-safe, channel-last.

Reference: lib/loss.py. The reference wraps the composite loss in try/except
(train.py:68-74); exceptions cannot cross jit, so callers use
`composite_loss` which masks non-finite terms explicitly instead — the honest
jit equivalent of the reference's silent fallback.

Known reference quirk preserved: `get_weighted_bce_loss` is actually MSE
(lib/loss.py:137-138) — kept as `overlap_loss` with identical math.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ogmm_tpu.core import se3
from ogmm_tpu.ops.common import l2_normalize, square_distance
from ogmm_tpu.ops.gmm import get_local_corrs, gmm_params
from ogmm_tpu.ops.sinkhorn import contrastsk


def dcp_loss(rot_pred, rot_gt, trans_pred, trans_gt):
    """MSE(R_pred^T R_gt, I) + MSE(t_pred, t_gt). Reference: lib/loss.py:121-126."""
    B = rot_pred.shape[0]
    trans_pred = trans_pred.reshape(B, 3)
    trans_gt = trans_gt.reshape(B, 3)
    eye = jnp.eye(3, dtype=rot_pred.dtype)
    rr = jnp.matmul(jnp.swapaxes(rot_pred, -1, -2), rot_gt,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.mean((rr - eye) ** 2) + jnp.mean((trans_pred - trans_gt) ** 2)


def _offdiag_index(n: int) -> np.ndarray:
    """(n, n-1) column indices of the off-diagonal entries of each row."""
    cols = np.arange(n - 1)[None, :].repeat(n, axis=0)
    cols = cols + (cols >= np.arange(n)[:, None])
    return cols.astype(np.int32)


@partial(jax.jit, static_argnames=("normalize",))
def con_loss(x: jnp.ndarray, y: jnp.ndarray, tau: float = 0.01,
             normalize: bool = True) -> jnp.ndarray:
    """NT-Xent contrastive loss between paired sets x, y (B, n, d).

    Positives are the diagonal (x_i, y_i) pairs; negatives the off-diagonal
    entries of the xx/xy/yx/yy similarity blocks. Reference: lib/loss.py:16-57
    (`ConLoss`): logits = [pos | negs] over 2n-1 classes, labels all zero.
    """
    B, n, _ = x.shape
    if normalize:
        x = l2_normalize(x)
        y = l2_normalize(y)
    s_xy = jnp.einsum('bmd,bnd->bmn', x, y) / tau
    s_yx = jnp.swapaxes(s_xy, -1, -2)
    s_xx = jnp.einsum('bmd,bnd->bmn', x, x) / tau
    s_yy = jnp.einsum('bmd,bnd->bmn', y, y) / tau

    off = jnp.asarray(_offdiag_index(n))                  # (n, n-1)
    take = lambda s: jnp.take_along_axis(s, off[None], axis=-1)  # (B, n, n-1)
    diag = lambda s: jnp.diagonal(s, axis1=-2, axis2=-1)  # (B, n)

    pos = jnp.concatenate([diag(s_xy), diag(s_yx)], axis=1)[..., None]  # (B,2n,1)
    neg_x = jnp.concatenate([take(s_xx), take(s_xy)], axis=-1)          # (B,n,2n-2)
    neg_y = jnp.concatenate([take(s_yx), take(s_yy)], axis=-1)
    neg = jnp.concatenate([neg_x, neg_y], axis=1)                       # (B,2n,2n-2)
    logits = jnp.concatenate([pos, neg], axis=-1)                       # (B,2n,2n-1)
    # cross-entropy with label 0 == -log_softmax[..., 0]
    return jnp.mean(jax.nn.logsumexp(logits, axis=-1) - logits[..., 0])


def clu_loss(xyz, node_xyz, feats, gamma, tau: float = 0.1,
             axis_name: str | None = None):
    """Clustering contrastive loss. Reference: lib/loss.py:109-118 (`CluLoss`).

    Positives: gamma-weighted mean features per cluster vs the features of the
    point nearest each cluster mean. All inputs channel-last:
    xyz (B,N,3), node_xyz (B,K,3), feats (B,N,C), gamma (B,N,K).

    `axis_name`: xyz/feats/gamma carry a point shard (parallel/sp.py) —
    both K-level feature sets assemble via psum/argmin-combine and the
    K x K contrastive loss itself is replicated.
    """
    feats_pos = gmm_params(gamma, feats, axis_name=axis_name)[1]  # (B, K, C)
    feats_anchor = get_local_corrs(xyz, node_xyz, feats,
                                   axis_name=axis_name)           # (B, K, C)
    return con_loss(feats_anchor, feats_pos, tau=tau)


def km_loss(pts, log_gamma, prob=None, top_k: int = 256):
    """Sinkhorn-target cross-entropy clustering loss.

    Reference: lib/loss.py:60-80 (`KMLoss`; defined but unused on the main
    path — kept for component parity). pts (B,N,D), log_gamma (B,N,K).
    """
    if prob is not None:
        ids = jax.lax.top_k(prob, top_k)[1]               # (B, top_k)
        log_score = jnp.take_along_axis(log_gamma, ids[..., None], axis=1)
        pts = jnp.take_along_axis(pts, ids[..., None], axis=1)
        score = jax.nn.softmax(log_score, axis=-1)
    else:
        log_score = log_gamma
        score = jax.nn.softmax(log_gamma, axis=-1)
    pi, mu = gmm_params(score, pts)
    assign = contrastsk(pts, mu, p=pi, max_iter=25, dst='eu')[0]
    assign = assign / jnp.maximum(assign.sum(axis=-1, keepdims=True), 1e-4)
    assign = jax.lax.stop_gradient(assign)
    return jnp.mean(jnp.sum(-assign * jax.nn.log_softmax(log_score, axis=-1),
                            axis=1))


def welsch_loss(src, tgt, tsfm, src_o=None, tgt_o=None,
                alpha: float = 1.0, top_k: int = 256):
    """Robust bidirectional NN distance over top-k-overlap points.

    Reference: lib/loss.py:83-106 (`WelschLoss`). src/tgt (B,N,3) channel-last,
    tsfm (B,3/4,4) applied to src.
    """
    src = se3.transform(tsfm, src)
    top_k = min(top_k, src.shape[1], tgt.shape[1])   # static-shape cap
    if src_o is not None and tgt_o is not None:
        src_ids = jax.lax.top_k(src_o, top_k)[1]
        src_corr = jnp.take_along_axis(src, src_ids[..., None], axis=1)
        tgt_ids = jax.lax.top_k(tgt_o, top_k)[1]
        tgt_corr = jnp.take_along_axis(tgt, tgt_ids[..., None], axis=1)
    else:
        src_corr, tgt_corr = src, tgt
    a2 = alpha * alpha
    from ogmm_tpu.ops import common as _common
    from ogmm_tpu.ops.dispatch import use_pallas as _auto
    if (_auto() or src.shape[0] * src.shape[1] * tgt.shape[1]
            > _common._DENSE_ELEMS):
        # 1-NN (fused / M-streamed kernel or chunked jnp, ops/common.py:nn1)
        # for the index, distance recomputed differentiably: the value AND
        # gradient equal min-over-matrix (the min picks the NN and
        # grad-through-min flows into exactly that pair), without the
        # (B, top_k, N) matrix or its backward pass
        from ogmm_tpu.ops.common import nn1
        sg = jax.lax.stop_gradient
        i1 = nn1(sg(src_corr), sg(tgt))[1]
        z1sq = jnp.sum((src_corr - jnp.take_along_axis(
            tgt, i1[..., None], axis=1)) ** 2, axis=-1)
        i2 = nn1(sg(tgt_corr), sg(src))[1]
        z2sq = jnp.sum((tgt_corr - jnp.take_along_axis(
            src, i2[..., None], axis=1)) ** 2, axis=-1)
    else:
        z1sq = jnp.min(square_distance(src_corr, tgt), axis=-1)   # |cdist|^2
        z2sq = jnp.min(square_distance(tgt_corr, src), axis=-1)
    loss = (2.0 - jnp.exp(-0.5 * z1sq / a2) - jnp.exp(-0.5 * z2sq / a2)).sum(axis=1)
    return loss.mean()


def overlap_labels_device(src, tgt, rot_gt, trans_gt, thresh: float = 0.05):
    """GT overlap masks computed ON DEVICE inside the jitted step.

    Same definition as the host pipeline (data/datautils.py:overlap_labels,
    reference lib/o3dutils.py:217-226): a point overlaps iff any point of
    the GT-aligned other cloud lies within `thresh` (d2 <= thresh^2 — the
    grid hash's comparison, native/host_ops.cc:102). min-distance via
    ops.common.nn1_both: fp32 HIGHEST geometry, streamed kernels at indoor
    scale — ~2 kernel sweeps (~10s of ms at N=35k) where the host KD-tree
    labels cost more wall time than the entire device step on the 1-core
    host (the r3d indoor run was data-bound at 36 s/epoch for 30 steps).

    Returns (src_overlap (B, N), tgt_overlap (B, M)) f32 in {0, 1}. NB the
    reference's realdata sets emit tgt_overlap = src_overlap (the quirk,
    reference realdata.py:127) — that substitution is the CALLER's choice
    (train/trainer.py mirrors it when device_overlap is on), this function
    returns the true labels for both sides.
    """
    from ogmm_tpu.ops.common import nn1_both
    src_t = se3.rotate(rot_gt, src.astype(jnp.float32)) + \
        trans_gt[:, None, :].astype(jnp.float32)
    d_s, d_t = nn1_both(src_t, tgt.astype(jnp.float32))
    th2 = jnp.float32(thresh * thresh)
    return ((d_s <= th2).astype(jnp.float32),
            (d_t <= th2).astype(jnp.float32))


def overlap_loss(prediction, gt):
    """Overlap-score supervision. The reference names this BCE but computes
    MSE (lib/loss.py:137-138) — behaviour preserved."""
    return jnp.mean((prediction - gt) ** 2)


def composite_loss(rot, trans, clu, src_o, tgt_o, rot_gt, trans_gt,
                   src_overlap, tgt_overlap, src, tgt, *,
                   w_dcp=10.0, w_clu=1.0, w_overlap=1.0, w_welsch=0.01,
                   welsch_alpha=10.0, welsch_topk=512):
    """The train.py:69-71 composition, with finiteness masking replacing the
    reference's try/except-fallback-to-dcp (train.py:68-74)."""
    base = w_dcp * dcp_loss(rot, rot_gt, trans, trans_gt)
    o_pred = jnp.concatenate([src_o, tgt_o], axis=-1)
    o_gt = jnp.concatenate([src_overlap, tgt_overlap], axis=-1)
    o_pred = jnp.maximum(jnp.nan_to_num(o_pred), 0.0)
    o_gt = jnp.maximum(jnp.nan_to_num(o_gt), 0.0)
    tsfm = se3.integrate(rot, trans)
    extra = (w_clu * clu + w_overlap * overlap_loss(o_pred, o_gt)
             + w_welsch * welsch_loss(src, tgt, tsfm, src_overlap, tgt_overlap,
                                      alpha=welsch_alpha, top_k=welsch_topk))
    extra = jnp.where(jnp.isfinite(extra), extra, 0.0)
    return jnp.nan_to_num(base + extra)
