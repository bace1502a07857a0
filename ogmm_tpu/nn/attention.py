"""Geometric position encoding + anchor-conditioned transformer blocks.

Reference: models/attn.py. Channel-last throughout; every 1x1 conv is a Dense
on the lane axis, attention score/apply einsums are MXU contractions over the
(N x M<=1024) score block.

Head layout note: torch's `view(B, d_head, H, N)` (models/attn.py:96) splits
channels with head-strided interleaving; we use the standard contiguous
(B, N, H, d_head) split. For freshly-initialised weights these differ only by
a fixed channel permutation absorbed into the learned projections — documented
divergence (we never load torch checkpoints).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ogmm_tpu.nn.layers import BN, PointMLP
from ogmm_tpu.ops.common import knn, gather_neighbors, posenc_alpha


class PositionEncoding(nn.Module):
    """Distance-to-centroid + neighbour-angle geometric embedding.

    Reference: models/attn.py:30-75. Two branches over (B, N, 3) points:
      dist:  |p - centroid|^2 -> Dense(64) -> Dense(dim/2)
      angle: cos(angle(p->neighbour_j, p->centroid)) over k neighbours
             -> Dense(64) -> max over k -> Dense(dim/2)
    concatenated to (B, N, dim). (The reference defines a final fuse conv but
    never applies it, models/attn.py:53-57 vs 74-75 — we match the applied
    graph.) All convs bias-free + BN + LeakyReLU(0.2).
    """
    dim: int
    bn_axis_name: str | None = None
    dtype: str | None = None    # compute dtype for the conv stack; the
                                # geometry (kNN, angles) stays fp32

    @nn.compact
    def __call__(self, points: jnp.ndarray, k: int = 5, train: bool = True,
                 nbr_idx: jnp.ndarray | None = None,
                 centroid: jnp.ndarray | None = None,
                 nbr_pts: jnp.ndarray | None = None,
                 alpha: jnp.ndarray | None = None):
        """points (B, N, 3) -> (B, N, dim).

        Point-sharded forwards (parallel/sp.py) call this on a device-local
        chunk: `centroid` then carries the FULL cloud's centroid (B, 1, 3)
        and `nbr_pts` the full replicated cloud the global `nbr_idx` gathers
        from; both default to single-device semantics.

        `alpha` (B, N, k) optionally supplies the angle features directly
        (the fused DGCNN eval kernel emits them from the same neighbour
        selection — nn/dgcnn.py `with_posenc_alpha`), skipping both angle
        branches below.
        """
        B, N, _ = points.shape
        if centroid is None:
            centroid = points.mean(axis=1, keepdims=True)    # (B, 1, 3)
        p2gc = points - centroid                             # (B, N, 3)
        g_dis = (p2gc ** 2).sum(axis=-1, keepdims=True)      # (B, N, 1)
        if self.dtype is not None:
            g_dis = g_dis.astype(self.dtype)

        h = nn.Dense(64, use_bias=False, dtype=self.dtype)(g_dis)
        h = nn.leaky_relu(BN(self.bn_axis_name, self.dtype)(h, train), 0.2)
        h = nn.Dense(self.dim // 2, use_bias=False, dtype=self.dtype)(h)
        dis_feature = nn.leaky_relu(BN(self.bn_axis_name, self.dtype)(h, train), 0.2)

        from ogmm_tpu.ops.dispatch import use_pallas
        if alpha is not None:
            alpha = alpha[..., None]                         # (B, N, k, 1)
        elif nbr_idx is None and use_pallas() and N <= 1024:
            # fused kNN + gather + normalised-dot (ops/pallas_knn.py);
            # neighbour ORDER may differ from the jnp path only at exact
            # distance ties — the angle features are maxed over k below
            from ogmm_tpu.ops.pallas_knn import posenc_angles_pallas
            alpha = posenc_angles_pallas(points, k)[..., None]  # (B,N,k,1)
        else:
            # nbr_idx: shared graph from the caller (a prefix of DGCNN's
            # k=20 graph — identical to a fresh kNN since both sort
            # ascending with stable ties; kills the second selection sweep
            # that dominated the indoor profile, profiles/r3)
            idx = nbr_idx if nbr_idx is not None else knn(points, points, k)
            src = nbr_pts if nbr_pts is not None else points
            alpha = posenc_alpha(points, gather_neighbors(src, idx),
                                 centroid)[..., None]          # (B, N, k, 1)
        if self.dtype is not None:
            alpha = alpha.astype(self.dtype)
        a = nn.Dense(64, use_bias=False, dtype=self.dtype)(alpha)
        a = nn.leaky_relu(BN(self.bn_axis_name, self.dtype)(a, train), 0.2)
        a = a.max(axis=2)                                    # (B, N, 64)
        a = nn.Dense(self.dim // 2, use_bias=False, dtype=self.dtype)(a)
        ang_feature = nn.leaky_relu(BN(self.bn_axis_name, self.dtype)(a, train), 0.2)

        return jnp.concatenate([dis_feature, ang_feature], axis=-1)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Scaled dot-product attention, (B, N, H, Dh) x (B, M, H, Dh).

    Reference: models/attn.py:78-82 (scale = sqrt(d_head)).
    """
    dh = q.shape[-1]
    scores = jnp.einsum('bnhd,bmhd->bhnm', q, k,
                        preferred_element_type=jnp.float32) / (dh ** 0.5)
    prob = nn.softmax(scores, axis=-1)     # softmax always in fp32
    return jnp.einsum('bhnm,bmhd->bnhd', prob.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


class MultiHeadAttention(nn.Module):
    """Reference: models/attn.py:85-99 (Conv1d projections -> Dense here)."""
    num_heads: int
    d_model: int
    dtype: str | None = None

    @nn.compact
    def __call__(self, query, key, value):
        assert self.d_model % self.num_heads == 0
        dh = self.d_model // self.num_heads
        B, N, _ = query.shape
        M = key.shape[1]
        q = nn.Dense(self.d_model, dtype=self.dtype)(query).reshape(B, N, self.num_heads, dh)
        k = nn.Dense(self.d_model, dtype=self.dtype)(key).reshape(B, M, self.num_heads, dh)
        v = nn.Dense(self.d_model, dtype=self.dtype)(value).reshape(B, M, self.num_heads, dh)
        x = attention(q, k, v).reshape(B, N, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype)(x)   # merge


class TransformerBlock(nn.Module):
    """Cross-attention + MLP-on-concat message passing.

    Reference: models/attn.py:102-111 — message = MHA(src, tgt, tgt);
    out = MLP([2d -> 2d -> d])(concat[src, message]). Residuals are added by
    the caller (models/gmmreg.py:62-63, 71-72, 96-97).
    """
    feature_dim: int
    num_heads: int
    dtype: str | None = None
    # mesh axis sharding the POINT (query) dimension (parallel/sp.py). The
    # attention itself is already shard-local (queries local, anchor
    # keys/values replicated); only the PointMLP's InstanceNorm moments
    # need the cross-shard psum.
    sp_axis: str | None = None

    @nn.compact
    def __call__(self, src, tgt, train: bool = True):
        message = MultiHeadAttention(self.num_heads, self.feature_dim,
                                     self.dtype)(src, tgt, tgt)
        return PointMLP((self.feature_dim * 2, self.feature_dim), self.dtype,
                        sp_axis=self.sp_axis)(
            jnp.concatenate([src, message], axis=-1), train=train)
