"""DGCNN edge-conv encoder, channel-last.

Reference: models/dgcnn.py:118-154. Five 1x1-conv stages over edge features
from a single kNN graph built on the raw xyz input; each stage is
Dense -> BN -> ReLU -> max over the k neighbour axis; the four stage outputs
concatenate (64+64+128+256 = 512) into a final Dense(emb_dims) -> BN -> ReLU.

TPU notes:
  * The kNN graph is one (B, N, N) distance matmul + top_k — MXU work; the
    graph is computed once on xyz and reused by all stages, exactly like the
    reference (models/dgcnn.py:135-137).
  * Edge tensors are (B, N, k, C) channel-last, so every stage is a Dense on
    the lane axis and the k-max is a VPU reduction — no transposes anywhere.
  * Stage convs carry no bias (reference Conv2d bias=False); BN supplies the
    shift.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ogmm_tpu.nn.layers import BN
from ogmm_tpu.ops.common import graph_feature, knn


class DGCNN(nn.Module):
    emb_dims: int = 512
    k: int = 20
    bn_axis_name: str | None = None
    dtype: str | None = None    # compute dtype for the conv stack; the kNN
                                # graph is built on fp32 xyz either way

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """x: (B, N, 3) points -> (B, N, emb_dims) features."""
        idx = knn(x, x, self.k)                      # one graph, reused
        e = graph_feature(x, self.k, idx=idx)        # (B, N, k, 6)
        if self.dtype is not None:
            e = e.astype(self.dtype)                 # halve edge-tensor HBM traffic

        def stage(e, ch):
            h = nn.Dense(ch, use_bias=False, dtype=self.dtype)(e)
            h = BN(self.bn_axis_name, self.dtype)(h, train)
            return nn.relu(h)

        h = stage(e, 64)
        x1 = h.max(axis=2)                           # (B, N, 64)
        h = stage(h, 64)
        x2 = h.max(axis=2)
        h = stage(h, 128)
        x3 = h.max(axis=2)
        h = stage(h, 256)
        x4 = h.max(axis=2)

        cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)   # (B, N, 512)
        out = nn.Dense(self.emb_dims, use_bias=False, dtype=self.dtype)(cat)
        out = BN(self.bn_axis_name, self.dtype)(out, train)
        return nn.relu(out)
