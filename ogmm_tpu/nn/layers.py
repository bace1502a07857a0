"""Shared point-wise layers (channel-last, TPU lane-friendly).

The reference builds everything from 1x1 Conv1d/Conv2d + BatchNorm + ReLU
(models/dgcnn.py:16-38 `CONV`, models/attn.py:17-27 `MLP`). A 1x1 conv over a
channel-first (B, C, N) tensor is exactly a Dense layer over a channel-last
(B, N, C) tensor — which is the layout the MXU wants (features on the
128-lane axis). So here every "conv" is flax `nn.Dense` and the batch/point
axes are whatever leading shape the input carries.

BatchNorm: torch semantics (eps=1e-5, momentum 0.1 => flax momentum 0.9),
normalising over all axes but the feature axis — identical statistics to the
reference's BN1d/BN2d in these layouts. An optional `bn_axis_name` turns on
cross-replica sync-BN under shard_map (the reference's DataParallel uses
per-replica stats; None reproduces that).

InstanceNorm1d (torch affine=False default, models/attn.py:24): per-sample
per-channel normalisation over the point axis — implemented inline, no state.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BN(nn.Module):
    """torch-semantics BatchNorm over the trailing feature axis."""
    axis_name: str | None = None
    dtype: str | None = None      # compute dtype; params/stats stay fp32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  axis_name: str | None = None) -> jnp.ndarray:
    """torch InstanceNorm1d (affine=False) for (B, N, C): normalise over N.

    Moments accumulate in fp32 regardless of the compute dtype (bf16 mean/var
    over 717 points loses too many bits).

    `axis_name`: when the POINT axis is sharded over a mesh axis
    (parallel/sp.py), the per-cloud moments must cover all shards — one
    fused psum of (sum, sumsq, count) keeps the statistics identical to the
    unsharded forward."""
    x32 = x.astype(jnp.float32)
    if axis_name is None:
        mean = x32.mean(axis=-2, keepdims=True)
        var = x32.var(axis=-2, keepdims=True)
    else:
        # Two-pass (mean first, then centred sum of squares): exact parity
        # with the unsharded jnp.var path even for large-mean activations —
        # the single-pass E[x^2]-E[x]^2 form cancels catastrophically there.
        n = jnp.asarray(x.shape[-2], jnp.float32)
        s, n = jax.lax.psum((x32.sum(axis=-2, keepdims=True), n), axis_name)
        mean = s / n
        d = x32 - mean
        var = jax.lax.psum((d * d).sum(axis=-2, keepdims=True), axis_name) / n
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class ConvHead(nn.Module):
    """Projection / overlap / fusion head — reference `CONV` (models/dgcnn.py:16-38).

    used='proj': Dense(h)+BN+ReLU -> Dense(h)+BN+ReLU -> Dense(out)
    else:        Dense(h)+BN+ReLU -> Dense(out)
    """
    out_size: int
    hidden_size: int
    deep: bool = True           # reference `used == 'proj'`
    bn_axis_name: str | None = None
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.hidden_size, dtype=self.dtype)(x)
        x = BN(self.bn_axis_name, self.dtype)(x, train)
        x = nn.relu(x)
        if self.deep:
            x = nn.Dense(self.hidden_size, dtype=self.dtype)(x)
            x = BN(self.bn_axis_name, self.dtype)(x, train)
            x = nn.relu(x)
        return nn.Dense(self.out_size, dtype=self.dtype)(x)


class PointMLP(nn.Module):
    """Dense + InstanceNorm + ReLU stack — reference `MLP` (models/attn.py:17-27).

    InstanceNorm+ReLU on every layer but the last; final bias initialised to 0
    (reference models/attn.py:107).

    Setup-style with `Dense_{i}` attribute names so the parameter tree is
    identical to the previous nn.compact auto-naming (checkpoints and the
    torch importer, compat.py, are unaffected): at eval on TPU the 2-layer
    case dispatches to the fused Dense+IN+relu+Dense kernel
    (ops/pallas_mlp.py) reading the SAME Dense parameters.
    """
    channels: Sequence[int]
    dtype: str | None = None
    # mesh axis sharding the POINT dimension (parallel/sp.py): InstanceNorm
    # moments psum across shards; None = single-device semantics.
    sp_axis: str | None = None

    def setup(self):
        for i, ch in enumerate(self.channels):
            setattr(self, f'Dense_{i}', nn.Dense(ch, dtype=self.dtype))

    # chip A/B 2026-08-17: the fused kernel ties XLA's composition (0.73 vs
    # 0.70 ms at B=48) — XLA already pipelines this chain well. Kept opt-in
    # for the record; parity test in tests/test_models.py.
    fuse_eval: bool = False

    def __call__(self, x, train: bool = True):
        n = len(self.channels)
        layers = [getattr(self, f'Dense_{i}') for i in range(n)]
        fused = (self.fuse_eval and not train and n == 2
                 and not self.is_initializing() and self.sp_axis is None
                 and x.ndim == 3 and x.shape[1] <= 1024)
        if fused:
            from ogmm_tpu.ops.dispatch import use_pallas
            fused = use_pallas()
        if fused:
            from ogmm_tpu.ops.pallas_mlp import pointmlp_eval_pallas
            v1 = layers[0].variables['params']
            v2 = layers[1].variables['params']
            dt = jnp.dtype(self.dtype) if self.dtype else jnp.float32
            return pointmlp_eval_pallas(x.astype(dt), v1['kernel'],
                                        v1['bias'], v2['kernel'], v2['bias'],
                                        dtype=dt)
        for i, layer in enumerate(layers):
            x = layer(x)
            if i < n - 1:
                x = instance_norm(x, axis_name=self.sp_axis)
                x = nn.relu(x)
        return x
