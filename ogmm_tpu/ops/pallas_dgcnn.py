"""Fully-fused DGCNN edge-conv forward (eval mode) as one Pallas kernel.

The DGCNN encoder (reference models/dgcnn.py:118-154) builds one kNN graph,
materialises a (B, N, k, C) edge tensor, and chains four 1x1-conv stages over
it with a max over k after each — composed in XLA that is >500 MB of HBM
round-trips per cloud (the largest cost in the forward pass: ~5.8 ms/cloud
at B=24, N=717, k=20 even with the Pallas kNN).

This kernel fuses everything per 128-query tile: the (TN, N) distance block,
k passes of (argmin -> one-hot gather -> stage1..4 matmuls -> running max),
and the final Dense(512) — all VMEM-resident. The edge tensor never exists;
HBM traffic is xyz in, (B, N, 512) features out.

Eval-only: BatchNorm folds into per-channel (scale, bias) from running
stats, so this path is valid when `train=False` (the training path keeps the
jnp composition, whose BN batch-stats and autodiff XLA handles). No VJP is
defined — do not differentiate through it.

Neighbour ordering matches ops/pallas_knn.py (ascending distance, first-index
ties). Stage matmuls run in the model's compute dtype (bf16) with fp32
accumulation; the distance block is fp32 HIGHEST like everywhere else.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _dgcnn_kernel(xt_ref, xf_ref,
                  w1_ref, a1_ref, w2_ref, a2_ref, w3_ref, a3_ref,
                  w4_ref, a4_ref, w5_ref, a5_ref, out_ref, *,
                  k: int, dtype):
    q = xt_ref[0]                          # (TN, 3) f32 query tile
    t = xf_ref[0]                          # (N, 3) f32 full cloud
    TN = q.shape[0]
    N = t.shape[0]

    inner = jax.lax.dot_general(q, t, (((1,), (1,)), ((), ())),
                                precision=_HI,
                                preferred_element_type=jnp.float32)
    d2 = (jnp.sum(q * q, axis=-1, keepdims=True)
          + jnp.sum(t * t, axis=-1)[None, :] - 2.0 * inner)
    d2 = jnp.maximum(d2, 1e-12)
    col = jax.lax.broadcasted_iota(jnp.int32, (TN, N), 1)

    dt = dtype
    qc = q.astype(dt)
    # weights arrive with the BN scale pre-folded (w * scale); only the bias
    # remains per stage — one fewer VPU op in the hot k-pass loop
    w1, w2, w3, w4, w5 = (r[:].astype(dt) for r in
                          (w1_ref, w2_ref, w3_ref, w4_ref, w5_ref))
    b1 = a1_ref[0].astype(dt)
    b2 = a2_ref[0].astype(dt)
    b3 = a3_ref[0].astype(dt)
    b4 = a4_ref[0].astype(dt)
    b5 = a5_ref[0].astype(dt)

    def mm(h, w):
        return jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def stage(h, w, b):
        return jnp.maximum(mm(h, w).astype(dt) + b, 0)

    neg = jnp.float32(-jnp.inf)
    m1 = jnp.full((TN, w1.shape[1]), neg, dt)
    m2 = jnp.full((TN, w2.shape[1]), neg, dt)
    m3 = jnp.full((TN, w3.shape[1]), neg, dt)
    m4 = jnp.full((TN, w4.shape[1]), neg, dt)

    def body(j, carry):
        d2, m1, m2, m3, m4 = carry
        am = jnp.argmin(d2, axis=1).astype(jnp.int32)        # (TN,)
        onehot = (col == am[:, None]).astype(jnp.float32)    # (TN, N)
        nbr = jax.lax.dot_general(onehot, t, (((1,), (0,)), ((), ())),
                                  precision=_HI,
                                  preferred_element_type=jnp.float32)
        e = jnp.concatenate([nbr.astype(dt) - qc, qc], axis=-1)  # (TN, 6)
        h1 = stage(e, w1, b1)                                # (TN, 64)
        h2 = stage(h1, w2, b2)                               # (TN, 64)
        h3 = stage(h2, w3, b3)                               # (TN, 128)
        h4 = stage(h3, w4, b4)                               # (TN, 256)
        return (jnp.where(col == am[:, None], jnp.inf, d2),
                jnp.maximum(m1, h1), jnp.maximum(m2, h2),
                jnp.maximum(m3, h3), jnp.maximum(m4, h4))

    _, m1, m2, m3, m4 = jax.lax.fori_loop(0, k, body, (d2, m1, m2, m3, m4))

    cat = jnp.concatenate([m1, m2, m3, m4], axis=-1)         # (TN, 512)
    out_ref[0] = jnp.maximum(mm(cat, w5).astype(dt) + b5, 0)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "dtype",
                                             "interpret"))
def dgcnn_eval_pallas(x: jnp.ndarray, weights, affines, k: int = 20,
                      tile_n: int | None = None, dtype=jnp.bfloat16,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused eval DGCNN: x (B,N,3) -> (B,N,512) in `dtype`.

    weights: 5 kernels [(6,64),(64,64),(64,128),(128,256),(512,512)] fp32.
    affines: 5 folded BN (scale, bias) pairs, each (C,) fp32
             (scale = gamma*rsqrt(var+eps), bias = beta - mean*scale).

    tile_n=None uses full-height tiles (one program per cloud) — measured
    fastest at N=717 (larger per-pass matmuls, better MXU utilisation).
    Caller must keep N <= ~1024: the (tile, N) distance block lives in VMEM.
    """
    B, N, _ = x.shape
    tile_n = min(tile_n or N, N)
    grid = (B, pl.cdiv(N, tile_n))
    emb = weights[4].shape[1]
    kern = functools.partial(_dgcnn_kernel, k=k, dtype=dtype)

    def full(arr):   # whole-array operand, same block for every program
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda b, i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    ops = []
    specs = []
    for w, (s, bias) in zip(weights, affines):
        ws = (w * s[None, :]).astype(jnp.float32)             # fold BN scale
        a = bias.astype(jnp.float32)[None, :]                 # (1, C)
        ops.extend([ws, a])
        specs.extend([full(ws), full(a)])

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_n, 3), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N, 3), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=pl.BlockSpec((1, tile_n, emb), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, emb), dtype),
        interpret=interpret,
    )(x.astype(jnp.float32), x.astype(jnp.float32), *ops)
