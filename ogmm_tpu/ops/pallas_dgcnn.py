"""Fully-fused DGCNN edge-conv forward (eval mode) as one Pallas kernel.

The DGCNN encoder (reference models/dgcnn.py:118-154) builds one kNN graph,
materialises a (B, N, k, C) edge tensor, and chains four 1x1-conv stages over
it with a max over k after each — composed in XLA that is >500 MB of HBM
round-trips per cloud (the largest cost in the forward pass).

This kernel fuses everything per query tile: the (TN, N) distance block, a
k-pass argmin scan that extracts the neighbours, and ONE stage-matmul chain
over the whole (k*TN, C) VMEM-resident edge block — followed by the max over
k and the final Dense(512). The edge tensor never reaches HBM; traffic is
xyz in, (B, N, 512) features out.

Round-2 restructure (profiles/r2/PROFILE.md): the round-1 kernel ran the four
stage matmuls INSIDE the k-loop — 20 serialized passes of tiny (TN, C)
matmuls that left the MXU mostly idle (7.7 ms/step at the bench shape). The
k-loop now only extracts neighbour rows (argmin + mask + one-hot gather
matmul, the part that is inherently sequential); the stage chain runs once
per tile on k-times-taller operands.

Eval-only: BatchNorm folds into per-channel (scale, bias) from running
stats, so this path is valid when `train=False` (the training path keeps the
jnp composition, whose BN batch-stats and autodiff XLA handles). No VJP is
defined — do not differentiate through it.

Neighbour ordering matches ops/pallas_knn.py (ascending distance, first-index
ties). Stage matmuls run in the model's compute dtype (bf16) with fp32
accumulation; the distance block and the neighbour gather are fp32 HIGHEST
like everywhere else (the edge value nbr - q is formed in the compute dtype,
matching the round-1 kernel and the jnp fallback's cast point).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _run_stages(e, ws, bs, k: int, TN: int, dt):
    """The shared DGCNN stage chain over one VMEM-resident edge block:
    (k*TN, 6) -> (TN, emb). Four Dense(+folded-BN bias)+ReLU stages, a max
    over the k neighbour slots (edge rows are stacked k-major: row j*TN+r
    is query r's j-th neighbour), the 4-tap concat, and the final Dense.
    ws/bs: the 5 stage weights (BN scale pre-folded) and biases, already
    cast to the compute dtype."""
    w1, w2, w3, w4, w5 = ws
    b1, b2, b3, b4, b5 = bs

    def mm(h, w):
        return jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def stage(h, w, b):
        return jnp.maximum(mm(h, w).astype(dt) + b, 0)

    h1 = stage(e, w1, b1)                                    # (k*TN, 64)
    h2 = stage(h1, w2, b2)                                   # (k*TN, 64)
    h3 = stage(h2, w3, b3)                                   # (k*TN, 128)
    h4 = stage(h3, w4, b4)                                   # (k*TN, 256)

    def kmax(h):
        return jnp.max(h.reshape(k, TN, h.shape[-1]), axis=0)

    cat = jnp.concatenate([kmax(h1), kmax(h2), kmax(h3), kmax(h4)],
                          axis=-1)                           # (TN, 512)
    return jnp.maximum(mm(cat, w5).astype(dt) + b5, 0)


def _dgcnn_kernel(xt_ref, xf_ref,
                  w1_ref, a1_ref, w2_ref, a2_ref, w3_ref, a3_ref,
                  w4_ref, a4_ref, w5_ref, a5_ref, out_ref, *rest,
                  k: int, dtype, posenc_k: int = 0):
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
    # remains per stage
    w1, w2, w3, w4, w5 = (r[:].astype(dt) for r in
                          (w1_ref, w2_ref, w3_ref, w4_ref, w5_ref))
    b1 = a1_ref[0].astype(dt)
    b2 = a2_ref[0].astype(dt)
    b3 = a3_ref[0].astype(dt)
    b4 = a4_ref[0].astype(dt)
    b5 = a5_ref[0].astype(dt)

    # ---- neighbour extraction: the only inherently sequential part --------
    # Unrolled so each pass's neighbour block lands at a static stack slot.
    # The one-hot gather matmul runs in the compute dtype: with exactly one
    # nonzero {0,1} per row, a bf16 onehot @ bf16(t) product is exact and
    # returns bit-identical bf16 neighbour values at full MXU rate (the f32
    # HIGHEST path costs 3 MXU passes and was the kernel's largest cost at
    # 20 passes/tile); fp32 mode keeps the fp32 gather.
    tc = t.astype(dt)
    # fp32 mode keeps the fp32 gather: without HIGHEST the default-precision
    # f32 dot_general feeds the MXU bf16 operands and rounds the gathered
    # coordinates (ADVICE r2); bf16 mode is exact at default precision
    gather_prec = _HI if dt == jnp.float32 else None

    # posenc_k > 0: also emit the PositionEncoding angle features for the
    # first posenc_k trips — this kernel already selects and gathers each
    # neighbour, so cos(angle(p->nbr_j, p->centroid)) is ~free here, and
    # the standalone posenc_angles_pallas pass (1.40 ms of the 16.6 ms
    # eval forward, profiles/r4/PROFILE.md) drops out of the model. Same
    # selection (identical d2 construction, argmin tie rule, inf-masking)
    # => identical neighbour prefix (reference models/attn.py:59-75 angle
    # semantics). The angle math ALWAYS reads f32-exact coordinates: in
    # bf16 mode the edge gather rounds t to bf16, and p2lc = nbr - q then
    # cancels catastrophically for near neighbours (r4 chip gate: max
    # alpha err 1.0 with bf16 coords — nearest-neighbour offsets are far
    # smaller than the coordinates carrying them, so bf16's ~3-digit
    # mantissa destroys the direction). The prefix trips therefore run one
    # extra f32 HIGHEST one-hot gather each (posenc_k skinny matmuls per
    # tile), matching posenc_angles_pallas bit-for-bit in the gather.
    if posenc_k:
        alpha_ref = rest[0]
        cen = jnp.sum(t, axis=0, keepdims=True) / N          # (1, 3) f32
        p2gc = q - cen
        g_hat = p2gc / jnp.maximum(
            jnp.sqrt(jnp.sum(p2gc * p2gc, axis=-1, keepdims=True)), 1e-12)
        colk = jax.lax.broadcasted_iota(jnp.int32, (TN, posenc_k), 1)
        alpha = jnp.zeros((TN, posenc_k), jnp.float32)

    edges = []
    for j in range(k):
        am = jnp.argmin(d2, axis=1).astype(jnp.int32)        # (TN,)
        hit = col == am[:, None]                             # (TN, N)
        onehot = hit.astype(dt)
        nbr = jax.lax.dot_general(onehot, tc, (((1,), (0,)), ((), ())),
                                  precision=gather_prec,
                                  preferred_element_type=jnp.float32)
        edges.append(jnp.concatenate([nbr.astype(dt) - qc, qc], axis=-1))
        if posenc_k and j < posenc_k:
            if dt == jnp.float32:
                nbr32 = nbr        # the edge gather was already f32 HIGHEST
            else:
                nbr32 = jax.lax.dot_general(
                    hit.astype(jnp.float32), t, (((1,), (0,)), ((), ())),
                    precision=_HI, preferred_element_type=jnp.float32)
            p2lc = nbr32 - q                                 # (TN, 3) f32
            # coincident neighbour (the self point at j=0): p2lc is exactly
            # 0 -> l_hat 0 -> alpha 0, same as posenc_angles_pallas.
            l_hat = p2lc / jnp.maximum(
                jnp.sqrt(jnp.sum(p2lc * p2lc, axis=-1, keepdims=True)),
                1e-12)
            a_j = jnp.sum(l_hat * g_hat, axis=-1)            # (TN,)
            alpha = jnp.where(colk == j, a_j[:, None], alpha)
        d2 = jnp.where(hit, jnp.inf, d2)

    if posenc_k:
        alpha_ref[0] = alpha

    e = jnp.concatenate(edges, axis=0)                       # (k*TN, 6)

    # ---- one stage chain over the whole edge block ------------------------
    out_ref[0] = _run_stages(e, (w1, w2, w3, w4, w5),
                             (b1, b2, b3, b4, b5), k, TN, dt)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "dtype",
                                             "interpret", "posenc_k"))
def dgcnn_eval_pallas(x: jnp.ndarray, weights, affines, k: int = 20,
                      tile_n: int | None = None, dtype=jnp.bfloat16,
                      interpret: bool = False, posenc_k: int = 0):
    """Fused eval DGCNN: x (B,N,3) -> (B,N,512) in `dtype`.

    weights: 5 kernels [(6,64),(64,64),(64,128),(128,256),(512,512)] fp32.
    affines: 5 folded BN (scale, bias) pairs, each (C,) fp32
             (scale = gamma*rsqrt(var+eps), bias = beta - mean*scale).

    tile_n=None defaults to 128-row query tiles: the per-tile edge block is
    (k*tile_n, 256) at its widest, so VMEM holds the whole stage chain with
    room for the (tile_n, N) f32 distance block. Caller must keep
    N <= ~1024 either way.

    posenc_k > 0: additionally return the PositionEncoding angle features
    (B, N, posenc_k) f32 for the posenc_k nearest neighbours (the kernel's
    selection prefix) — see _dgcnn_kernel. Return becomes (out, alpha).
    """
    B, N, _ = x.shape
    if posenc_k > k:
        raise ValueError(f"posenc_k={posenc_k} must be <= k={k} (the angle "
                         f"features are the selection prefix)")
    tile_n = min(tile_n or 128, N)
    grid = (B, pl.cdiv(N, tile_n))
    emb = weights[4].shape[1]
    kern = functools.partial(_dgcnn_kernel, k=k, dtype=dtype,
                             posenc_k=posenc_k)

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

    out_specs = pl.BlockSpec((1, tile_n, emb), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, N, emb), dtype)
    if posenc_k:
        out_specs = (out_specs,
                     pl.BlockSpec((1, tile_n, posenc_k),
                                  lambda b, i: (b, i, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, N, posenc_k), jnp.float32))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_n, 3), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N, 3), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x.astype(jnp.float32), x.astype(jnp.float32), *ops)


def _dgcnn_edges_kernel(xt_ref, nb_ref,
                        w1_ref, a1_ref, w2_ref, a2_ref, w3_ref, a3_ref,
                        w4_ref, a4_ref, w5_ref, a5_ref, out_ref,
                        *, k: int, dtype):
    q = xt_ref[0]                          # (TN, 3) f32 query tile
    TN = q.shape[0]
    dt = dtype
    qc = q.astype(dt)
    ws = tuple(r[:].astype(dt) for r in
               (w1_ref, w2_ref, w3_ref, w4_ref, w5_ref))
    bs = tuple(r[0].astype(dt) for r in
               (a1_ref, a2_ref, a3_ref, a4_ref, a5_ref))

    # edge rows stacked k-major, matching _run_stages's kmax layout. The
    # offset nbr - q is formed in f32 THEN cast — the jnp fallback's exact
    # cast point (graph_feature concatenates f32, nn/dgcnn.py casts after),
    # and the lesson of the r4/r5 alpha regression: near-neighbour offsets
    # are ~100x smaller than the coordinates carrying them, so rounding the
    # coordinates BEFORE the subtract destroys the offset.
    edges = []
    for j in range(k):
        edges.append(jnp.concatenate([(nb_ref[0, j] - q).astype(dt), qc],
                                     axis=-1))
    e = jnp.concatenate(edges, axis=0)     # (k*TN, 6)
    out_ref[0] = _run_stages(e, ws, bs, k, TN, dt)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "dtype",
                                             "interpret"))
def dgcnn_edges_pallas(x: jnp.ndarray, nbr: jnp.ndarray, weights, affines,
                       k: int = 20, tile_n: int | None = None,
                       dtype=jnp.bfloat16, interpret: bool = False):
    """Large-N fused DGCNN eval stage chain over a PRE-GATHERED graph:
    x (B, N, 3) + nbr (B, N, k, 3) neighbour coordinates -> (B, N, 512).

    The whole-cloud fused kernel (dgcnn_eval_pallas) holds a (TN, N)
    distance block in VMEM and tops out at N ~ 1024; at indoor scale
    (N ~ 35k) the kNN graph comes from the Morton-streamed kernels and the
    naive jnp composition then round-trips every (B, N, k, C) stage tensor
    through HBM (~2.9 GB at N=35k/k=20/bf16). This kernel runs the four
    edge-conv stages + k-max + final Dense per 128-query tile entirely in
    VMEM: traffic is the (B, N, k, 3) f32 neighbour block in (the one
    tensor the composition needs anyway) and (B, N, 512) features out.

    Weights/affines as dgcnn_eval_pallas (BN folded from running stats —
    eval only, no VJP). Same math as the naive composition fed the same
    graph; the only rounding difference in bf16 mode is fusion order.
    Reference being fused: models/dgcnn.py:118-154.
    """
    B, N, _ = x.shape
    assert nbr.shape[:3] == (B, N, k), (nbr.shape, (B, N, k))
    tile_n = min(tile_n or 128, N)
    grid = (B, pl.cdiv(N, tile_n))
    emb = weights[4].shape[1]
    kern = functools.partial(_dgcnn_edges_kernel, k=k, dtype=dtype)

    def full(arr):
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

    # k-major neighbour layout: each (1, k, tile_n, 3) block is this tile's
    # whole neighbourhood, and the kernel's per-j slices are leading-dim
    # indexing (no in-kernel transposes)
    nbt = jnp.swapaxes(nbr.astype(jnp.float32), 1, 2)         # (B, k, N, 3)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_n, 3), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, k, tile_n, 3), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=pl.BlockSpec((1, tile_n, emb), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, emb), dtype),
        interpret=interpret,
    )(x.astype(jnp.float32), nbt, *ops)
