"""kNN graph construction as a tiled Pallas kernel.

The jnp path (ops/common.py:knn) materialises the full (B, N, M) distance
matrix in HBM and runs lax.top_k over it — measured ~6.8 ms at the DGCNN
geometry (B=24, N=M=717, k=20), the single largest cost in the forward pass.
This kernel tiles the query axis: each program computes a (TILE_N, M)
distance block on the MXU directly in VMEM and extracts the k nearest
neighbours by k passes of (min, argmin, mask) — the distance matrix never
touches HBM, and the only output traffic is the (B, N, k) int32 index block.

Ordering semantics match lax.top_k over the clamped distances
(ops/common.py:square_distance clamps at 1e-12): ascending distance, ties
broken by the lower index (argmin picks the first minimum; top_k is stable).

Distance matmul runs fp32 HIGHEST — kNN topology flips under bf16 rounding
(see ops/common.py:square_distance).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _knn_kernel(src_ref, tgt_ref, out_ref, *, k: int, n_valid: int):
    q = src_ref[0]                        # (TN, 3)
    t = tgt_ref[0]                        # (M, 3)
    TN = q.shape[0]
    M = t.shape[0]

    inner = jax.lax.dot_general(q, t, (((1,), (1,)), ((), ())),
                                precision=_HI,
                                preferred_element_type=jnp.float32)  # (TN, M)
    d2 = (jnp.sum(q * q, axis=-1, keepdims=True)
          + jnp.sum(t * t, axis=-1)[None, :] - 2.0 * inner)
    d2 = jnp.maximum(d2, 1e-12)           # match square_distance's clamp

    col = jax.lax.broadcasted_iota(jnp.int32, (TN, M), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (TN, k), 1)

    def body(j, carry):
        d2, idxs = carry
        am = jnp.argmin(d2, axis=1).astype(jnp.int32)       # (TN,)
        # accumulate via select on an iota mask — Mosaic forbids dynamic
        # lane-dimension stores, so column j is written by a masked select
        idxs = jnp.where(colk == j, am[:, None], idxs)
        return jnp.where(col == am[:, None], jnp.inf, d2), idxs

    _, idxs = jax.lax.fori_loop(
        0, k, body, (d2, jnp.zeros((TN, k), jnp.int32)))
    out_ref[0] = idxs


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def knn_pallas(src: jnp.ndarray, tgt: jnp.ndarray, k: int,
               tile_n: int = 128, interpret: bool = False) -> jnp.ndarray:
    """(B, N, C) x (B, M, C) -> int32 (B, N, k), ascending distance.

    Drop-in for ops/common.py:knn (normalize=False path). Query rows are
    processed in `tile_n` chunks; the tail tile is padded by Pallas (padded
    rows compute garbage whose writes fall outside the output and are
    dropped).
    """
    B, N, C = src.shape
    M = tgt.shape[1]
    tile_n = min(tile_n, N)   # single full-height tile for small clouds
    grid = (B, pl.cdiv(N, tile_n))
    kern = functools.partial(_knn_kernel, k=k, n_valid=N)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_n, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, M, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_n, k), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        interpret=interpret,
    )(src.astype(jnp.float32), tgt.astype(jnp.float32))


def _angle_kernel(xt_ref, xf_ref, c_ref, out_ref, *, k: int):
    """Neighbour-angle features for PositionEncoding (models/attn.py:59-75):
    cos(angle(p -> j-th neighbour, p -> centroid)) for the k nearest
    neighbours — the kNN scan, gather, and normalised dot fused per tile."""
    q = xt_ref[0]                          # (TN, 3) f32
    t = xf_ref[0]                          # (N, 3) f32
    TN = q.shape[0]
    N = t.shape[0]
    cen = c_ref[0]                         # (1, 3)

    inner = jax.lax.dot_general(q, t, (((1,), (1,)), ((), ())),
                                precision=_HI,
                                preferred_element_type=jnp.float32)
    d2 = (jnp.sum(q * q, axis=-1, keepdims=True)
          + jnp.sum(t * t, axis=-1)[None, :] - 2.0 * inner)
    d2 = jnp.maximum(d2, 1e-12)
    col = jax.lax.broadcasted_iota(jnp.int32, (TN, N), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (TN, k), 1)

    p2gc = q - cen                         # (TN, 3)
    g_hat = p2gc / jnp.maximum(
        jnp.sqrt(jnp.sum(p2gc * p2gc, axis=-1, keepdims=True)), 1e-12)

    alpha = jnp.zeros((TN, k), jnp.float32)
    for j in range(k):
        am = jnp.argmin(d2, axis=1).astype(jnp.int32)
        hit = col == am[:, None]
        nbr = jax.lax.dot_general(hit.astype(jnp.float32), t,
                                  (((1,), (0,)), ((), ())),
                                  precision=_HI,
                                  preferred_element_type=jnp.float32)
        p2lc = nbr - q
        l_hat = p2lc / jnp.maximum(
            jnp.sqrt(jnp.sum(p2lc * p2lc, axis=-1, keepdims=True)), 1e-12)
        a_j = jnp.sum(l_hat * g_hat, axis=-1)            # (TN,)
        alpha = jnp.where(colk == j, a_j[:, None], alpha)
        d2 = jnp.where(hit, jnp.inf, d2)

    out_ref[0] = alpha


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def posenc_angles_pallas(points: jnp.ndarray, k: int = 5,
                         tile_n: int | None = None,
                         interpret: bool = False) -> jnp.ndarray:
    """(B, N, 3) -> (B, N, k) cos angles between each point's k-NN edge
    vectors and its vector to the cloud centroid. Fuses the kNN + gather +
    normalised-dot chain of PositionEncoding's angle branch; neighbour order
    matches knn_pallas (ascending distance, first-index ties — the consumer
    maxes over k, so order only matters for reproducibility)."""
    B, N, C = points.shape
    # full-height tiles measured fastest (0.85 vs 1.10 ms at tile 128,
    # B=48 N=717): one d2 block per cloud amortises the 5 argmin scans
    tile_n = min(tile_n or N, N)
    centroid = points.mean(axis=1, keepdims=True)       # (B, 1, 3)
    kern = functools.partial(_angle_kernel, k=k)
    return pl.pallas_call(
        kern,
        grid=(B, pl.cdiv(N, tile_n)),
        in_specs=[pl.BlockSpec((1, tile_n, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_n, k), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.float32),
        interpret=interpret,
    )(points.astype(jnp.float32), points.astype(jnp.float32),
      centroid.astype(jnp.float32))


def _nn1_kernel(src_ref, tgt_ref, d_ref, i_ref):
    q = src_ref[0]                        # (TN, 3)
    t = tgt_ref[0]                        # (M, 3)
    inner = jax.lax.dot_general(q, t, (((1,), (1,)), ((), ())),
                                precision=_HI,
                                preferred_element_type=jnp.float32)
    d2 = (jnp.sum(q * q, axis=-1, keepdims=True)
          + jnp.sum(t * t, axis=-1)[None, :] - 2.0 * inner)
    d2 = jnp.maximum(d2, 1e-12)
    d_ref[0] = jnp.min(d2, axis=1, keepdims=True)
    i_ref[0] = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def nn1_pallas(src: jnp.ndarray, tgt: jnp.ndarray, tile_n: int = 128,
               interpret: bool = False):
    """Nearest neighbour: (B,N,C) x (B,M,C) -> (min_sqdist (B,N), idx (B,N)).

    The ICP inner step (ops/icp.py) — one fused pass instead of
    materialising the (B, N, M) distance matrix + separate min/argmin.
    Distances are clamped at 1e-12 like ops/common.py:square_distance.
    """
    B, N, C = src.shape
    M = tgt.shape[1]
    tile_n = min(tile_n, N)
    grid = (B, pl.cdiv(N, tile_n))
    d, i = pl.pallas_call(
        _nn1_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_n, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, M, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, tile_n, 1), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile_n, 1), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, 1), jnp.int32)),
        interpret=interpret,
    )(src.astype(jnp.float32), tgt.astype(jnp.float32))
    return d[..., 0], i[..., 0]
