"""Differentiable fused DGCNN training path (custom VJP).

The naive training path (nn/dgcnn.py, jnp composition) materialises the
(B, N, k, C) edge tensors and lets XLA autodiff them — measured ~17.6 ms of
the 58.7 ms train step at the bench shape (kNN + gathers + stage fwd/bwd,
profiles/r2/PROFILE.md), dominated by redundant HBM passes over the edge
tensors in the backward. This module reimplements the SAME math
(reference models/dgcnn.py:118-154 under torch-BN train semantics) as a
custom-VJP function whose forward and backward are hand-scheduled:

  forward:  kNN graph + edge gather + stage-1 matmul fused in one Pallas
            kernel (ops/pallas_dgcnn_train.py) — the pre-BN z1 and the edge
            features land in HBM once, in the (B, k, N, C) layout every
            consumer here reads natively; stages 2-4 are single
            matmul+BN+relu chains XLA fuses well. BatchNorm batch statistics
            (biased var, fp32 two-pass — bit-matching the naive path) come
            from the materialised pre-BN z tensors.
  backward: one pass per stage computing the BN-batch-stat gradient
            (dz = s*(dy - mean(dy) - zhat*mean(dy*zhat))), the weight
            gradient (recomputing h_{i-1} elementwise from the saved pre-BN
            z_{i-1}), and the edge-gather scatter for dx.

Matching the naive path:
  * BN: eps 1e-5, biased variance, stats in fp32, normalisation in the
    compute dtype — identical formulas, so parameters/batch_stats trees and
    running-stat updates are interchangeable with the naive path.
  * relu VJP at 0 passes half the cotangent (jnp.maximum semantics,
    matching jax.grad of the naive composition); the max-over-k VJP sends
    tie cotangents to the FIRST maximal element (torch's max backward —
    see _max_vjp and the PARITY.md divergence row) where jax's naive path
    splits them evenly — identical off ties, which are measure-zero in
    fp32 and absorbed by the bf16 test tolerances.
  * Reductions run in fp32; matmul cotangents are formed in the compute
    dtype with fp32 accumulation, like the forward einsums.

The jnp implementation here is the numerical reference; the Pallas kernels
are tested against it in interpreter mode (tests/test_dgcnn_train_fused.py),
per the repo invariant that every kernel has a jnp fallback.

Internal layout: edge tensors are (B, k, N, C) — channels on lanes, the
neighbour axis outermost so per-pass kernel writes and the max-over-k are
contiguous; the naive path's (B, N, k, C) and this layout reduce over the
same axis set, so BN statistics are identical.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ogmm_tpu.ops.common import graph_feature, knn

_AXES = (0, 1, 2)   # BN reduce axes, (B, k, N, C) stages and (B, N, C) head
_EPS = 1e-5
# kernel-dispatch tuning knobs (chip A/B in scripts/bench_train_fused.py,
# 2026-08-16 v5e: jnp bwd 52.5 ms/step vs Pallas bwd 56.1 — the hand
# kernels' extra recompute passes lose to XLA's fused backward; kept
# opt-in + interpreter-tested for future tuning)
_BWD_PALLAS = False  # Pallas backward kernels vs the jnp reference backward
_BWD_TILE = 128      # query-tile height for the backward kernels


def _relu_vjp(g, y):
    """VJP of jnp.maximum(y, 0): half the cotangent at exact zeros."""
    return jnp.where(y > 0, g, jnp.where(y == 0, jnp.asarray(0.5, g.dtype) * g,
                                         jnp.zeros((), g.dtype)))


def _bn_apply(z, mean, var, gamma, beta):
    """Normalise in the compute dtype from fp32 stats (nn/dgcnn.py:_bn)."""
    dt = z.dtype
    inv = jax.lax.rsqrt(var + _EPS)
    return (z - mean.astype(dt)) * (inv * gamma).astype(dt) + beta.astype(dt)


def _graph_stage1(x, w1, k: int, dt, posenc_k: int = 0):
    """kNN graph + edge features + stage-1 matmul.

    Returns (z1 (B,k,N,C1) dt pre-BN, e (B,k,N,6) dt, idx (B,N,k) i32,
    alpha). alpha is the PositionEncoding angle features (B, N, posenc_k)
    f32 when posenc_k > 0 (the kernel emits them from its own selection,
    ops/pallas_dgcnn_train.py:_stage1_kernel; the jnp fallback mirrors
    PositionEncoding's gather formula from idx), else None.
    Dispatches to the fused Pallas kernel on TPU; jnp fallback is the
    reference composition (knn + gather + einsum).
    """
    from ogmm_tpu.ops.dispatch import use_pallas
    if use_pallas() and x.shape[1] <= 1024:
        from ogmm_tpu.ops.pallas_dgcnn_train import graph_stage1_pallas
        out = graph_stage1_pallas(x, w1, k=k, dtype=dt, posenc_k=posenc_k)
        return out if posenc_k else (*out, None)
    idx = knn(x, x, k)
    e = graph_feature(x, k, idx=idx).astype(dt)          # (B, N, k, 6)
    e = jnp.swapaxes(e, 1, 2)                            # (B, k, N, 6)
    z1 = jnp.einsum('bkni,io->bkno', e, w1.astype(dt),
                    preferred_element_type=jnp.float32).astype(dt)
    alpha = None
    if posenc_k:
        # PositionEncoding's jnp angle formula (nn/attention.py), from the
        # graph's ascending-distance prefix
        from ogmm_tpu.ops.common import gather_neighbors, l2_normalize
        x32 = x.astype(jnp.float32)
        p2gc = x32 - x32.mean(axis=1, keepdims=True)
        p2lc = gather_neighbors(x32, idx[..., :posenc_k]) \
            - x32[:, :, None, :]
        alpha = jnp.einsum('bnkc,bnc->bnk', l2_normalize(p2lc),
                           l2_normalize(p2gc))
    return z1, e, idx, alpha


def _moments(z):
    z32 = z.astype(jnp.float32)
    return z32.mean(_AXES[:z.ndim - 1]), z32.var(_AXES[:z.ndim - 1])


def _stage_bwd(dy, z, mean, var, gamma):
    """BN(batch-stats) backward: dy (already relu-masked) -> (dz, dgamma, dbeta).

    y = (z - mean)*(inv*gamma) + beta with mean/var functions of z;
    dz = inv*gamma*(dy - E[dy] - zhat*E[dy*zhat]) over the reduce axes.
    Reductions in fp32; dz returned in the compute dtype.
    """
    dt = dy.dtype
    axes = _AXES[:z.ndim - 1]
    m = 1.0
    for a in axes:
        m *= z.shape[a]
    inv = jax.lax.rsqrt(var + _EPS)
    zhat32 = ((z.astype(jnp.float32) - mean) * inv)
    dy32 = dy.astype(jnp.float32)
    s1 = dy32.sum(axes)                                  # == dbeta
    s2 = (dy32 * zhat32).sum(axes)                       # == dgamma
    dz32 = (inv * gamma) * (dy32 - s1 / m - zhat32 * (s2 / m))
    return dz32.astype(dt), s2, s1


def _max_vjp(dtap, h):
    """VJP of h.max(axis=1) via argmax one-hot.

    jax's reduce_max VJP splits the cotangent evenly among ties using a
    bitwise h == max(h) mask. That construction is NOT safe here: h is
    RECOMPUTED in the backward, and on TPU XLA's excess precision can
    produce different bits for the h feeding the max and the h feeding the
    compare — the mask comes up empty, 0/0, NaN gradients (observed on
    chip; CPU recompute is bitwise-stable so CPU tests alone don't catch
    it). An integer argmax one-hot has no float equality and no division:
    ties send the whole cotangent to the first maximal element — the only
    (measure-zero) deviation from jax.grad of the naive path, and the total
    cotangent mass is identical.
    """
    am = jnp.argmax(h, axis=1)                           # (B, N, C)
    iota = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    mask = (iota == am[:, None, :, :]).astype(dtap.dtype)
    return dtap[:, None, :, :] * mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _dgcnn_train(x, ws, gammas, betas, k: int, dtype, posenc_k: int = 0):
    out, moments, alpha, _ = _fwd(x, ws, gammas, betas, k, dtype, posenc_k)
    return out, moments, alpha


def _fwd(x, ws, gammas, betas, k: int, dtype, posenc_k: int = 0):
    dt = jnp.dtype(dtype)
    # alpha is a pure function of x (which carries no gradient in the
    # trainer); the custom bwd ignores its cotangent
    z, e, idx, alpha = _graph_stage1(x, ws[0], k, dt, posenc_k=posenc_k)

    zs, taps, moments = [], [], []
    for i in range(4):
        if i > 0:
            z = jnp.einsum('bkni,io->bkno', h, ws[i].astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
        mean, var = _moments(z)
        h = jnp.maximum(_bn_apply(z, mean, var, gammas[i], betas[i]), 0)
        zs.append(z)
        moments.append((mean, var))
        taps.append(h.max(axis=1))                       # (B, N, C_i)

    cat = jnp.concatenate(taps, axis=-1)                 # (B, N, 512)
    z5 = jnp.einsum('bni,io->bno', cat, ws[4].astype(dt),
                    preferred_element_type=jnp.float32).astype(dt)
    mean5, var5 = _moments(z5)
    out = jnp.maximum(_bn_apply(z5, mean5, var5, gammas[4], betas[4]), 0)
    moments.append((mean5, var5))
    res = (x, idx, e, tuple(zs), z5, tuple(taps), tuple(ws), tuple(gammas),
           tuple(betas), tuple(moments))
    return out, tuple(moments), alpha, res


def _fwd_vjp(x, ws, gammas, betas, k: int, dtype, posenc_k: int = 0):
    out, moments, alpha, res = _fwd(x, ws, gammas, betas, k, dtype, posenc_k)
    return (out, moments, alpha), res


def _bwd_vjp(k: int, dtype, posenc_k: int, res, cts):
    dout, _, _ = cts   # moments feed running-stat updates only: no
    #                    gradient; alpha is a function of x only (no grad
    #                    path to params, and x's grad is discarded)
    (x, idx, e, zs, z5, taps, ws, gammas, betas, moments) = res
    dt = jnp.dtype(dtype)
    dout = dout.astype(dt)

    # ---- stage 5 (B, N, 512) ------------------------------------------------
    mean5, var5 = moments[4]
    y5 = _bn_apply(z5, mean5, var5, gammas[4], betas[4])
    dy5 = _relu_vjp(dout, y5)
    dz5, dg5, db5 = _stage_bwd(dy5, z5, mean5, var5, gammas[4])
    cat = jnp.concatenate(taps, axis=-1)
    dw5 = jnp.einsum('bni,bno->io', cat, dz5,
                     preferred_element_type=jnp.float32)
    dcat = jnp.einsum('bno,io->bni', dz5, ws[4].astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)
    splits = [t.shape[-1] for t in taps]
    offs = [0]
    for s in splits:
        offs.append(offs[-1] + s)
    dtaps = [dcat[..., offs[i]:offs[i + 1]] for i in range(4)]

    # ---- stages 4..1 (B, k, N, C) -------------------------------------------
    dws = [None] * 5
    dgs = [None] * 5
    dbs = [None] * 5
    dws[4], dgs[4], dbs[4] = dw5, dg5, db5

    from ogmm_tpu.ops.dispatch import use_pallas
    if _BWD_PALLAS and use_pallas() and x.shape[1] <= 1024:
        return _bwd_pallas(x, idx, e, zs, taps, dtaps, ws, gammas, betas,
                           moments, dws, dgs, dbs, dt)

    hs = [e]                                   # stage inputs h_0..h_3
    for i in range(4):
        mean, var = moments[i]
        hs.append(jnp.maximum(
            _bn_apply(zs[i], mean, var, gammas[i], betas[i]), 0))

    dz_next = None
    for i in range(3, -1, -1):
        mean, var = moments[i]
        h_i = hs[i + 1]
        dh = _max_vjp(dtaps[i], h_i)
        if dz_next is not None:
            dh = dh + jnp.einsum(
                'bkno,io->bkni', dz_next, ws[i + 1].astype(dt),
                preferred_element_type=jnp.float32).astype(dt)
        y = _bn_apply(zs[i], mean, var, gammas[i], betas[i])
        dy = _relu_vjp(dh, y)
        dz, dgs[i], dbs[i] = _stage_bwd(dy, zs[i], mean, var, gammas[i])
        dws[i] = jnp.einsum('bkni,bkno->io', hs[i], dz,
                            preferred_element_type=jnp.float32)
        dz_next = dz

    # ---- edge features -> dx ------------------------------------------------
    de = jnp.einsum('bkno,io->bkni', dz_next, ws[0].astype(dt),
                    preferred_element_type=jnp.float32)   # fp32 (B,k,N,6)
    dneigh = de[..., :3]                                  # (B, k, N, 3)
    dcenter = de[..., 3:] - de[..., :3]
    B, N, _ = x.shape
    ids = jnp.swapaxes(idx, 1, 2).reshape(B, -1)          # (B, k*N)
    dx = jnp.zeros((B, N, 3), jnp.float32)
    dx = dx.at[jnp.arange(B)[:, None], ids, :].add(dneigh.reshape(B, -1, 3))
    dx = dx + dcenter.sum(axis=1)
    return (dx.astype(x.dtype), tuple(dws), tuple(dgs), tuple(dbs))


def _bwd_pallas(x, idx, e, zs, taps, dtaps, ws, gammas, betas, moments,
                dws, dgs, dbs, dt):
    """Kernelised stages-4..1 backward (ops/pallas_dgcnn_train.py)."""
    from ogmm_tpu.ops.pallas_dgcnn_train import (
        bwd_edge_pallas, bwd_reduce_pallas, bwd_stage_pallas)
    s = {3: bwd_reduce_pallas(zs[3], dtaps[3], *moments[3],
                              gammas[3], betas[3], tile_n=_BWD_TILE,
                              dtype=dt)}
    dzs = {}
    for i in (3, 2, 1):
        dzs[i], dws[i], s[i - 1] = bwd_stage_pallas(
            zs[i], dtaps[i], *moments[i], gammas[i], betas[i],
            s[i], ws[i],
            zs[i - 1], *moments[i - 1], gammas[i - 1], betas[i - 1],
            dtaps[i - 1],
            dznext=(dzs[i + 1] if i < 3 else None),
            wnext=(ws[i + 1] if i < 3 else None), tile_n=_BWD_TILE,
            dtype=dt)
        dgs[i], dbs[i] = s[i][1], s[i][0]
    dws[0], dq, dscat = bwd_edge_pallas(
        zs[0], dtaps[0], *moments[0], gammas[0], betas[0], s[0],
        dzs[1], ws[1], e, ws[0], idx, tile_n=_BWD_TILE, dtype=dt)
    dgs[0], dbs[0] = s[0][1], s[0][0]
    dx = (dq + dscat).astype(x.dtype)
    return (dx, tuple(dws), tuple(dgs), tuple(dbs))


_dgcnn_train.defvjp(_fwd_vjp, _bwd_vjp)


def dgcnn_train_fused(x: jnp.ndarray, ws: Sequence[jnp.ndarray],
                      gammas: Sequence[jnp.ndarray],
                      betas: Sequence[jnp.ndarray],
                      k: int = 20, dtype=jnp.bfloat16, posenc_k: int = 0):
    """Fused differentiable DGCNN training forward.

    Args:
      x: (B, N, 3) fp32 points.
      ws: 5 stage kernels [(6,64),(64,64),(64,128),(128,256),(512,emb)].
      gammas/betas: 5 BN scale/bias vectors (fp32).
      k: neighbours; dtype: compute dtype for the conv stack.
      posenc_k: > 0 also returns the PositionEncoding angle features
        (B, N, posenc_k) f32 from the graph kernel's own selection
        (no gradient — a pure function of x).

    Returns (features (B, N, emb) in `dtype`,
             moments: 5 (batch_mean, batch_var) fp32 pairs for the caller's
             running-stat update — identical values to the naive path's,
             alpha (or None)).
    """
    return _dgcnn_train(x, tuple(ws), tuple(gammas), tuple(betas), k,
                        jnp.dtype(dtype).name, posenc_k)
