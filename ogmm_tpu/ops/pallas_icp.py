"""Whole-loop fused point-to-point ICP kernel (Pallas TPU).

ops/icp.py:icp_point_to_point runs 30 refinement trips, each dispatching a
1-NN kernel, an XLA gather, and a few dozen small Procrustes ops — ~10.8 ms
per batch at the bench shape, dominated by inter-op glue and HBM round
trips. Here the ENTIRE loop runs in one kernel per cloud: src/tgt and the
(N, M) distance block stay VMEM-resident across all iterations; HBM traffic
is two point clouds in, one (3, 4) pose out.

Math mirrors the jnp path exactly (tested in interpreter mode against
icp_point_to_point with method='horn_pi'):
  per trip: moved = src R^T + t; 1-NN over the fp32 HIGHEST distance block
  (first-index ties, ops/pallas_knn.py semantics); inlier gate
  d < threshold^2 with the all-ones fallback when no inliers; weighted
  Procrustes on the ORIGINAL src vs gathered correspondences — Horn 4x4
  via shifted power iteration (core/procrustes.py:_horn_quaternion_pi),
  +1e-5*I regulariser, identity fallback on non-finite covariance.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=_HI,
                               preferred_element_type=jnp.float32)


def _horn_pi(cov, pi_iters: int):
    """R in SO(3) maximising tr(R cov^T): Horn 4x4, shifted power iteration.
    cov: (3, 3) -> (3, 3). Mirrors core/procrustes.py:_horn_quaternion_pi."""
    sxx, sxy, sxz = cov[0, 0], cov[0, 1], cov[0, 2]
    syx, syy, syz = cov[1, 0], cov[1, 1], cov[1, 2]
    szx, szy, szz = cov[2, 0], cov[2, 1], cov[2, 2]
    k00 = sxx + syy + szz
    k01 = syz - szy
    k02 = szx - sxz
    k03 = sxy - syx
    k11 = sxx - syy - szz
    k12 = sxy + syx
    k13 = szx + sxz
    k22 = -sxx + syy - szz
    k23 = syz + szy
    k33 = -sxx - syy + szz
    row0 = jnp.stack([k00, k01, k02, k03])
    row1 = jnp.stack([k01, k11, k12, k13])
    row2 = jnp.stack([k02, k12, k22, k23])
    row3 = jnp.stack([k03, k13, k23, k33])
    K = jnp.stack([row0, row1, row2, row3])                   # (4, 4)
    sigma = jnp.max(jnp.sum(jnp.abs(K), axis=-1))             # Gershgorin
    # constants must be built in-kernel (Pallas rejects captured arrays)
    eye4 = (jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)).astype(K.dtype)
    Ks = K + (sigma + 1e-6) * eye4

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1).astype(
        jnp.float32)                                          # 0,1,2,3
    q = jnp.where(lane == 0, 1.0, lane * 1e-3)                # (1, 4)

    def body(_, q):
        q = _dot(q, Ks.T)
        return q / jnp.maximum(
            jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True)), 1e-30)

    q = jax.lax.fori_loop(0, pi_iters, body, q)
    w, x, y, z = q[0, 0], q[0, 1], q[0, 2], q[0, 3]
    return jnp.stack([
        jnp.stack([w * w + x * x - y * y - z * z,
                   2 * (x * y - w * z), 2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z),
                   w * w - x * x + y * y - z * z, 2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   w * w - x * x - y * y + z * z]),
    ])                                                        # (3, 3)


def _icp_kernel(src_ref, tgt_ref, pose_ref, out_ref, *,
                iters: int, thresh_sq: float, pi_iters: int):
    src = src_ref[0]                       # (N, 3) f32
    tgt = tgt_ref[0]                       # (M, 3) f32
    N = src.shape[0]
    M = tgt.shape[0]
    R0 = pose_ref[0, :3, :3]               # (3, 3)
    t0 = pose_ref[0, :3, 3:4].T            # (1, 3)

    t_sq = jnp.sum(tgt * tgt, axis=-1)[None, :]              # (1, M)
    colM = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1)
    eye3 = (jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)
            ).astype(jnp.float32)

    def body(_, carry):
        R, t = carry
        moved = _dot(src, R.T) + t                           # (N, 3)
        inner = _dot(moved, tgt.T)                           # (N, M)
        m_sq = jnp.sum(moved * moved, axis=-1, keepdims=True)
        d2 = jnp.maximum(m_sq + t_sq - 2.0 * inner, 1e-12)
        nn_d = jnp.min(d2, axis=1, keepdims=True)            # (N, 1)
        am = jnp.argmin(d2, axis=1).astype(jnp.int32)        # (N,)
        onehot = (colM == am[:, None]).astype(jnp.float32)
        corr = _dot(onehot, tgt)                             # (N, 3)

        w = (nn_d < thresh_sq).astype(jnp.float32)           # (N, 1)
        any_in = jnp.sum(w) > 0
        w = jnp.where(any_in, w, jnp.ones_like(w))

        wsum = jnp.maximum(jnp.sum(w), 1e-12)
        src_mean = _dot(w.T, src) / wsum                     # (1, 3)
        corr_mean = _dot(w.T, corr) / wsum
        src_c = src - src_mean
        corr_c = corr - corr_mean
        cov = jax.lax.dot_general(src_c * w, corr_c,
                                  (((0,), (0,)), ((), ())),
                                  precision=_HI,
                                  preferred_element_type=jnp.float32)
        finite = jnp.all(jnp.isfinite(cov))
        cov = jnp.where(finite, cov, 0.0) + 1e-5 * eye3
        R_new = _horn_pi(cov, pi_iters)
        R_new = jnp.where(finite, R_new, eye3)
        t_new = corr_mean - _dot(src_mean, R_new.T)          # (1, 3)

        ok = any_in
        return (jnp.where(ok, R_new, R), jnp.where(ok, t_new, t))

    R, t = jax.lax.fori_loop(0, iters, body, (R0, t0))
    out_ref[0] = jnp.concatenate([R, t.T], axis=-1)          # (3, 4)


@functools.partial(jax.jit, static_argnames=("iters", "thresh_sq",
                                             "pi_iters", "interpret"))
def icp_pallas(src: jnp.ndarray, tgt: jnp.ndarray, init_pose: jnp.ndarray,
               thresh_sq: float, iters: int = 30, pi_iters: int = 30,
               interpret: bool = False):
    """Fused whole-loop ICP: (B,N,3) src, (B,M,3) tgt, (B,3|4,4) init pose
    -> (rot (B,3,3), trans (B,3)). thresh_sq = threshold^2 (static)."""
    B, N, _ = src.shape
    M = tgt.shape[1]
    pose = jnp.zeros((B, 3, 4), jnp.float32)
    pose = pose.at[:, :3, :3].set(init_pose[..., :3, :3])
    pose = pose.at[:, :3, 3].set(init_pose[..., :3, 3])
    kern = functools.partial(_icp_kernel, iters=iters,
                             thresh_sq=float(thresh_sq), pi_iters=pi_iters)

    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, M, 3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3, 4), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, 4), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, 4), jnp.float32),
        interpret=interpret,
    )(src.astype(jnp.float32), tgt.astype(jnp.float32), pose)
    return out[:, :3, :3], out[:, :3, 3]
