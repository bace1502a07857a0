"""Fused Sinkhorn-EM clustering kernel (Pallas TPU).

The OGMM clustering hot loop (reference lib/utils.py:269-291, our
ops/gmm.py:wkeans_plus) runs `iters` EM trips, each containing a
`sk_iters`-step log-domain Sinkhorn over the (B, N, K) cost block. Composed
from jnp ops, every logsumexp round-trips the (N, K) block through HBM —
~2 * iters * sk_iters passes over B*N*K*4 bytes (≈3.5 GB at the reference
geometry B=24, N=717, K=128). One (N, K) fp32 block is only ~370 KB, far
under the ~16 MB of VMEM, so the whole EM fits on-chip: this kernel grids
over the batch and keeps cost/gamma/u/v resident in VMEM for the entire
nested loop. HBM traffic drops to one read of xyz + one write of
(gamma, pi, nodes).

Semantics match ops/gmm.py:wkeans_plus (jnp composition) step for step:
  E-step  sinkhorn(cost=cdist(xyz,nodes)/tau, p=o_norm, q=1/K, eps, fixed trips)
  gamma   exp(log-plan), nan-guard, row-normalise with 1e-3 clamp
  M-step  pi = mean_n gamma;  nodes = gamma^T xyz / (pi*N + 1e-5)
The EM runs entirely under stop_gradient in the caller (reference
torch.no_grad, lib/utils.py:278-289), so the kernel needs no VJP.

Matmuls use fp32 HIGHEST precision — they contract tiny D=3 axes where
bf16 MXU passes would perturb distances enough to flip cluster assignments.

Numerical note (measured on TPU v5e): one EM trip matches the jnp path to
~5e-6; over 10 trips the two paths drift apart (argmax flips on ~0.2%+ of
points by trip 4) because EM with eps=1e-2 produces near-hard assignments —
any fp reassociation difference is chaotically amplified. Both paths are
equally valid EM trajectories; interpret-mode tests pin exact parity per
trip, and training/eval metrics are what must match, not per-point gammas.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _em_kernel(xyz_ref, o_ref, nodes0_ref, gamma_ref, pi_ref, nodes_ref, *,
               iters: int, sk_iters: int, tau: float, eps: float,
               mxu_lse: bool):
    xyz = xyz_ref[0]                      # (N, 3) f32
    o = o_ref[0]                          # (N, 1)
    N = xyz.shape[0]
    K = nodes0_ref.shape[1]

    log_p = jnp.log(o + 1e-8)                               # (N, 1)
    log_q = jnp.log(1.0 / K + 1e-8)                         # scalar
    x_sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)       # (N, 1)
    ones_row = jnp.ones((8, N), jnp.float32)                # MXU column-sum
    ones_col = jnp.ones((K, 8), jnp.float32)                # MXU row-sum

    def em_body(_, carry):
        nodes, _, _ = carry
        # ---- cost = max(cdist, 0) / tau (ops/gmm.py:119) ----------------
        n_sq = jnp.sum(nodes * nodes, axis=-1)[None, :]      # (1, K)
        inner = jax.lax.dot_general(
            xyz, nodes, (((1,), (1,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)  # (N, K)
        d2 = jnp.maximum(x_sq + n_sq - 2.0 * inner, 1e-12)
        cost = jnp.sqrt(d2) / tau

        # ---- log-domain Sinkhorn, fixed trips (ops/sinkhorn.py) ---------
        # mxu_lse: after a row (column) half-update, that axis of the plan
        # sums to a marginal <= 1, so log-plan entries stay <= 0 and every
        # row max is >= log_p - log K — exp can neither overflow nor fully
        # underflow. Both logsumexps then skip the max-stabiliser and reduce
        # via a ones-matmul on the MXU instead of cross-lane/sublane
        # reduction chains (the kernel's slow direction). The FIRST row
        # update sees the raw -cost/eps (entries down to ~-100 at eps=1e-2)
        # where an unstabilised sum underflows to 0, so trip one runs the
        # stabilised row update; a 1e-38 floor covers pathological
        # rows/columns thereafter (zero-mass points/clusters; gamma's 1e-3
        # row clamp absorbs the difference and u/v recover next trip).
        def row_stab(u, v):
            lk = (-cost + u + v) / eps
            m = jnp.max(lk, axis=1, keepdims=True)
            lse = m + jnp.log(jnp.sum(jnp.exp(lk - m), axis=1, keepdims=True))
            return eps * (log_p - lse) + u

        def col_update(u, v):
            lk = (-cost + u + v) / eps
            if mxu_lse:
                s = jax.lax.dot_general(
                    ones_row, jnp.exp(lk), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (8, K)
                lse = jnp.log(s[0:1] + 1e-38)
            else:
                m = jnp.max(lk, axis=0, keepdims=True)
                lse = m + jnp.log(
                    jnp.sum(jnp.exp(lk - m), axis=0, keepdims=True))
            return eps * (log_q - lse) + v

        u0 = jnp.zeros((N, 1), jnp.float32)
        v0 = jnp.zeros((1, K), jnp.float32)
        u = row_stab(u0, v0)                                 # trip 1: exact
        v = col_update(u, v0)

        if mxu_lse:
            # After trip 1 every row max of the log-plan is >= log_p - log K
            # (representable in fp32), so the remaining trips can run in the
            # DIRECT domain: Sinkhorn scaling is identical whether applied
            # to u/v in log space or multiplicatively to P = exp(log-plan) —
            # each trip becomes two ones-matmul marginal sums + two
            # broadcast multiplies, with ZERO transcendentals (the exp
            # passes were the kernel's largest VPU cost). Fully-underflowed
            # entries (< -87 in the log-plan) scale as exact zeros — the
            # same points the log path floors at 1e-38; gamma's row clamp
            # absorbs them.
            p_t = o + 1e-8                                   # exp(log_p)
            q_t = 1.0 / K + 1e-8                             # exp(log_q)
            P0 = jnp.exp((-cost + u + v) / eps)

            def sk_direct(_, P):
                s = jax.lax.dot_general(
                    P, ones_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (N, 8)
                P = P * (p_t / jnp.maximum(s[:, 0:1], 1e-38))
                c = jax.lax.dot_general(
                    ones_row, P, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (8, K)
                return P * (q_t / jnp.maximum(c[0:1], 1e-38))

            # (unroll=True measured 4.54 vs 4.35 ms at B=48 — the rolled
            # loop is NOT issue-bound; keep it rolled)
            gamma = jax.lax.fori_loop(1, sk_iters, sk_direct, P0)
        else:
            def sk_body(_, uv):
                u, v = uv                                    # (N,1), (1,K)
                u = row_stab(u, v)
                return u, col_update(u, v)

            u, v = jax.lax.fori_loop(1, sk_iters, sk_body, (u, v))
            gamma = jnp.exp((-cost + u + v) / eps)
        gamma = jnp.where(jnp.isfinite(gamma), gamma, 0.0)   # nan_to_num
        gamma = gamma / jnp.maximum(
            jnp.sum(gamma, axis=1, keepdims=True), 1e-3)

        # ---- M-step (gmm_params, lib/utils.py:130-149) ------------------
        pi = jnp.mean(gamma, axis=0)                         # (K,)
        npi = pi * N + 1e-5
        mu = jax.lax.dot_general(
            gamma, xyz, (((0,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)  # (K, 3)
        return mu / npi[:, None], gamma, pi

    carry0 = (nodes0_ref[0],
              jnp.ones((N, K), jnp.float32),
              jnp.full((K,), 1.0 / K, jnp.float32))
    nodes, gamma, pi = jax.lax.fori_loop(0, iters, em_body, carry0)

    gamma_ref[0] = gamma
    pi_ref[0] = pi[:, None]               # (K, 1) — tiling-friendly layout
    nodes_ref[0] = nodes


def _em_kernel_mc(xyz_ref, o_ref, nodes0_ref, gamma_ref, pi_ref, nodes_ref,
                  *, iters: int, sk_iters: int, tau: float, eps: float,
                  C: int):
    """Multi-cloud variant: one grid step runs C clouds' EM chains at once.

    The single-cloud kernel is a serial ~iters*sk_iters chain of SMALL
    (N, K) VMEM ops per grid step — latency-bound, the r4 trace puts it at
    4.33 ms of the 16.6 ms eval forward (profiles/r4/PROFILE.md). Here the
    per-trip ELEMENTWISE updates batch C clouds into one rank-3 (C, N, K)
    instruction stream (1/C the op issues) and the per-cloud marginal
    matmuls unroll back-to-back — C independent dependency chains fill
    each other's MXU/VPU latency. Per-cloud math is IDENTICAL to the C=1
    kernel (same ops, same order, same operands) — parity is exact, tested
    in interpreter mode (tests/test_pallas_em.py).

    Always runs the mxu_lse/direct-domain schedule (the shipped default).
    """
    xyz = xyz_ref[0]                      # (C, N, 3) f32
    o = o_ref[0]                          # (C, N, 1)
    N = xyz.shape[1]
    K = nodes0_ref.shape[2]

    log_p = jnp.log(o + 1e-8)                               # (C, N, 1)
    log_q = jnp.log(1.0 / K + 1e-8)
    x_sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)       # (C, N, 1)
    ones_row = jnp.ones((8, N), jnp.float32)
    ones_col = jnp.ones((K, 8), jnp.float32)
    p_t = o + 1e-8
    q_t = 1.0 / K + 1e-8

    def em_body(_, carry):
        nodes, _, _ = carry                                  # (C, K, 3)
        n_sq = jnp.sum(nodes * nodes, axis=-1)[:, None, :]   # (C, 1, K)
        inner = jnp.stack([
            jax.lax.dot_general(xyz[c], nodes[c], (((1,), (1,)), ((), ())),
                                precision=_HI,
                                preferred_element_type=jnp.float32)
            for c in range(C)])                              # (C, N, K)
        d2 = jnp.maximum(x_sq + n_sq - 2.0 * inner, 1e-12)
        cost = jnp.sqrt(d2) / tau

        # trip 1: stabilised log-domain row update + MXU column lse
        # (same schedule/rationale as the C=1 kernel above)
        lk = -cost / eps
        m = jnp.max(lk, axis=2, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(lk - m), axis=2, keepdims=True))
        u = eps * (log_p - lse)                              # (C, N, 1)
        elk = jnp.exp((-cost + u) / eps)                     # (C, N, K)
        s = jnp.stack([
            jax.lax.dot_general(ones_row, elk[c], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[0:1]
            for c in range(C)])                              # (C, 1, K)
        v = eps * (log_q - jnp.log(s + 1e-38))               # (C, 1, K)

        P0 = jnp.exp((-cost + u + v) / eps)

        def sk_direct(_, P):
            rs = jnp.stack([
                jax.lax.dot_general(P[c], ones_col, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)[:, 0:1]
                for c in range(C)])                          # (C, N, 1)
            P = P * (p_t / jnp.maximum(rs, 1e-38))
            cs = jnp.stack([
                jax.lax.dot_general(ones_row, P[c], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)[0:1]
                for c in range(C)])                          # (C, 1, K)
            return P * (q_t / jnp.maximum(cs, 1e-38))

        gamma = jax.lax.fori_loop(1, sk_iters, sk_direct, P0)
        gamma = jnp.where(jnp.isfinite(gamma), gamma, 0.0)
        gamma = gamma / jnp.maximum(
            jnp.sum(gamma, axis=2, keepdims=True), 1e-3)

        pi = jnp.mean(gamma, axis=1)                         # (C, K)
        npi = pi * N + 1e-5
        mu = jnp.stack([
            jax.lax.dot_general(gamma[c], xyz[c], (((0,), (0,)), ((), ())),
                                precision=_HI,
                                preferred_element_type=jnp.float32)
            for c in range(C)])                              # (C, K, 3)
        return mu / npi[:, :, None], gamma, pi

    carry0 = (nodes0_ref[0],
              jnp.ones((C, N, K), jnp.float32),
              jnp.full((C, K), 1.0 / K, jnp.float32))
    nodes, gamma, pi = jax.lax.fori_loop(0, iters, em_body, carry0)

    gamma_ref[0] = gamma
    pi_ref[0] = pi[:, :, None]
    nodes_ref[0] = nodes


def auto_clouds_per_block(B: int, N: int, K: int) -> int:
    """Largest C in (4, 2, 1) dividing B whose VMEM footprint fits.

    Per-cloud residency ≈ 10 lane-padded (N, max(K,128)) f32 blocks: the
    (N, K) plan/cost/gamma/temps plus the (N, 1) row terms, every one of
    which pads its lane dim to 128 (the r3 lane-padding lesson,
    ops/gmm.py's EM gate). The ~12 MB headroom constant keeps the block
    inside the 16 MB scoped-VMEM budget; C=2/C=4 are bit-exact vs C=1 on
    chip (scripts/verify_r4c.py). Perf across C: RESULTS.md Round-5a
    chip A/B."""
    n_pad = ((N + 7) // 8) * 8
    per_cloud = n_pad * max(K, 128) * 4 * 10
    for c in (4, 2):
        if B % c == 0 and c * per_cloud <= 12 * 2 ** 20:
            return c
    return 1


@functools.partial(jax.jit, static_argnames=("iters", "sk_iters", "tau",
                                             "eps", "mxu_lse", "interpret",
                                             "clouds_per_block"))
def sinkhorn_em(xyz: jnp.ndarray, o_norm: jnp.ndarray, nodes0: jnp.ndarray,
                iters: int = 10, sk_iters: int = 10, tau: float = 1.0,
                eps: float = 1e-2, mxu_lse: bool = True,
                interpret: bool = False, clouds_per_block: int = 1):
    """Fused EM: (B,N,3) xyz, (B,N) normalised marginal, (B,K,3) init nodes
    -> (gamma (B,N,K), pi (B,K), nodes (B,K,3)). No gradient path (caller
    wraps in stop_gradient, mirroring reference torch.no_grad).

    `clouds_per_block` (C): grid over B/C with C clouds' chains interleaved
    per grid step (_em_kernel_mc) — the eval forward's EM pole is
    latency-bound on the per-cloud serial chain, and C>1 amortises it.
    Requires B % C == 0 and mxu_lse; per-cloud results are exactly the
    C=1 kernel's. VMEM scales ~linearly in C (the (N, K) blocks and the
    lane-padded (N, 1) row terms)."""
    B, N, _ = xyz.shape
    K = nodes0.shape[1]
    C = int(clouds_per_block)
    if C > 1:
        if B % C != 0:
            raise ValueError(f"clouds_per_block={C} must divide B={B}")
        if not mxu_lse:
            raise ValueError("clouds_per_block>1 implements only the "
                             "mxu_lse/direct-domain schedule (the default)")
        kern = functools.partial(_em_kernel_mc, iters=iters,
                                 sk_iters=sk_iters, tau=float(tau),
                                 eps=float(eps), C=C)

        def bs4(*shape):
            return pl.BlockSpec(
                (1,) + shape, lambda b: (b,) + (0,) * len(shape),
                memory_space=pltpu.VMEM)

        gamma, pi, nodes = pl.pallas_call(
            kern,
            grid=(B // C,),
            in_specs=[bs4(C, N, 3), bs4(C, N, 1), bs4(C, K, 3)],
            out_specs=(bs4(C, N, K), bs4(C, K, 1), bs4(C, K, 3)),
            out_shape=(jax.ShapeDtypeStruct((B // C, C, N, K), jnp.float32),
                       jax.ShapeDtypeStruct((B // C, C, K, 1), jnp.float32),
                       jax.ShapeDtypeStruct((B // C, C, K, 3), jnp.float32)),
            interpret=interpret,
        )(xyz.astype(jnp.float32).reshape(B // C, C, N, 3),
          o_norm.astype(jnp.float32)[..., None].reshape(B // C, C, N, 1),
          nodes0.astype(jnp.float32).reshape(B // C, C, K, 3))
        return (gamma.reshape(B, N, K), pi.reshape(B, K),
                nodes.reshape(B, K, 3))
    kern = functools.partial(_em_kernel, iters=iters, sk_iters=sk_iters,
                             tau=float(tau), eps=float(eps), mxu_lse=mxu_lse)

    # Mosaic tiling rule: the last two dims of each block must be divisible
    # by (8, 128) or equal the full array dims — so every operand is rank-3
    # (1, rows, cols) with rows/cols equal to the array's, and (B,)-shaped
    # vectors travel as (B, X, 1).
    def bs(*shape):
        return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    gamma, pi, nodes = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[bs(N, 3), bs(N, 1), bs(K, 3)],
        out_specs=(bs(N, K), bs(K, 1), bs(K, 3)),
        out_shape=(jax.ShapeDtypeStruct((B, N, K), jnp.float32),
                   jax.ShapeDtypeStruct((B, K, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, K, 3), jnp.float32)),
        interpret=interpret,
    )(xyz.astype(jnp.float32), o_norm.astype(jnp.float32)[..., None],
      nodes0.astype(jnp.float32))
    return gamma, pi[..., 0], nodes
