"""Pallas kernels for the differentiable DGCNN training path.

ops/dgcnn_train.py is the jnp numerical reference; these kernels are
tested against it in interpreter mode (tests/test_dgcnn_train_fused.py).

graph_stage1_pallas fuses what the naive training forward spends most of its
HBM time on (profiles/r2/PROFILE.md: kNN kernel 3.9 ms + (B*N*k, 3) edge
gathers 4.2 ms per step): the (TN, N) distance block, the k-pass argmin
neighbour scan, the edge-feature construction, and the stage-1 matmul — per
query tile, all VMEM-resident. Outputs land in the (B, k, N, C) layout the
rest of the fused train path consumes natively.

Unlike the eval kernel (ops/pallas_dgcnn.py) the edge features here are
formed as fp32 (neighbour - query) THEN cast to the compute dtype, matching
the jnp reference's graph_feature + astype order exactly.

Neighbour ordering matches ops/pallas_knn.py (ascending distance,
first-index ties) so the emitted idx is interchangeable with knn().
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _stage1_kernel(xt_ref, xf_ref, w1_ref, z_ref, e_ref, idx_ref, *rest,
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
    colk = jax.lax.broadcasted_iota(jnp.int32, (TN, k), 1)

    dt = dtype
    w1 = w1_ref[:].astype(dt)              # (6, C1)
    idxs = jnp.zeros((TN, k), jnp.int32)

    # posenc_k > 0: emit the PositionEncoding angle features for the first
    # posenc_k trips (same rationale as the eval kernel,
    # ops/pallas_dgcnn.py:_dgcnn_kernel — the standalone angle pass was
    # 1.4 ms of the train step). The gather here is f32 HIGHEST, so the
    # coincident self point gives p2lc exactly 0 -> alpha 0 with no gate.
    if posenc_k:
        alpha_ref = rest[0]
        cen = jnp.sum(t, axis=0, keepdims=True) / N          # (1, 3) f32
        p2gc = q - cen
        g_hat = p2gc / jnp.maximum(
            jnp.sqrt(jnp.sum(p2gc * p2gc, axis=-1, keepdims=True)), 1e-12)
        colp = jax.lax.broadcasted_iota(jnp.int32, (TN, posenc_k), 1)
        alpha = jnp.zeros((TN, posenc_k), jnp.float32)

    # NB: unlike the eval kernel, the gather stays f32 HIGHEST — a bf16
    # one-hot gather (bf16-rounded t before the subtract) perturbs the edge
    # values by ~0.4%, which BN batch-stat gradients amplify enough that the
    # kernel-vs-jnp parity contract can no longer be bounded tightly
    # (measured up to ~40% of max-scale on single grad elements). Training
    # keeps the exact jnp-reference semantics; the ~2 ms/step it would buy
    # is not worth the looser contract.
    for j in range(k):                     # unrolled: static stack slots
        am = jnp.argmin(d2, axis=1).astype(jnp.int32)        # (TN,)
        hit = col == am[:, None]
        onehot = hit.astype(jnp.float32)
        nbr = jax.lax.dot_general(onehot, t, (((1,), (0,)), ((), ())),
                                  precision=_HI,
                                  preferred_element_type=jnp.float32)
        e_j = jnp.concatenate([nbr - q, q], axis=-1).astype(dt)  # (TN, 6)
        z_j = jax.lax.dot_general(e_j, w1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        z_ref[0, j] = z_j.astype(dt)
        e_ref[0, j] = e_j
        idxs = jnp.where(colk == j, am[:, None], idxs)
        if posenc_k and j < posenc_k:
            p2lc = nbr - q                                   # (TN, 3) f32
            l_hat = p2lc / jnp.maximum(
                jnp.sqrt(jnp.sum(p2lc * p2lc, axis=-1, keepdims=True)),
                1e-12)
            a_j = jnp.sum(l_hat * g_hat, axis=-1)            # (TN,)
            alpha = jnp.where(colp == j, a_j[:, None], alpha)
        d2 = jnp.where(hit, jnp.inf, d2)

    idx_ref[0] = idxs
    if posenc_k:
        alpha_ref[0] = alpha


def _row_mask(tile_n: int, n_valid: int):
    """(TN, 1) bool: rows of this program's tile that exist in the array."""
    i = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0)
    return rows + i * tile_n < n_valid


def _bn_y(z, mean, var, gamma, beta, dt):
    inv = jax.lax.rsqrt(var + 1e-5)
    return (z - mean.astype(dt)) * (inv * gamma).astype(dt) + beta.astype(dt)


def _relu_vjp(g, y):
    # comparisons in f32: Mosaic on v5e rejects bf16 cmpf (lossless cast)
    y32 = y.astype(jnp.float32)
    half = jnp.asarray(0.5, g.dtype)
    return jnp.where(y32 > 0, g, jnp.where(y32 == 0, half * g,
                                           jnp.zeros((), g.dtype)))


def _dy_tile(z_ref, dtap_ref, m_ref, g_ref, b_ref, dt,
             extra_dh=None):
    """Recompute h, apply max-over-k VJP (+ optional dh from the next
    stage's dz @ W^T), relu VJP -> dy (k, TN, C) in compute dtype.

    The max-VJP mask is an integer argmax one-hot over the in-tile k axis
    (ties -> first index, matching ops/dgcnn_train._max_vjp): float-equality
    masks against recomputed values are unsafe under XLA excess precision
    (empty mask -> 0/0 -> NaN, observed on chip), and Mosaic on v5e has no
    bf16 cmpf anyway."""
    z = z_ref[0].astype(dt)                      # (k, TN, C)
    mean = m_ref[0, 0]
    var = m_ref[0, 1]
    y = _bn_y(z, mean, var, g_ref[0], b_ref[0], dt)
    h32 = jnp.maximum(y, 0).astype(jnp.float32)
    am = jnp.argmax(h32, axis=0)                 # (TN, C)
    iota = jax.lax.broadcasted_iota(jnp.int32, h32.shape, 0)
    mask = (iota == am[None]).astype(dt)
    dh = dtap_ref[0].astype(dt)[None] * mask
    if extra_dh is not None:
        dh = dh + extra_dh
    return _relu_vjp(dh, y), z


def _masked32(v, valid):
    return jnp.where(valid, v.astype(jnp.float32), 0.0)


def _bwd_reduce_kernel(z_ref, dtap_ref, m_ref, g_ref, b_ref,
                       s_ref, *, dt, n_valid: int, tile_n: int):
    """S1 = sum(dy), S2 = sum(dy * zhat) for the LAST stage (no dz_next)."""
    dy, z = _dy_tile(z_ref, dtap_ref, m_ref, g_ref, b_ref, dt)
    valid = _row_mask(tile_n, n_valid)[None]     # (1, TN, 1)
    mean = m_ref[0, 0]
    inv = jax.lax.rsqrt(m_ref[0, 1] + 1e-5)
    dy32 = _masked32(dy, valid)
    zhat32 = _masked32((z.astype(jnp.float32) - mean) * inv, valid)
    s1 = dy32.sum(axis=(0, 1))
    s2 = (dy32 * zhat32).sum(axis=(0, 1))
    part = jnp.stack([s1, s2])                   # (2, C)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        s_ref[0] = jnp.zeros_like(s_ref[0])
    s_ref[0] += part


def _bwd_stage_kernel(z_ref, dtap_ref, m_ref, g_ref, b_ref,
                      s_ref, w_ref, zp_ref, mp_ref, gp_ref, bp_ref,
                      dtapp_ref, *args,
                      dt, n_valid: int, tile_n: int, m_count: float,
                      has_next: bool):
    """One backward stage i (4..2): given finalized (S1_i, S2_i) compute
    dz_i, accumulate dW_i = h_{i-1}^T dz_i, and the previous stage's
    (S1, S2) partials.

    args: [dznext_ref, wnext_ref,] dz_ref, dw_ref, sp_ref
    """
    if has_next:
        dznext_ref, wnext_ref, dz_ref, dw_ref, sp_ref = args
        dzn = dznext_ref[0].astype(dt)           # (k, TN, Cn)
        wn = wnext_ref[:].astype(dt)             # (C, Cn)
        kk, TN, _ = dzn.shape
        extra = jax.lax.dot_general(
            dzn.reshape(kk * TN, -1), wn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt).reshape(
                kk, TN, -1)
    else:
        dz_ref, dw_ref, sp_ref = args
        extra = None

    dy, z = _dy_tile(z_ref, dtap_ref, m_ref, g_ref, b_ref, dt,
                     extra_dh=extra)
    valid = _row_mask(tile_n, n_valid)[None]     # (1, TN, 1)
    mean = m_ref[0, 0]
    inv = jax.lax.rsqrt(m_ref[0, 1] + 1e-5)
    gamma = g_ref[0]
    s1 = s_ref[0, 0]
    s2 = s_ref[0, 1]
    zhat32 = _masked32((z.astype(jnp.float32) - mean) * inv, valid)
    dy32 = dy.astype(jnp.float32)
    dz32 = (inv * gamma) * (dy32 - s1 / m_count - zhat32 * (s2 / m_count))
    dz = dz32.astype(dt)
    dz_ref[0] = dz

    # ---- dW_i = h_{i-1}^T dz_i (masked rows excluded) ----------------------
    zp = zp_ref[0].astype(dt)                    # (k, TN, Cin)
    yp = _bn_y(zp, mp_ref[0, 0], mp_ref[0, 1], gp_ref[0], bp_ref[0], dt)
    hp = jnp.where(valid, jnp.maximum(yp, 0), jnp.zeros((), dt))
    kk, TN, cin = hp.shape
    dz_m = jnp.where(valid, dz, jnp.zeros((), dt))
    dw = jax.lax.dot_general(
        hp.reshape(kk * TN, cin), dz_m.reshape(kk * TN, -1),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # ---- previous stage's (S1, S2) partials ---------------------------------
    w_i = w_ref[:].astype(dt)                    # (Cin, C)
    dhp = jax.lax.dot_general(
        dz.reshape(kk * TN, -1), w_i, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt).reshape(kk, TN, cin)
    amp = jnp.argmax(hp.astype(jnp.float32), axis=0)
    iotap = jax.lax.broadcasted_iota(jnp.int32, hp.shape, 0)
    maskp = (iotap == amp[None]).astype(dt)
    dhp = dhp + dtapp_ref[0].astype(dt)[None] * maskp
    dyp = _relu_vjp(dhp, yp)
    dyp32 = _masked32(dyp, valid)
    invp = jax.lax.rsqrt(mp_ref[0, 1] + 1e-5)
    zhatp32 = _masked32((zp.astype(jnp.float32) - mp_ref[0, 0]) * invp, valid)
    partp = jnp.stack([dyp32.sum(axis=(0, 1)),
                       (dyp32 * zhatp32).sum(axis=(0, 1))])

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        sp_ref[0] = jnp.zeros_like(sp_ref[0])
    dw_ref[:] += dw
    sp_ref[0] += partp


def _bwd_edge_kernel(z_ref, dtap_ref, m_ref, g_ref, b_ref,
                     s_ref, dznext_ref, wnext_ref, e_ref, w1_ref, idx_ref,
                     dw_ref, dq_ref, dscat_ref, *,
                     dt, n_valid: int, tile_n: int, m_count: float, k: int):
    """Stage-1 backward: dz1 -> dW1, and the edge-feature VJP
    (dq per-tile rows + neighbour scatter accumulated per cloud)."""
    dzn = dznext_ref[0].astype(dt)               # (k, TN, C2)
    wn = wnext_ref[:].astype(dt)                 # (C1, C2)
    kk, TN, _ = dzn.shape
    extra = jax.lax.dot_general(
        dzn.reshape(kk * TN, -1), wn, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt).reshape(kk, TN, -1)
    dy, z = _dy_tile(z_ref, dtap_ref, m_ref, g_ref, b_ref, dt,
                     extra_dh=extra)
    valid = _row_mask(tile_n, n_valid)[None]
    mean = m_ref[0, 0]
    inv = jax.lax.rsqrt(m_ref[0, 1] + 1e-5)
    zhat32 = _masked32((z.astype(jnp.float32) - mean) * inv, valid)
    dy32 = dy.astype(jnp.float32)
    dz32 = ((inv * g_ref[0])
            * (dy32 - s_ref[0, 0] / m_count - zhat32 * (s_ref[0, 1] / m_count)))
    dz = jnp.where(valid, dz32.astype(dt), jnp.zeros((), dt))

    e = jnp.where(valid, e_ref[0].astype(dt), jnp.zeros((), dt))  # (k, TN, 6)
    dw = jax.lax.dot_general(
        e.reshape(kk * TN, 6), dz.reshape(kk * TN, -1),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    w1 = w1_ref[:].astype(dt)                    # (6, C1)
    de = jax.lax.dot_general(
        dz.reshape(kk * TN, -1), w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(kk, TN, 6)  # fp32
    dneigh = de[..., :3]                         # (k, TN, 3)
    dq_ref[0] = (de[..., 3:] - de[..., :3]).sum(axis=0)

    # neighbour scatter: sum_j onehot_j^T @ dneigh_j into the (N, 3) cloud
    N = dscat_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (TN, N), 1)
    idx = idx_ref[0]                             # (TN, k)
    acc = jnp.zeros((N, 3), jnp.float32)
    for j in range(k):
        onehot = (col == idx[:, j][:, None]).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            onehot, dneigh[j].astype(jnp.float32),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init_dw():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(pl.program_id(1) == 0)
    def _init_dscat():
        dscat_ref[0] = jnp.zeros_like(dscat_ref[0])

    dw_ref[:] += dw
    dscat_ref[0] += acc


def _full_spec(arr):
    nd = arr.ndim
    return pl.BlockSpec(arr.shape, lambda b, i, _n=nd: (0,) * _n,
                        memory_space=pltpu.VMEM)


def _edge_specs(tile_n, k, C):
    """(z, dtap) block specs for a (B,k,N,C) stage + its (B,N,C) tap grad."""
    return [pl.BlockSpec((1, k, tile_n, C), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)]


def _pack_stats(mean, var):
    return jnp.stack([mean, var])[None].astype(jnp.float32)   # (1, 2, C)


@functools.partial(jax.jit, static_argnames=("tile_n", "dtype", "interpret"))
def bwd_reduce_pallas(z, dtap, mean, var, gamma, beta,
                      tile_n: int = 128, dtype=jnp.bfloat16,
                      interpret: bool = False):
    """(S1, S2) = (sum dy, sum dy*zhat) for the last edge stage -> (2, C)."""
    B, k, N, C = z.shape
    dt = jnp.dtype(dtype)
    tile_n = min(tile_n, N)
    mv = _pack_stats(mean, var)
    g2, b2 = gamma[None].astype(jnp.float32), beta[None].astype(jnp.float32)
    kern = functools.partial(_bwd_reduce_kernel, dt=dt, n_valid=N,
                             tile_n=tile_n)
    s = pl.pallas_call(
        kern,
        grid=(B, pl.cdiv(N, tile_n)),
        in_specs=_edge_specs(tile_n, k, C) + [_full_spec(mv), _full_spec(g2),
                                              _full_spec(b2)],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2, C), jnp.float32),
        interpret=interpret,
    )(z, dtap, mv, g2, b2)
    return s[0]


@functools.partial(jax.jit, static_argnames=("tile_n", "dtype", "interpret"))
def bwd_stage_pallas(z, dtap, mean, var, gamma, beta, s12, w_i,
                     zp, meanp, varp, gammap, betap, dtapp,
                     dznext=None, wnext=None,
                     tile_n: int = 128, dtype=jnp.bfloat16,
                     interpret: bool = False):
    """Backward for one edge stage i: (dz_i, dW_i, (S1,S2) of stage i-1).

    dznext/wnext absent for the last stage (its dh comes only from the tap).
    """
    B, k, N, C = z.shape
    cin = zp.shape[-1]
    dt = jnp.dtype(dtype)
    tile_n = min(tile_n, N)
    mv = _pack_stats(mean, var)
    mvp = _pack_stats(meanp, varp)
    g2, b2 = gamma[None].astype(jnp.float32), beta[None].astype(jnp.float32)
    gp2, bp2 = gammap[None].astype(jnp.float32), betap[None].astype(jnp.float32)
    s2 = s12[None].astype(jnp.float32)
    has_next = dznext is not None
    kern = functools.partial(_bwd_stage_kernel, dt=dt, n_valid=N,
                             tile_n=tile_n, m_count=float(B * k * N),
                             has_next=has_next)
    specs = (_edge_specs(tile_n, k, C)
             + [_full_spec(mv), _full_spec(g2), _full_spec(b2),
                _full_spec(s2), _full_spec(w_i)]
             + [pl.BlockSpec((1, k, tile_n, cin), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
                _full_spec(mvp), _full_spec(gp2), _full_spec(bp2)]
             + _edge_specs(tile_n, k, cin)[1:])
    ops = [z, dtap, mv, g2, b2, s2, w_i.astype(jnp.float32),
           zp, mvp, gp2, bp2, dtapp]
    if has_next:
        cn = dznext.shape[-1]
        specs += [pl.BlockSpec((1, k, tile_n, cn), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
                  _full_spec(wnext)]
        ops += [dznext, wnext.astype(jnp.float32)]
    dz, dw, sp = pl.pallas_call(
        kern,
        grid=(B, pl.cdiv(N, tile_n)),
        in_specs=specs,
        out_specs=(pl.BlockSpec((1, k, tile_n, C), lambda b, i: (b, 0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((cin, C), lambda b, i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 2, cin), lambda b, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, k, N, C), dt),
                   jax.ShapeDtypeStruct((cin, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2, cin), jnp.float32)),
        interpret=interpret,
    )(*ops)
    return dz, dw, sp[0]


@functools.partial(jax.jit, static_argnames=("tile_n", "dtype", "interpret"))
def bwd_edge_pallas(z1, dtap1, mean1, var1, gamma1, beta1, s12,
                    dz2, w2, e, w1, idx,
                    tile_n: int = 128, dtype=jnp.bfloat16,
                    interpret: bool = False):
    """Stage-1 backward: (dW1 (6,C1), dq (B,N,3) f32, dscat (B,N,3) f32).

    dx = dq + dscat (the caller adds them; both fp32)."""
    B, k, N, C = z1.shape
    dt = jnp.dtype(dtype)
    tile_n = min(tile_n, N)
    mv = _pack_stats(mean1, var1)
    g2, b2 = gamma1[None].astype(jnp.float32), beta1[None].astype(jnp.float32)
    s2 = s12[None].astype(jnp.float32)
    cn = dz2.shape[-1]
    kern = functools.partial(_bwd_edge_kernel, dt=dt, n_valid=N,
                             tile_n=tile_n, m_count=float(B * k * N), k=k)
    dw, dq, dscat = pl.pallas_call(
        kern,
        grid=(B, pl.cdiv(N, tile_n)),
        in_specs=(_edge_specs(tile_n, k, C)
                  + [_full_spec(mv), _full_spec(g2), _full_spec(b2),
                     _full_spec(s2),
                     pl.BlockSpec((1, k, tile_n, cn),
                                  lambda b, i: (b, 0, i, 0),
                                  memory_space=pltpu.VMEM),
                     _full_spec(w2),
                     pl.BlockSpec((1, k, tile_n, 6),
                                  lambda b, i: (b, 0, i, 0),
                                  memory_space=pltpu.VMEM),
                     _full_spec(w1),
                     pl.BlockSpec((1, tile_n, k), lambda b, i: (b, i, 0),
                                  memory_space=pltpu.VMEM)]),
        out_specs=(pl.BlockSpec((6, C), lambda b, i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile_n, 3), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, N, 3), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((6, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, 3), jnp.float32)),
        interpret=interpret,
    )(z1, dtap1, mv, g2, b2, s2, dz2, w2.astype(jnp.float32),
      e, w1.astype(jnp.float32), idx)
    return dw, dq, dscat


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "dtype",
                                             "interpret", "posenc_k"))
def graph_stage1_pallas(x: jnp.ndarray, w1: jnp.ndarray, k: int = 20,
                        tile_n: int = 128, dtype=jnp.bfloat16,
                        interpret: bool = False, posenc_k: int = 0):
    """Fused kNN graph + edge features + stage-1 matmul (training forward).

    x: (B, N, 3) fp32; w1: (6, C1) fp32.
    Returns (z1 (B,k,N,C1) `dtype` pre-BN, e (B,k,N,6) `dtype`,
             idx (B,N,k) int32). With posenc_k > 0, also the
    PositionEncoding angle features alpha (B, N, posenc_k) f32 for the
    selection prefix (see _stage1_kernel) — return becomes
    (z1, e, idx, alpha).
    """
    B, N, _ = x.shape
    if posenc_k > k:
        raise ValueError(f"posenc_k={posenc_k} must be <= k={k}")
    C1 = w1.shape[1]
    dt = jnp.dtype(dtype)
    tile_n = min(tile_n, N)
    grid = (B, pl.cdiv(N, tile_n))
    kern = functools.partial(_stage1_kernel, k=k, dtype=dt,
                             posenc_k=posenc_k)
    out_specs = [pl.BlockSpec((1, k, tile_n, C1),
                              lambda b, i: (b, 0, i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, k, tile_n, 6),
                              lambda b, i: (b, 0, i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, tile_n, k), lambda b, i: (b, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, k, N, C1), dt),
                 jax.ShapeDtypeStruct((B, k, N, 6), dt),
                 jax.ShapeDtypeStruct((B, N, k), jnp.int32)]
    if posenc_k:
        out_specs.append(pl.BlockSpec((1, tile_n, posenc_k),
                                      lambda b, i: (b, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, N, posenc_k),
                                              jnp.float32))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_n, 3), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N, 3), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(w1.shape, lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(x.astype(jnp.float32), x.astype(jnp.float32), w1.astype(jnp.float32))
    return out
