#!/usr/bin/env python
"""On-chip parity gate for the round-5c large-N path changes BEFORE they
bench in the default indoor configuration — the r4 lesson: CPU interpreter
tests are structurally blind to chip-only numerics (bf16 tie flips, excess
precision), so everything newly wired into a default path gates on the
chip first.

Gates, compiled on the real chip at the indoor shape (N=35k, k=20):

  1. v-space graph equivalence: gathering COORDINATES through the
     Morton-sorted graph (knn_self_vspace) and un-sorting the result must
     equal gathering through knn_self_spatial's original-order graph,
     bit-for-bit (same kernel underneath — this checks the new plumbing,
     at full shape, on real Mosaic output).
  2. edges-fused encoder vs the naive jnp composition fed the SAME
     precomputed graph:
       f32: identical op sequence, different fusion/BN-fold order — 1e-4.
       bf16: fold order makes per-element max deltas unbounded at ReLU
       boundaries, so the bar is truth-anchored: the kernel's bf16 output
       must sit as close to the f32 truth as the naive bf16 output does
       (mean and p99 of relative deviation, factor-2 margin).
  3. shared-gather alpha vs the r4 control path's alpha (pos_enc's own
     prefix gather through the original-order graph): same f32
     coordinates, same math -> 1e-5.
  4. full indoor eval forward (GMMReg bf16): r4 control routing
     (dgcnn_vspace=False, fused_edges off) vs v-space vs
     v-space+fused-edges — rotations must agree to geometry-grade
     tolerance (identical weights; only bf16 rounding order may differ).

Usage: python scripts/verify_r5c.py [N]
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def surface(seed, B, N):
    g = np.random.RandomState(seed)
    u = g.rand(B, N, 2).astype(np.float32)
    z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
    pts = np.concatenate([u, 0.3 * z], axis=-1)
    return pts + 0.01 * g.randn(B, N, 3).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import indoor
    from ogmm_tpu.nn import GMMReg
    from ogmm_tpu.nn.dgcnn import DGCNN
    from ogmm_tpu.ops.common import gather_neighbors, posenc_alpha
    from ogmm_tpu.ops.pallas_stream import (knn_self_spatial,
                                            knn_self_vspace)

    print("platform:", jax.devices()[0].platform, flush=True)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    k = 20

    # --- 1. v-space coordinate-gather equivalence at full shape -----------
    x = jnp.asarray(surface(0, 2, N))
    B = 2

    @jax.jit
    def vspace_nbr(a):
        xs, idx_s, inv = knn_self_vspace(a, k)
        nbr_s = gather_neighbors(xs, idx_s)
        return jnp.take_along_axis(nbr_s.reshape(B, N, -1),
                                   inv[..., None], axis=1).reshape(B, N, k, 3)

    @jax.jit
    def spatial_nbr(a):
        return gather_neighbors(a, knn_self_spatial(a, k))

    nv = np.asarray(vspace_nbr(x))
    ns = np.asarray(spatial_nbr(x))
    mism = np.mean(np.any(nv != ns, axis=-1))
    print(f"vspace gather equivalence: mismatching entries {mism:.2e}",
          flush=True)
    assert mism == 0.0, mism

    # --- 2. edges-fused encoder vs naive, same graph ----------------------
    idx = jax.jit(lambda a: knn_self_spatial(a, k))(x)

    def enc(dt, fused_edges):
        m = DGCNN(emb_dims=512, k=k, dtype=dt, fused=False,
                  fused_edges=fused_edges)
        if dt is None and fused_edges is False and not hasattr(enc, "_v"):
            enc._v = m.init(jax.random.PRNGKey(0), x[:1, :256], train=False)
        return np.asarray(jax.jit(
            lambda a, i: m.apply(enc._v, a, train=False, nbr_idx=i))(x, idx),
            np.float32)

    truth = enc(None, False)
    f32k = enc(None, True)
    err = np.max(np.abs(f32k - truth) / (np.abs(truth) + 1e-4))
    print(f"edges-fused encoder (float32): max rel err {err:.2e}", flush=True)
    assert err < 1e-4, err

    naive16 = enc("bfloat16", False)
    kern16 = enc("bfloat16", True)

    def dev(a):
        d = np.abs(a - truth) / (np.abs(truth) + 0.05)
        return float(d.mean()), float(np.percentile(d, 99))

    nm, np99 = dev(naive16)
    km, kp99 = dev(kern16)
    print(f"edges-fused encoder (bf16 vs f32 truth): kernel mean/p99 "
          f"{km:.2e}/{kp99:.2e}, naive {nm:.2e}/{np99:.2e}", flush=True)
    assert km <= max(2.0 * nm, 0.01) and kp99 <= max(2.0 * np99, 0.05), (
        (km, nm), (kp99, np99))

    # --- 3. shared-gather alpha vs the control alpha -----------------------
    a_shared = np.asarray(jax.jit(
        lambda a: posenc_alpha(a, vspace_nbr(a)[:, :, :5]))(x))
    a_ctrl = np.asarray(jax.jit(
        lambda a: posenc_alpha(a, spatial_nbr(a)[:, :, :5]))(x))
    aerr = np.max(np.abs(a_shared - a_ctrl))
    print(f"shared-gather alpha vs control: max err {aerr:.2e}", flush=True)
    assert aerr < 1e-5, aerr

    # --- 4. full indoor forward: rotations agree across routings ----------
    base = indoor().model
    src = jnp.asarray(surface(10, 1, N))
    tgt = jnp.asarray(surface(11, 1, N))
    outs = {}
    variants = {
        "r4-control": dict(dgcnn_vspace=False, dgcnn_fused_edges=False),
        "vspace": dict(dgcnn_vspace=True, dgcnn_fused_edges=False),
        "vspace+edges": dict(dgcnn_vspace=True, dgcnn_fused_edges=True),
    }
    for name, kw in variants.items():
        mcfg = dataclasses.replace(base, dtype="bfloat16", **kw)
        gm = GMMReg(cfg=mcfg)
        if "gv" not in outs:
            outs["gv"] = gm.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                                 train=False)
        rot, trans, *_ = jax.jit(
            lambda s, t, _gm=gm: _gm.apply(outs["gv"], s, t, train=False,
                                           is_test=False))(src, tgt)
        outs[name] = (np.asarray(rot, np.float32),
                      np.asarray(trans, np.float32))
        assert np.all(np.isfinite(outs[name][0])), f"non-finite rot: {name}"
    ref_r, ref_t = outs["r4-control"]
    for name in ("vspace", "vspace+edges"):
        dR = outs[name][0] @ ref_r.transpose(0, 2, 1)
        ang = np.degrees(np.arccos(np.clip(
            (np.einsum('bii->b', dR) - 1) / 2, -1, 1)))
        dt_err = np.max(np.abs(outs[name][1] - ref_t))
        print(f"full fwd {name} vs control: rot delta "
              f"{float(ang.max()):.3f} deg, trans delta {dt_err:.2e}",
              flush=True)
        # identical weights; vspace is the same math (fp reduction order
        # only), edges adds bf16 rounding-order deltas through the encoder.
        # Downstream geometry is f32 — a selection/ordering bug would blow
        # this up by orders of magnitude.
        bar = 0.05 if name == "vspace" else 1.0
        assert float(ang.max()) < bar and dt_err < 0.02, (name, ang.max(),
                                                          dt_err)
    print("verify_r5c: OK")


if __name__ == "__main__":
    main()
