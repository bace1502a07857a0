#!/usr/bin/env python
"""On-chip parity gate for the round-5 edges-fused DGCNN eval kernel
(ops/pallas_dgcnn.py:dgcnn_edges_pallas) BEFORE it benches in the default
indoor path — the r4 lesson: CPU interpreter tests are structurally blind
to chip-only numerics (bf16 tie flips, excess precision), so every kernel
newly wired into a default path gates on the chip first.

Checks, compiled on the real chip at the indoor shape (B=2, N=35k, k=20):

  1. edges-fused vs naive jnp composition fed the SAME precomputed graph,
     f32 (should be ~1e-4: identical op sequence, different fusion) and
     bf16 (rounding-order differences only — the whole-cloud fused kernel's
     established tolerance band).
  2. full indoor eval forward (GMMReg bf16) with dgcnn_fused_edges
     True vs False: rotations must agree to geometry-grade tolerance (the
     encoder feeds f32 HIGHEST geometry downstream; a selection/ordering
     bug would swing rotations wildly, bf16 rounding noise must not).

Usage: python scripts/verify_r5c.py [N]
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import indoor
    from ogmm_tpu.nn import GMMReg
    from ogmm_tpu.nn.dgcnn import DGCNN
    from ogmm_tpu.ops.common import knn

    print("platform:", jax.devices()[0].platform, flush=True)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    k = 20
    rs = np.random.RandomState(0)

    def surface(seed, B):
        g = np.random.RandomState(seed)
        u = g.rand(B, N, 2).astype(np.float32)
        z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
        pts = np.concatenate([u, 0.3 * z], axis=-1)
        return jnp.asarray(pts + 0.01 * g.randn(B, N, 3).astype(np.float32))

    # --- 1. encoder parity, same graph --------------------------------------
    x = surface(0, 2)
    idx = jax.jit(lambda a: knn(a, a, k))(x)
    for dt, rtol, atol in (("float32", 1e-4, 1e-4), ("bfloat16", 0.1, 0.05)):
        naive = DGCNN(emb_dims=512, k=k, dtype=None if dt == "float32" else dt,
                      fused=False, fused_edges=False)
        v = naive.init(jax.random.PRNGKey(0), x[:1, :256], train=False)
        fused = DGCNN(emb_dims=512, k=k,
                      dtype=None if dt == "float32" else dt,
                      fused=False, fused_edges=True)
        ref = np.asarray(jax.jit(lambda a, i: naive.apply(v, a, train=False,
                                                          nbr_idx=i))(x, idx),
                         np.float32)
        out = np.asarray(jax.jit(lambda a, i: fused.apply(v, a, train=False,
                                                          nbr_idx=i))(x, idx),
                         np.float32)
        err = np.max(np.abs(out - ref) / (np.abs(ref) + atol))
        print(f"edges-fused encoder ({dt}): max rel err {err:.2e}", flush=True)
        np.testing.assert_allclose(out, ref, rtol=rtol, atol=atol,
                                   err_msg=f"dtype={dt}")

    # --- 2. full indoor forward: rotations agree ----------------------------
    base = indoor().model
    src, tgt = surface(10, 1), surface(11, 1)
    rots = {}
    for fe in (False, True):
        mcfg = dataclasses.replace(base, dtype="bfloat16",
                                   dgcnn_fused_edges=fe)
        gm = GMMReg(cfg=mcfg)
        gv = gm.init({'params': jax.random.PRNGKey(0)}, src, tgt, train=False)
        rot, trans, *_ = jax.jit(
            lambda s, t, _gm=gm, _gv=gv: _gm.apply(_gv, s, t, train=False,
                                                   is_test=False))(src, tgt)
        rots[fe] = (np.asarray(rot, np.float32), np.asarray(trans, np.float32))
        assert np.all(np.isfinite(rots[fe][0])), f"non-finite rot, fe={fe}"
    dR = rots[True][0] @ rots[False][0].transpose(0, 2, 1)
    ang = np.degrees(np.arccos(np.clip(
        (np.einsum('bii->b', dR) - 1) / 2, -1, 1)))
    dt_err = np.max(np.abs(rots[True][1] - rots[False][1]))
    print(f"full fwd rot delta {float(ang.max()):.3f} deg, "
          f"trans delta {dt_err:.2e}", flush=True)
    # identical weights + bf16 rounding-order deltas through the encoder:
    # downstream geometry is f32; a selection bug would blow this up by
    # orders of magnitude
    assert float(ang.max()) < 1.0 and dt_err < 0.02, (ang.max(), dt_err)
    print("verify_r5c: OK")


if __name__ == "__main__":
    main()
