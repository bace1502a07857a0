#!/usr/bin/env python
"""On-chip parity of the round-4 kernel additions (compiled, not interpret):

  1. sinkhorn_em clouds_per_block=2/4 vs C=1 — per-cloud math is op-for-op
     identical, so chip results should match to fp noise (the kernels run
     the same op sequence; only instruction batching differs).
  2. the fused DGCNN eval kernel's emitted pos-enc alpha vs the standalone
     posenc_angles_pallas — near-exact in BOTH dtypes since the r5 fix
     (the angle prefix always gathers coordinates f32 HIGHEST; the r4
     bf16-coordinate path failed this gate at max err 1.0 on chip).
  3. graph_stage1_pallas posenc_k alpha vs the standalone kernel (f32
     gather -> near-exact).

Usage: python scripts/verify_r4c.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.ops.common import index_points
    from ogmm_tpu.ops.fps import farthest_point_sample
    from ogmm_tpu.ops.pallas_em import sinkhorn_em
    from ogmm_tpu.ops.pallas_dgcnn import dgcnn_eval_pallas
    from ogmm_tpu.ops.pallas_dgcnn_train import graph_stage1_pallas
    from ogmm_tpu.ops.pallas_knn import posenc_angles_pallas

    print("platform:", jax.devices()[0].platform, flush=True)
    rs = np.random.RandomState(0)

    # --- 1. EM multi-cloud ------------------------------------------------
    B, N, K = 8, 717, 128
    xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.4)
    o = jnp.asarray(rs.rand(B, N).astype(np.float32))
    o = o / o.sum(axis=-1, keepdims=True)
    ids = farthest_point_sample(xyz, K, is_center=True)
    nodes0 = index_points(xyz, ids)
    g1, pi1, n1 = sinkhorn_em(xyz, o, nodes0, iters=10, sk_iters=10)
    for C in (2, 4):
        gC, piC, nC = sinkhorn_em(xyz, o, nodes0, iters=10, sk_iters=10,
                                  clouds_per_block=C)
        errs = {k_: float(jnp.max(jnp.abs(a - b))) for k_, a, b in
                (("gamma", gC, g1), ("pi", piC, pi1), ("nodes", nC, n1))}
        print(f"EM C={C} vs C=1:", errs, flush=True)
        assert errs["gamma"] < 1e-5 and errs["nodes"] < 1e-4, errs

    # --- 2. eval-kernel alpha ----------------------------------------------
    ws = [jnp.asarray(rs.randn(*s).astype(np.float32) * 0.1)
          for s in ((6, 64), (64, 64), (64, 128), (128, 256), (512, 512))]
    affines = [(jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32))
               for c in (64, 64, 128, 256, 512)]
    x = xyz[:2]
    ref = posenc_angles_pallas(x, 5)
    for dt, tol in ((jnp.float32, 1e-4), (jnp.bfloat16, 1e-4)):
        _, alpha = dgcnn_eval_pallas(x, ws, affines, k=20, dtype=dt,
                                     posenc_k=5)
        err = float(jnp.max(jnp.abs(alpha - ref)))
        print(f"eval-kernel alpha ({jnp.dtype(dt).name}): max err {err:.2e}",
              flush=True)
        assert err < tol, err

    # --- 3. train-kernel alpha ----------------------------------------------
    _, _, _, alpha_t = graph_stage1_pallas(x, ws[0], k=20,
                                           dtype=jnp.bfloat16, posenc_k=5)
    err = float(jnp.max(jnp.abs(alpha_t - ref)))
    print(f"stage1-kernel alpha: max err {err:.2e}", flush=True)
    assert err < 1e-4, err
    print("verify_r4c: OK")


if __name__ == "__main__":
    main()
