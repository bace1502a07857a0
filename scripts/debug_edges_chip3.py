#!/usr/bin/env python
"""Third r5c isolate: the vspace+edges FULL indoor forward crashes the TPU
worker (verify_r5c section 4), while the standalone edges kernel at the
same shape is fine (section 2, debug_edges_chip). Bisect the enclosing
jit: run progressively larger sub-graphs of the encode() path at the
failing operating point (B=1, N=35000, bf16).

  [a] knn_self_vspace -> gather -> dgcnn_edges_pallas -> unsort
  [b] [a] + posenc_alpha from the shared gather (the full encode())
  [c] DGCNN.apply with nbr_xyz from the vspace gather (adds BN folding
      inside the jit)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.nn.dgcnn import DGCNN
    from ogmm_tpu.ops.common import (gather_neighbors, knn_self_vspace,
                                     posenc_alpha)
    from ogmm_tpu.ops.pallas_dgcnn import dgcnn_edges_pallas

    print("platform:", jax.devices()[0].platform, flush=True)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    B, k = 1, 20

    g = np.random.RandomState(0)
    u = g.rand(B, N, 2).astype(np.float32)
    z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
    pts = np.concatenate([u, 0.3 * z], axis=-1)
    x = jnp.asarray(pts + 0.01 * g.randn(B, N, 3).astype(np.float32))

    dims = [(6, 64), (64, 64), (64, 128), (128, 256), (512, 512)]
    weights = [jnp.asarray(g.randn(a, b).astype(np.float32) * 0.2)
               for a, b in dims]
    affines = [(jnp.asarray(1.0 + 0.1 * g.randn(b).astype(np.float32)),
                jnp.asarray(0.1 * g.randn(b).astype(np.float32)))
               for _, b in dims]

    @jax.jit
    def sub_a(a):
        xs, idx, inv = knn_self_vspace(a, k)
        nbr = gather_neighbors(xs, idx)
        f = dgcnn_edges_pallas(xs, nbr, weights, affines, k=k,
                               dtype=jnp.bfloat16)
        if inv is not None:
            f = jnp.take_along_axis(f, inv[..., None], axis=1)
        return f.astype(jnp.float32).sum()

    print("[a] vspace->gather->edges->unsort ...", flush=True)
    print("    ok:", float(sub_a(x)), flush=True)

    @jax.jit
    def sub_b(a):
        xs, idx, inv = knn_self_vspace(a, k)
        nbr = gather_neighbors(xs, idx)
        f = dgcnn_edges_pallas(xs, nbr, weights, affines, k=k,
                               dtype=jnp.bfloat16)
        al = posenc_alpha(xs, nbr[:, :, :5])
        if inv is not None:
            f = jnp.take_along_axis(f, inv[..., None], axis=1)
            al = jnp.take_along_axis(al, inv[..., None], axis=1)
        return f.astype(jnp.float32).sum() + al.sum()

    print("[b] + shared-gather alpha ...", flush=True)
    print("    ok:", float(sub_b(x)), flush=True)

    m = DGCNN(emb_dims=512, k=k, dtype="bfloat16", fused=False,
              fused_edges=True)
    v = DGCNN(emb_dims=512, k=k, dtype=None, fused=False,
              fused_edges=False).init(jax.random.PRNGKey(0), x[:, :256],
                                      train=False)

    @jax.jit
    def sub_c(a):
        xs, idx, inv = knn_self_vspace(a, k)
        nbr = gather_neighbors(xs, idx)
        f, al = m.apply(v, xs, train=False, nbr_xyz=nbr,
                        with_posenc_alpha=5)
        f = jnp.take_along_axis(f, inv[..., None], axis=1)
        return f.astype(jnp.float32).sum() + al.sum()

    print("[c] DGCNN.apply(nbr_xyz) with BN folding in-jit ...", flush=True)
    print("    ok:", float(sub_c(x)), flush=True)


if __name__ == "__main__":
    main()
