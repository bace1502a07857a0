#!/usr/bin/env python
"""Isolate the r5c edges-kernel chip failure (gate: f32 max rel err 17 at
N=35000 vs the naive composition, while CPU interpreter tests pass).

A/B: dgcnn_edges_pallas Mosaic vs interpret=True on identical inputs,
sweeping N over {1024, 4096, 34944 (divisible by 128), 35000 (padded
tail)} and B in {1, 2}, f32. Pinpoints padding vs fundamental lowering.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.ops.common import gather_neighbors, knn
    from ogmm_tpu.ops.pallas_dgcnn import dgcnn_edges_pallas

    print("platform:", jax.devices()[0].platform, flush=True)
    k = 20
    g = np.random.RandomState(0)
    dims = [(6, 64), (64, 64), (64, 128), (128, 256), (512, 512)]
    weights = [jnp.asarray(g.randn(a, b).astype(np.float32) * 0.2)
               for a, b in dims]
    affines = [(jnp.asarray(1.0 + 0.1 * g.randn(b).astype(np.float32)),
                jnp.asarray(0.1 * g.randn(b).astype(np.float32)))
               for _, b in dims]

    def surface(seed, B, N):
        gg = np.random.RandomState(seed)
        u = gg.rand(B, N, 2).astype(np.float32)
        z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
        pts = np.concatenate([u, 0.3 * z], axis=-1)
        return jnp.asarray(pts + 0.01 * gg.randn(B, N, 3).astype(np.float32))

    for B, N in [(1, 1024), (1, 4096), (2, 4096), (1, 34944), (1, 35000),
                 (2, 35000)]:
        x = surface(0, B, N)
        idx = jax.jit(lambda a: knn(a, a, k))(x)
        nbr = jax.jit(gather_neighbors)(x, idx)
        out_m = np.asarray(dgcnn_edges_pallas(
            x, nbr, weights, affines, k=k, dtype=jnp.float32))
        out_i = np.asarray(dgcnn_edges_pallas(
            x, nbr, weights, affines, k=k, dtype=jnp.float32,
            interpret=True))
        err = np.max(np.abs(out_m - out_i) / (np.abs(out_i) + 1e-4))
        bad = np.mean(np.any(
            np.abs(out_m - out_i) / (np.abs(out_i) + 1e-4) > 1e-3, axis=-1))
        # where do the bad rows live? (tail-tile hypothesis)
        rows = np.where(np.any(
            np.abs(out_m - out_i) / (np.abs(out_i) + 1e-4) > 1e-3,
            axis=-1))[1] if bad > 0 else np.array([], np.int64)
        loc = (f" bad-rows [{rows.min()}..{rows.max()}] "
               f"n={rows.size}" if rows.size else "")
        print(f"B={B} N={N}: mosaic-vs-interpret max rel err {err:.2e} "
              f"badrow frac {bad:.3f}{loc}", flush=True)


if __name__ == "__main__":
    main()
