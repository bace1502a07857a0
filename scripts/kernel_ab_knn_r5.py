#!/usr/bin/env python
"""Round-5 kNN tile sweep: fine tile_m with the AABB cull.

The r5b profile puts knn_stream at 56 ms/fwd (45%) — the largest pole of
the 124 ms indoor eval forward. Per visited block the kernel pays k=20
argmin-extract passes over (tile_n, tile_m); with the cull pruning blocks
to the near-diagonal band, the true candidate span per 64-query tile on a
Morton-sorted surface is a few hundred sorted ranks, so most of a 4096-wide
block's extraction sweep is wasted width. Finer tile_m shrinks each pass
4-8x at the cost of more grid steps (bound checks + block DMA per step,
paid even when culled). The r3 sweeps stopped at tile_m=2048 and predate
the cull at the fine end; this sweep closes that.

Scan protocol per CLAUDE.md. Surface-like clouds (the indoor class) for
the full grid, gauss for the winner. Usage: kernel_ab_knn_r5.py [N] [R]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.ops.pallas_stream import knn_self_spatial

    print("platform:", jax.devices()[0].platform, flush=True)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    B, k = 2, 20

    def gauss_stack(seed):
        g = np.random.RandomState(seed)
        return jnp.asarray(g.randn(R, B, N, 3).astype(np.float32))

    def surface_stack(seed):
        g = np.random.RandomState(seed)
        uv = g.rand(R, B, N, 2).astype(np.float32) * 4 - 2
        z = np.zeros((R, B, N), np.float32)
        for _ in range(6):
            w = g.randn(2).astype(np.float32) * 2
            ph = g.rand() * 6.28
            z += 0.3 * np.sin(uv @ w + ph).astype(np.float32)
        return jnp.asarray(np.concatenate([uv, z[..., None]], -1))

    noop = jax.jit(lambda x: x + 1.0)
    tiny = jnp.zeros((8,), jnp.float32)
    np.asarray(noop(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(noop(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    variants = [(64, 4096),                        # shipped default
                (64, 2048), (64, 1024), (64, 512),
                (128, 2048), (128, 1024),
                (32, 4096), (32, 2048), (32, 1024)]

    def run(make, dist, pairs):
        for tn, tm in pairs:
            def scanned(xs, _tn=tn, _tm=tm):
                def body(c, x):
                    idx = knn_self_spatial(x, k, tile_n=_tn, tile_m=_tm)
                    return c + idx.sum(dtype=jnp.int32), None
                return jax.lax.scan(body, jnp.zeros((), jnp.int32), xs)[0]

            f = jax.jit(scanned)
            try:
                np.asarray(f(make(0)))
            except Exception as e:
                print(f"{dist} tn{tn} tm{tm}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            ts = []
            for seed in (7, 8, 9):
                xs = make(seed)
                t0 = time.perf_counter()
                np.asarray(f(xs))
                ts.append(time.perf_counter() - t0)
            per = (min(ts) - rtt) / R * 1e3
            print(f"selfknn {dist:7s} tn{tn:<4d} tm{tm:<5d}: {per:.1f} ms "
                  f"for {B} clouds ({per/B:.1f} ms/cloud)", flush=True)

    run(surface_stack, "surface", variants)
    # winner-confirmation set on the volumetric class
    run(gauss_stack, "gauss", [(64, 4096), (64, 1024), (128, 1024),
                               (32, 2048)])


if __name__ == "__main__":
    main()
