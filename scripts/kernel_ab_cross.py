#!/usr/bin/env python
"""A/B the cross-shaped kNN (the sp self-graph) with and without the
Morton/AABB cull (ops/pallas_stream.py:knn_cross_spatial vs plain
knn_stream), at the two shapes that matter:

  * L = M = 35k  — mesh size 1 (the chip we have): the sp path's measured
    1.64x overhead over the standard forward came from this call
    (r4 sp session: 220.0 vs 134.3 ms/pair).
  * L = M/8      — the per-shard shape of an 8-chip mesh, where the
    rank-stretch heuristic (diag_stretch=8) earns its keep.

Scan protocol per CLAUDE.md. Surface-like clouds (the indoor regime) and a
volumetric gaussian control.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 4


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.ops.pallas_stream import knn_cross_spatial, knn_stream

    print("platform:", jax.devices()[0].platform, flush=True)
    B, M, k = 2, 35000, 20
    rs = np.random.RandomState(0)

    def gauss(seed, n):
        g = np.random.RandomState(seed)
        return g.randn(R, B, n, 3).astype(np.float32)

    def surface(seed, n):
        g = np.random.RandomState(seed)
        uv = g.rand(R, B, n, 2).astype(np.float32) * 4 - 2
        z = np.zeros((R, B, n), np.float32)
        for _ in range(6):
            w = g.randn(2).astype(np.float32) * 2
            ph = g.rand() * 6.28
            z += 0.3 * np.sin(uv @ w + ph).astype(np.float32)
        return np.concatenate([uv, z[..., None]], -1)

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

    def run(label, fn, qstack, tstack):
        def scanned(qs, ts):
            def body(c, qt):
                return c + fn(qt[0], qt[1]).sum(dtype=jnp.int32), None
            return jax.lax.scan(body, jnp.zeros((), jnp.int32), (qs, ts))[0]

        f = jax.jit(scanned)
        try:
            np.asarray(f(qstack(0), tstack(0)))
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            return
        ts_ = []
        for seed in (1, 2, 3):
            q, t = qstack(seed), tstack(seed)
            t0 = time.perf_counter()
            np.asarray(f(q, t))
            ts_.append(time.perf_counter() - t0)
        per = (min(ts_) - rtt) / R * 1e3
        print(f"{label}: {per:.1f} ms for {B} pairs ({per/B:.1f} ms/call)",
              flush=True)

    for dist_name, make in (("surface", surface), ("gauss", gauss)):
        for L in (M, M // 8):
            # the sp shape: queries are a random subset of the target cloud
            def tstack(seed, _make=make):
                return jnp.asarray(_make(seed, M))

            def qstack(seed, _make=make, _L=L):
                full = _make(seed, M)
                sel = np.random.RandomState(seed + 999).choice(
                    M, size=_L, replace=False)
                return jnp.asarray(full[:, :, np.sort(sel)])

            tag = f"{dist_name} L={L}"
            run(f"plain knn_stream      {tag}",
                lambda q, t: knn_stream(q, t, k), qstack, tstack)
            run(f"cross_spatial         {tag}",
                lambda q, t: knn_cross_spatial(q, t, k), qstack, tstack)
            run(f"cross_spatial tn128   {tag}",
                lambda q, t: knn_cross_spatial(q, t, k, tile_n=128),
                qstack, tstack)


if __name__ == "__main__":
    main()
