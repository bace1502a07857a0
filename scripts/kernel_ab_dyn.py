#!/usr/bin/env python
"""A/B the dynamic-trip selection (knn_stream dyn_select=True) against the
static k-pass selection at the indoor shape (N=35k, k=20), on both cloud
regimes. The static path pays k=20 argmin-extract sweeps per visited block
even when only 0-3 candidates beat the row's k-th bound; dyn_select loops
exactly as many trips as the busiest valid row needs. Scan protocol per
CLAUDE.md (one dispatch over R distinct inputs, RTT subtracted)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 4


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.ops.pallas_stream import knn_self_spatial

    print("platform:", jax.devices()[0].platform, flush=True)
    B, N, k = 2, 35000, 20

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

    variants = [
        # shipped default (cull-era winner) as the control
        ("static tn64  tm4096", dict(tile_n=64, tile_m=4096,
                                     dyn_select=False)),
        ("dyn    tn64  tm4096", dict(tile_n=64, tile_m=4096,
                                     dyn_select=True)),
        ("dyn    tn128 tm4096", dict(tile_n=128, tile_m=4096,
                                     dyn_select=True)),
        ("dyn    tn64  tm2048", dict(tile_n=64, tile_m=2048,
                                     dyn_select=True)),
        ("dyn    tn256 tm4096", dict(tile_n=256, tile_m=4096,
                                     dyn_select=True)),
    ]
    for make, dist in ((surface_stack, "surface"), (gauss_stack, "gauss")):
        for label, kw in variants:
            def scanned(xs, _kw=kw):
                def body(c, x):
                    idx = knn_self_spatial(x, k, **_kw)
                    return c + idx.sum(dtype=jnp.int32), None
                return jax.lax.scan(body, jnp.zeros((), jnp.int32), xs)[0]

            f = jax.jit(scanned)
            try:
                np.asarray(f(make(0)))
            except Exception as e:
                print(f"{dist} {label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            ts = []
            for seed in (7, 8, 9):
                xs = make(seed)
                t0 = time.perf_counter()
                np.asarray(f(xs))
                ts.append(time.perf_counter() - t0)
            per = (min(ts) - rtt) / R * 1e3
            print(f"selfknn {dist:7s} {label}: {per:.1f} ms for {B} clouds "
                  f"({per/B:.1f} ms/cloud)", flush=True)

    # result-identity spot check on chip shapes (beyond the interpreter tests)
    xs = surface_stack(11)[0]
    a = np.asarray(knn_self_spatial(xs, k))
    b = np.asarray(knn_self_spatial(xs, k, dyn_select=True))
    print("chip identity static==dyn:", (a == b).mean(), flush=True)


if __name__ == "__main__":
    main()
