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

    # --- wproject_stream query-tile sweep -------------------------------
    # Every query tile re-reads the WHOLE k_feats array (N/tile_n passes of
    # M*D bytes): at the indoor shape that re-read IS the kernel's 11 ms.
    # Bigger tile_n divides it directly; VMEM caps the sweep (the kernel
    # holds q, k blocks + two (TN, TM) f32 intermediates).
    from ogmm_tpu.ops.pallas_stream import wproject_stream
    D = 512
    g = np.random.RandomState(1)

    def wstack(seed, dt):
        h = np.random.RandomState(seed)
        qf = jnp.asarray(h.randn(R, B, N, D).astype(np.float32)).astype(dt)
        kf = jnp.asarray(h.randn(R, B, N, D).astype(np.float32)).astype(dt)
        vv = jnp.asarray(h.rand(R, B, N, 1).astype(np.float32))
        return qf, kf, vv

    wvariants = [
        ("tn256  tm1024 (shipped)", dict(tile_n=256, tile_m=1024)),
        ("tn512  tm1024", dict(tile_n=512, tile_m=1024)),
        ("tn1024 tm1024", dict(tile_n=1024, tile_m=1024)),
        ("tn512  tm2048", dict(tile_n=512, tile_m=2048)),
        ("tn1024 tm2048", dict(tile_n=1024, tile_m=2048)),
        ("tn2048 tm1024", dict(tile_n=2048, tile_m=1024)),
    ]
    for dt, dtname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for label, kw in wvariants:
            def scanned_w(args, _kw=kw):
                qs, ks, vs = args
                def body(c, x):
                    q, kk, v = x
                    o = wproject_stream(q, kk, v, **_kw)
                    return c + o.sum(dtype=jnp.float32), None
                return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    (qs, ks, vs))[0]

            f = jax.jit(scanned_w)
            try:
                np.asarray(f(wstack(0, dt)))
            except Exception as e:
                print(f"wproject {dtname} {label}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            ts = []
            for seed in (3, 4, 5):
                args = wstack(seed, dt)
                t0 = time.perf_counter()
                np.asarray(f(args))
                ts.append(time.perf_counter() - t0)
            per = (min(ts) - rtt) / R * 1e3
            print(f"wproject {dtname} {label}: {per:.1f} ms for {B} calls "
                  f"({per/B:.2f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
