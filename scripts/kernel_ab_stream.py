#!/usr/bin/env python
"""A/B knn_stream variants at the indoor shape (profiles/r3: the k=20
selection was 65% of the 470 ms indoor forward). Scan protocol per
CLAUDE.md: one dispatch over R distinct inputs reduced to a scalar, no-op
RTT subtracted."""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 4


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.ops.pallas_stream import knn_stream, nn1_stream

    print("platform:", jax.devices()[0].platform, flush=True)
    B, N, k = 2, 35000, 20
    rs = np.random.RandomState(0)

    def stack(seed):
        g = np.random.RandomState(seed)
        return jnp.asarray(g.randn(R, B, N, 3).astype(np.float32))

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
        ("tn128 tm4096 unroll", dict(tile_n=128, tile_m=4096, unroll=True)),
        ("tn256 tm4096 unroll", dict(tile_n=256, tile_m=4096, unroll=True)),
        ("tn128 tm8192 unroll", dict(tile_n=128, tile_m=8192, unroll=True)),
        ("tn512 tm2048 unroll", dict(tile_n=512, tile_m=2048, unroll=True)),
    ]
    for label, kw in variants:
        def scanned(xs, _kw=kw):
            def body(c, x):
                idx = knn_stream(x, x, k, **_kw)
                return c + idx.sum(dtype=jnp.int32), None
            return jax.lax.scan(body, jnp.zeros((), jnp.int32), xs)[0]

        f = jax.jit(scanned)
        try:
            np.asarray(f(stack(0)))
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        ts = []
        for seed in (1, 2, 3):
            xs = stack(seed)
            t0 = time.perf_counter()
            np.asarray(f(xs))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - rtt) / R * 1e3
        print(f"knn_stream {label}: {per:.1f} ms for {B} clouds "
              f"({per/B:.1f} ms/cloud)", flush=True)

    # self-kNN spatial variants: Morton pre-sort + diagonal-first + skip
    # gate (ops/pallas_stream.py:knn_self_spatial). Measured on BOTH a
    # volumetric gaussian cloud and a surface-like cloud (random smooth
    # height field — the indoor datasets are 2D manifolds in 3D, where the
    # skip-gate thesis predicts the largest win).
    from ogmm_tpu.ops.pallas_stream import knn_self_spatial

    def surface_stack(seed):
        g = np.random.RandomState(seed)
        uv = g.rand(R, B, N, 2).astype(np.float32) * 4 - 2
        z = np.zeros((R, B, N), np.float32)
        for _ in range(6):
            w = g.randn(2).astype(np.float32) * 2
            ph = g.rand() * 6.28
            z += 0.3 * np.sin(uv @ w + ph).astype(np.float32)
        return jnp.asarray(np.concatenate([uv, z[..., None]], -1))

    spatial_variants = [
        ("plain   tn256 tm4096", lambda x: knn_stream(
            x, x, k, tile_n=256, tile_m=4096)),
        ("spatial tn256 tm4096", lambda x: knn_self_spatial(
            x, k, tile_n=256, tile_m=4096)),
        ("spatial tn128 tm4096", lambda x: knn_self_spatial(
            x, k, tile_n=128, tile_m=4096)),
        ("spatial tn256 tm2048", lambda x: knn_self_spatial(
            x, k, tile_n=256, tile_m=2048)),
        # r3b follow-up around the tn128/tm4096 winner
        ("spatial tn128 tm2048", lambda x: knn_self_spatial(
            x, k, tile_n=128, tile_m=2048)),
        ("spatial tn128 tm8192", lambda x: knn_self_spatial(
            x, k, tile_n=128, tile_m=8192)),
        ("spatial tn64  tm4096", lambda x: knn_self_spatial(
            x, k, tile_n=64, tile_m=4096)),
    ]
    for make, dist in ((stack, "gauss"), (surface_stack, "surface")):
        for label, fn in spatial_variants:
            def scanned_s(xs, _fn=fn):
                def body(c, x):
                    return c + _fn(x).sum(dtype=jnp.int32), None
                return jax.lax.scan(body, jnp.zeros((), jnp.int32), xs)[0]

            f = jax.jit(scanned_s)
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

    # 1-NN variants (the ICP inner op at indoor: 30 trips ride on this)
    from ogmm_tpu.ops.pallas_stream import nn1_stream_t
    nn1_variants = [
        ("nn1_stream  tn256 tm2048", nn1_stream,
         dict(tile_n=256, tile_m=2048)),
        ("nn1_stream  tn256 tm8192", nn1_stream,
         dict(tile_n=256, tile_m=8192)),
        ("nn1_streamT tn512 tm4096", nn1_stream_t,
         dict(tile_n=512, tile_m=4096)),
        ("nn1_streamT tn512 tm8192", nn1_stream_t,
         dict(tile_n=512, tile_m=8192)),
        ("nn1_streamT tn1024 tm8192", nn1_stream_t,
         dict(tile_n=1024, tile_m=8192)),
    ]
    for label, fn, kw in nn1_variants:
        def scanned1(xs, _fn=fn, _kw=kw):
            def body(c, x):
                d, i = _fn(x, x, **_kw)
                return c + i.sum(dtype=jnp.int32), None
            return jax.lax.scan(body, jnp.zeros((), jnp.int32), xs)[0]

        f = jax.jit(scanned1)
        try:
            np.asarray(f(stack(0)))
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        ts = []
        for seed in (4, 5, 6):
            xs = stack(seed)
            t0 = time.perf_counter()
            np.asarray(f(xs))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - rtt) / R * 1e3
        print(f"{label}: {per:.1f} ms for {B} clouds", flush=True)


if __name__ == "__main__":
    main()
