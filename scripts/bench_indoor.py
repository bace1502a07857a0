"""Indoor-regime bench: GMMReg eval forward at the reference's real indoor
operating point — eval batch 1, ~35,000 points into the network
(reference configs/cfgs.py:77 n_points=50000, partial 0.7 -> crop/FPS to
35,000, datasets/realdata.py:114-119; eval batch 1 cfgs.py:100; indoor
architecture K=16 clusters cfgs.py:84-85).

This is the operating point VERDICT r2 called the one untested capability
axis: every (N, M) matrix here is streamed (ops/pallas_stream.py) or
chunked — a 35k x 35k f32 matrix would be 4.9 GB.

Timing protocol: scan over R stacked distinct inputs, one dispatch, RTT
subtracted (CLAUDE.md). R is small because each forward is O(100 ms).

Usage: python scripts/bench_indoor.py [N] [R]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ogmm_tpu.configs import indoor
    from ogmm_tpu.nn import GMMReg

    assert jax.devices()[0].platform == "tpu"
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    B = 1

    cfg = indoor().model
    cfg = dataclasses.replace(cfg, dtype="bfloat16")
    model = GMMReg(cfg=cfg)
    rs = np.random.RandomState(0)

    def stack():
        # fragment-like clouds: a smooth 2-D manifold + noise, unit-ish scale
        u = rs.rand(R, B, N, 2).astype(np.float32)
        z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
        pts = np.concatenate([u, 0.3 * z], axis=-1)
        pts += 0.01 * rs.randn(R, B, N, 3).astype(np.float32)
        return jnp.asarray(pts)

    warm_s, warm_t = stack(), stack()
    src, tgt = warm_s[0], warm_t[0]
    variables = model.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                           train=False)

    noop = jax.jit(lambda x: x + 1.0)
    tiny = jnp.zeros((8,), jnp.float32)
    np.asarray(noop(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(noop(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    def scanned(srcs, tgts, refine):
        def body(c, st):
            s, t = st
            rot, trans, *_ = model.apply(variables, s, t, train=False,
                                         is_test=refine)
            return c + rot.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            (srcs, tgts))[0]

    results = {}
    for refine in (False, True):
        fn = jax.jit(lambda s, t, r=refine: scanned(s, t, r))
        t0 = time.perf_counter()
        np.asarray(fn(warm_s, warm_t))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            xs, xt = stack(), stack()
            t0 = time.perf_counter()
            np.asarray(fn(xs, xt))
            ts.append(time.perf_counter() - t0)
        dt = (min(ts) - rtt) / R
        key = "eval_icp" if refine else "eval_fwd"
        results[f"{key}_ms"] = round(dt * 1e3, 1)
        results[f"{key}_pairs_per_sec"] = round(B / dt, 2)
        results[f"{key}_compile_s"] = round(compile_s, 1)
        print(f"{key}: {dt*1e3:.1f} ms/pair ({B/dt:.2f} pairs/s), "
              f"compile {compile_s:.0f}s", flush=True)

    results.update({"N": N, "B": B, "R": R, "dtype": "bfloat16",
                    "clusters": 16})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
