#!/usr/bin/env python
"""Eval-forward throughput vs batch size (serving scale), scan protocol."""
import dataclasses
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import mnet
    from ogmm_tpu.nn import GMMReg

    print("platform:", jax.devices()[0].platform, flush=True)
    rs = np.random.RandomState(0)
    N = 717
    cfg = mnet()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    model = GMMReg(cfg=cfg.model)

    noop = jax.jit(lambda x: x + 1.0)
    tiny = jnp.zeros((8,), jnp.float32)
    np.asarray(noop(tiny))
    t0 = time.perf_counter()
    np.asarray(noop(tiny))
    rtt = time.perf_counter() - t0
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    for B, R in ((24, 16), (48, 8), (96, 4), (192, 2)):
        src = jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.3)
        variables = model.init({'params': jax.random.PRNGKey(0)}, src, src,
                               train=False)

        def stack(seed):
            r = np.random.RandomState(seed)
            return (jnp.asarray(r.randn(R, B, N, 3).astype(np.float32) * 0.3),
                    jnp.asarray(r.randn(R, B, N, 3).astype(np.float32) * 0.3))

        def run(a, b):
            def body(c, st):
                rot, *_ = model.apply(variables, st[0], st[1], train=False)
                return c + rot.astype(jnp.float32).sum(), None
            return jax.lax.scan(body, jnp.zeros(()), (a, b))[0]

        f = jax.jit(run)
        np.asarray(f(*stack(0)))               # compile + warm
        ts = []
        for s in (stack(1), stack(2), stack(3)):   # fresh stack per timed rep
            t0 = time.perf_counter()
            np.asarray(f(*s))
            ts.append(time.perf_counter() - t0)
        ms = (min(ts) - rtt) / R * 1e3
        print(f"B={B:3d}: {ms:7.2f} ms/batch  {B/ms*1e3:7.0f} pairs/s/chip",
              flush=True)


if __name__ == "__main__":
    main()
