#!/usr/bin/env python
"""A/B the Sinkhorn-EM kernel's clouds_per_block (C) on chip.

The r4 trace puts sinkhorn_em at 4.33 ms of the 16.6 ms eval forward
(26%, the largest single op) — a serial per-cloud chain of small VMEM
ops, gridded over B=48. C>1 interleaves C clouds' chains per grid step
(ops/pallas_em.py:_em_kernel_mc). Scan protocol per CLAUDE.md.

Shapes: the eval-stacked bench shape (B=48, N=717, K=128) and the
per-cloud train shape (B=24).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 16


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.ops.fps import farthest_point_sample
    from ogmm_tpu.ops.common import index_points
    from ogmm_tpu.ops.pallas_em import sinkhorn_em

    print("platform:", jax.devices()[0].platform, flush=True)

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

    for B, N, K in ((48, 717, 128), (24, 717, 128)):
        def stack(seed):
            rs = np.random.RandomState(seed)
            xyz = jnp.asarray(rs.randn(R, B, N, 3).astype(np.float32) * 0.4)
            o = jnp.asarray(rs.rand(R, B, N).astype(np.float32))
            o = o / o.sum(axis=-1, keepdims=True)
            ids = jax.vmap(lambda x: farthest_point_sample(x, K,
                                                           is_center=True))(xyz)
            nodes0 = jax.vmap(index_points)(xyz, ids)
            return xyz, o, nodes0

        for C in (1, 2, 4):
            if B % C:
                continue

            def scanned(xs, os_, ns):
                def body(acc, xon):
                    x, o_, n0 = xon
                    g, pi, nd = sinkhorn_em(x, o_, n0, iters=10, sk_iters=10,
                                            tau=1.0, clouds_per_block=C)
                    return acc + g.sum() + pi.sum() + nd.sum(), None
                return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    (xs, os_, ns))[0]

            f = jax.jit(scanned)
            try:
                np.asarray(f(*stack(0)))
            except Exception as e:
                print(f"B={B} C={C}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                continue
            ts = []
            for seed in (1, 2):
                args = stack(seed)
                t0 = time.perf_counter()
                np.asarray(f(*args))
                ts.append(time.perf_counter() - t0)
            per = (min(ts) - rtt) / R * 1e3
            print(f"B={B} N={N} K={K} C={C}: {per:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
