#!/usr/bin/env python
"""A/B the round-1 vs round-2 DGCNN kernel and FPS loop on chip.

Tunnel-proof protocol (see RESULTS.md "timing over the axon tunnel"): the
per-call dispatch RTT is ~25-30 ms and output downloads run at ~17 MB/s, so
timing a Python loop of kernel calls measures the tunnel, not the chip.
Instead each measurement is ONE dispatch: jax.lax.scan over R stacked
DISTINCT inputs, reduced to a scalar (tiny fetch). Two separately-staged
input stacks; the first timed call uses the second stack so dedup of the
warmup dispatch cannot flatter it. RTT is measured with a no-op jit and
subtracted.
"""
import importlib.util
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

R = 16


def load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax
    import jax.numpy as jnp
    print("platform:", jax.devices()[0].platform, flush=True)
    rs = np.random.RandomState(0)

    # tunnel RTT floor: trivial dispatch + tiny fetch
    tiny = jnp.zeros((8,), jnp.float32)
    noop = jax.jit(lambda x: x + 1.0)
    np.asarray(noop(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(noop(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    def bench(op, shape, label):
        """op: (single-input array) -> array; scanned over R distinct inputs."""
        xs1 = jnp.asarray(rs.randn(R, *shape).astype(np.float32) * 0.3)
        xs2 = jnp.asarray(rs.randn(R, *shape).astype(np.float32) * 0.3)

        def scanned(xs):
            def body(c, x):
                return c + op(x).astype(jnp.float32).sum(), None
            return jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)[0]

        f = jax.jit(scanned)
        np.asarray(f(xs1))                       # compile + warm
        ts = []
        for xs in (xs2, xs1, xs2):
            t0 = time.perf_counter()
            np.asarray(f(xs))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - rtt) / R * 1e3
        print(f"{label}: {per:.2f} ms  (raw {[f'{t*1e3:.0f}' for t in ts]})",
              flush=True)

    old_dg = load("/tmp/old_pallas_dgcnn.py", "old_dg")
    old_fps = load("/tmp/old_fps.py", "old_fps")
    from ogmm_tpu.ops.fps import farthest_point_sample as new_fps
    from ogmm_tpu.ops.pallas_dgcnn import dgcnn_eval_pallas as new_dg

    bench(lambda x: old_fps.farthest_point_sample(x, 128), (48, 717, 3),
          "fps OLD B=48")
    bench(lambda x: new_fps(x, 128), (48, 717, 3), "fps NEW B=48")

    dims = [6, 64, 64, 128, 256]
    ws = [jnp.asarray(rs.randn(dims[i], dims[i + 1]).astype(np.float32) * 0.1)
          for i in range(4)]
    ws.append(jnp.asarray(rs.randn(512, 512).astype(np.float32) * 0.05))
    affines = [(jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32))
               for c in (64, 64, 128, 256, 512)]

    bench(lambda x: old_dg.dgcnn_eval_pallas(x, ws, affines, k=20,
                                             dtype=jnp.bfloat16),
          (48, 717, 3), "dgcnn OLD full-tile B=48")
    for tile in (128, 256):
        bench(lambda x, t=tile: new_dg(x, ws, affines, k=20, tile_n=t,
                                       dtype=jnp.bfloat16),
              (48, 717, 3), f"dgcnn NEW tile={tile} B=48")


if __name__ == "__main__":
    main()
