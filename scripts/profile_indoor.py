#!/usr/bin/env python
"""Trace the indoor-regime eval forward (B=1, N~35k, streamed kernels) to
find its poles. Output: profiles/r3/indoor_fwd.* — parse with
scripts/parse_trace.py."""
import dataclasses
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "profiles", "r3")


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import indoor
    from ogmm_tpu.nn import GMMReg

    os.makedirs(OUT, exist_ok=True)
    print("platform:", jax.devices()[0].platform, flush=True)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    B = 1

    cfg = dataclasses.replace(indoor().model, dtype="bfloat16")
    model = GMMReg(cfg=cfg)
    rs = np.random.RandomState(0)

    def cloud():
        u = rs.rand(B, N, 2).astype(np.float32)
        z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
        pts = np.concatenate([u, 0.3 * z], axis=-1)
        return jnp.asarray(pts + 0.01 * rs.randn(B, N, 3).astype(np.float32))

    inputs = [(cloud(), cloud()) for _ in range(3)]
    src, tgt = inputs[0]
    variables = model.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                           train=False)
    fwd = jax.jit(lambda s, t: model.apply(variables, s, t, train=False)[0]
                  .astype(jnp.float32).sum())
    t0 = time.perf_counter()
    np.asarray(fwd(src, tgt))
    print(f"compile+first {time.perf_counter()-t0:.0f}s", flush=True)

    jax.profiler.start_trace(OUT)
    for s, t in inputs:
        np.asarray(fwd(s, t))
    jax.profiler.stop_trace()
    print("trace written to", OUT, flush=True)


if __name__ == "__main__":
    main()
