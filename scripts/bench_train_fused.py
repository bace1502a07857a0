#!/usr/bin/env python
"""A/B the naive vs fused-kernel DGCNN training path: full train step on
chip, scan protocol (one dispatch over R distinct batches, scalar fetch)."""
import dataclasses
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

R = 8


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import mnet
    from ogmm_tpu.train.state import create_train_state
    from ogmm_tpu.train.trainer import make_train_step

    print("platform:", jax.devices()[0].platform, flush=True)
    rs = np.random.RandomState(0)
    B, N = 24, 717

    tiny = jnp.zeros((8,), jnp.float32)
    noop = jax.jit(lambda x: x + 1.0)
    np.asarray(noop(tiny))
    t0 = time.perf_counter()
    np.asarray(noop(tiny))
    rtt = time.perf_counter() - t0
    print(f"rtt: {rtt*1e3:.1f} ms", flush=True)

    def stacked_batches(seed):
        r = np.random.RandomState(seed)
        return {
            'src_xyz': jnp.asarray(r.randn(R, B, N, 3).astype(np.float32) * 0.3),
            'tgt_xyz': jnp.asarray(r.randn(R, B, N, 3).astype(np.float32) * 0.3),
            'src_overlap': jnp.ones((R, B, N), jnp.float32),
            'tgt_overlap': jnp.ones((R, B, N), jnp.float32),
            'transform_gt': jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32)[:3], (R, B, 3, 4)),
        }

    batch_np = {k: np.asarray(v[0]) for k, v in stacked_batches(0).items()}

    import ogmm_tpu.ops.dgcnn_train as dtm
    variants = [
        ("naive", False, None, None, False, False),
        ("fused fwd-only (jnp bwd)", True, False, 128, False, False),
        ("fused + remat tail", True, False, 128, False, True),
        ("fused tile128", True, True, 128, False, False),
        ("stacked (divergent BN)", False, None, None, True, False),
    ]
    for label, fused, bwd_pallas, tile, stack, remat in variants:
        if bwd_pallas is not None:
            dtm._BWD_PALLAS = bwd_pallas
            dtm._BWD_TILE = tile
        cfg = mnet()
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, dtype="bfloat16", dgcnn_fused_train=fused,
            stack_train=stack, remat=remat))
        model, state, tx = create_train_state(cfg, steps_per_epoch=100,
                                              sample_batch=batch_np)
        step = make_train_step(model, tx, cfg, mesh=None)

        def run(state, batches):
            def body(s, b):
                s, m = step(s, b)
                return s, m['loss'][0]
            return jax.lax.scan(body, state, batches)

        f = jax.jit(run, donate_argnums=(0,))
        bs1, bs2 = stacked_batches(1), stacked_batches(2)
        t0 = time.perf_counter()
        state, losses = f(state, bs1)
        np.asarray(losses)
        print(f"{label}: compile+first {time.perf_counter()-t0:.0f}s",
              flush=True)
        ts = []
        for bs in (bs2, bs1, bs2):
            t0 = time.perf_counter()
            state, losses = f(state, bs)
            ls = np.asarray(losses)
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - rtt) / R * 1e3
        print(f"{label}: train step {per:.2f} ms/batch "
              f"({B/per*1e3:.0f} pairs/s)  loss[0]={ls[0]:.4f}", flush=True)


if __name__ == "__main__":
    main()
