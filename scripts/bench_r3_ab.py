#!/usr/bin/env python
"""Round-3 chip A/Bs (scan protocol, one dispatch over R distinct inputs):

  1. train step: full dcp_metrics every step (reference-faithful) vs the
     loss-only light step (TrainConfig.metrics_every stride) — how much of
     the measured ~22% step tail (profiles/r2/PROFILE.md) the flag buys.
  2. eval forward vs EM trip count (model.em_iters 10/6/4/2): the Sinkhorn-EM
     pole is 4.35 ms = 28% of eval fwd; the reference's early exit usually
     converges well before 10x10. Perf only here — the accuracy side runs
     against a trained checkpoint (scripts/eval_em_sweep.py).
"""
import dataclasses
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

R_TRAIN = 8
R_EVAL = 16


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import mnet
    from ogmm_tpu.nn import GMMReg
    from ogmm_tpu.train.state import create_train_state
    from ogmm_tpu.train.trainer import make_train_step

    print("platform:", jax.devices()[0].platform, flush=True)
    rs = np.random.RandomState(0)
    B, N = 24, 717

    tiny = jnp.zeros((8,), jnp.float32)
    noop = jax.jit(lambda x: x + 1.0)
    np.asarray(noop(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(noop(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"rtt: {rtt*1e3:.1f} ms", flush=True)

    # ---------------- train: full vs light metrics ------------------------
    def stacked_batches(seed, r):
        g = np.random.RandomState(seed)
        return {
            'src_xyz': jnp.asarray(g.randn(r, B, N, 3).astype(np.float32) * 0.3),
            'tgt_xyz': jnp.asarray(g.randn(r, B, N, 3).astype(np.float32) * 0.3),
            'src_overlap': jnp.ones((r, B, N), jnp.float32),
            'tgt_overlap': jnp.ones((r, B, N), jnp.float32),
            'transform_gt': jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32)[:3], (r, B, 3, 4)),
        }

    batch_np = {k: np.asarray(v[0])
                for k, v in stacked_batches(0, R_TRAIN).items()}
    cfg = mnet()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    for label, with_metrics in [("train full-metrics", True),
                                ("train light (loss-only)", False)]:
        model, state, tx = create_train_state(cfg, steps_per_epoch=100,
                                              sample_batch=batch_np)
        step = make_train_step(model, tx, cfg, jit=False,
                               with_metrics=with_metrics)

        def run(state, batches):
            def body(s, b):
                s, m = step(s, b)
                return s, m['loss'][0]
            return jax.lax.scan(body, state, batches)

        f = jax.jit(run, donate_argnums=(0,))
        bs1 = stacked_batches(1, R_TRAIN)
        bs2 = stacked_batches(2, R_TRAIN)
        t0 = time.perf_counter()
        state, losses = f(state, bs1)
        np.asarray(losses)
        print(f"{label}: compile+first {time.perf_counter()-t0:.0f}s",
              flush=True)
        ts = []
        for bs in (bs2, stacked_batches(3, R_TRAIN), stacked_batches(4, R_TRAIN)):
            t0 = time.perf_counter()
            state, losses = f(state, bs)
            np.asarray(losses)
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - rtt) / R_TRAIN * 1e3
        print(f"{label}: {per:.2f} ms/step ({B/per*1e3:.0f} pairs/s)",
              flush=True)

    # ---------------- eval fwd vs EM trips --------------------------------
    def estack(seed):
        g = np.random.RandomState(seed)
        return (jnp.asarray(g.randn(R_EVAL, B, N, 3).astype(np.float32) * 0.3),
                jnp.asarray(g.randn(R_EVAL, B, N, 3).astype(np.float32) * 0.3))

    for em in (10, 6, 4, 2):
        mcfg = dataclasses.replace(cfg.model, em_iters=em)
        model = GMMReg(cfg=mcfg)
        ws, wt = estack(0)
        variables = model.init({'params': jax.random.PRNGKey(0)},
                               ws[0], wt[0], train=False)

        def scanned(srcs, tgts):
            def body(c, st):
                s, t = st
                rot, *_ = model.apply(variables, s, t, train=False)
                return c + rot.astype(jnp.float32).sum(), None
            return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                (srcs, tgts))[0]

        f = jax.jit(scanned)
        np.asarray(f(ws, wt))
        ts = []
        for seed in (1, 2, 3):
            xs = estack(seed)
            t0 = time.perf_counter()
            np.asarray(f(*xs))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - rtt) / R_EVAL * 1e3
        print(f"eval fwd em_iters={em}: {per:.2f} ms/batch "
              f"({B/per*1e3:.0f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
