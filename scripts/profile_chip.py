#!/usr/bin/env python
"""Capture an xprof/perfetto trace of the eval forward + train step on chip.

VERDICT r1 next #7: profile-driven attack on the remaining eval time. This
runs the bench-protocol eval forward (B=24, N=717, bf16, kernels on) and the
full train step, traces a few warm reps of each, and prints wall timings.
Trace output: profiles/r2/ (xplane + perfetto json.gz) — parse with
scripts/parse_trace.py.

Timing protocol per CLAUDE.md: distinct pre-staged input sets per rep,
pipelined loop, final np.asarray host fetch as the barrier.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
OUT = (sys.argv[1] if len(sys.argv) > 1
       else os.path.join(REPO, "profiles", "r2"))


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import mnet
    from ogmm_tpu.nn import GMMReg
    from ogmm_tpu.train.state import create_train_state
    from ogmm_tpu.train.trainer import BATCH_KEYS, make_train_step

    os.makedirs(OUT, exist_ok=True)
    print("platform:", jax.devices()[0].platform, flush=True)

    cfg = mnet()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    B, N = 24, 717
    rs = np.random.RandomState(0)
    n_sets = 4
    inputs = [
        (jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.3),
         jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.3))
        for _ in range(n_sets)
    ]
    src, tgt = inputs[0]

    model = GMMReg(cfg=cfg.model)
    t0 = time.perf_counter()
    variables = model.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                           train=False)
    fwd = jax.jit(lambda s, t: model.apply(variables, s, t, train=False))
    for s, t in inputs:
        np.asarray(fwd(s, t)[0])
    print(f"eval compile+warmup: {time.perf_counter()-t0:.1f}s", flush=True)

    def timed(fn, args_list, reps):
        outs = [None] * len(args_list)
        t0 = time.perf_counter()
        for i in range(reps):
            a = args_list[i % len(args_list)]
            outs[i % len(args_list)] = fn(*a)
        for o in outs:
            np.asarray(jax.tree_util.tree_leaves(o)[0])
        return (time.perf_counter() - t0) / reps

    dt = timed(fwd, inputs, 20)
    print(f"eval fwd: {dt*1e3:.2f} ms/batch  ({B/dt:.0f} pairs/s)", flush=True)

    # --- trace eval ---
    try:
        jax.profiler.start_trace(OUT, create_perfetto_trace=True)
        for i in range(8):
            s, t = inputs[i % n_sets]
            with jax.profiler.StepTraceAnnotation("eval_fwd", step_num=i):
                o = fwd(s, t)
        np.asarray(o[0])
        jax.profiler.stop_trace()
        print("eval trace written", flush=True)
    except Exception as e:  # tracing over the tunnel may be unsupported
        print("eval trace FAILED:", e, flush=True)

    # --- train step ---
    batch_np = {
        'src_xyz': np.asarray(src), 'tgt_xyz': np.asarray(tgt),
        'src_overlap': np.ones((B, N), np.float32),
        'tgt_overlap': np.ones((B, N), np.float32),
        'transform_gt': np.broadcast_to(
            np.eye(4, dtype=np.float32)[:3], (B, 3, 4)).copy(),
    }
    t0 = time.perf_counter()
    model, state, tx = create_train_state(cfg, steps_per_epoch=100,
                                          sample_batch=batch_np)
    step = make_train_step(model, tx, cfg, mesh=None)
    batches = []
    for i in range(n_sets):
        s, t = inputs[i]
        b = dict(batch_np)
        b['src_xyz'], b['tgt_xyz'] = s, t
        batches.append({k: jnp.asarray(v) for k, v in b.items()})
    # warmup (donated state: keep threading it)
    state, m = step(state, batches[0])
    np.asarray(m['loss'])
    print(f"train compile+warmup: {time.perf_counter()-t0:.1f}s", flush=True)

    reps = 12
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = step(state, batches[i % n_sets])
    np.asarray(m['loss'])
    dt = (time.perf_counter() - t0) / reps
    print(f"train step: {dt*1e3:.2f} ms/batch  ({B/dt:.0f} pairs/s)",
          flush=True)

    try:
        jax.profiler.start_trace(OUT, create_perfetto_trace=True)
        for i in range(6):
            with jax.profiler.StepTraceAnnotation("train", step_num=i):
                state, m = step(state, batches[i % n_sets])
        np.asarray(m['loss'])
        jax.profiler.stop_trace()
        print("train trace written", flush=True)
    except Exception as e:
        print("train trace FAILED:", e, flush=True)

    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
