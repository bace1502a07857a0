#!/usr/bin/env python
"""Headline benchmark: GMMReg registration throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: full-size OGMM network (emb 512, K=128 clusters, 4-head attention)
at the reference eval geometry — batch 24, 717 points per cloud
(configs/cfgs.py:21,49; datasets/transforms.py:344). Forward registration
pass in eval mode (train=False, no ICP), matching what bench_reference.py
measures for the PyTorch reference (the reference publishes no numbers and
discards its own timers, train.py:29-30,100-104 — both sides are measured
here). `vs_baseline` = our pairs/s/chip divided by the reference's pairs/s
measured on this image's torch build (BASELINE_MEASURED.json; falls back to
a frozen constant from the same measurement).

Timing protocol (round 2, see scripts/kernel_ab.py): over the axon tunnel a
per-call Python loop measures the ~25-35 ms dispatch RTT and the output
download, not the chip. Each measurement here is ONE dispatch — lax.scan
over R stacked DISTINCT input pairs reduced to a scalar — with the no-op
dispatch RTT subtracted. Every TIMED dispatch uses a never-before-dispatched
input stack (the tunnel can dedup repeated identical dispatches, and a
min() over repeats would preferentially select a dedup-flattered rep).
"""
import json
import os
import time

import numpy as np

# frozen from bench_reference.py on this image (torch 2.13 CPU, 1 core host)
FALLBACK_BASELINE_PPS = 0.5379

R = 16          # pairs of batches per dispatch


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import mnet
    from ogmm_tpu.nn import GMMReg

    cfg = mnet()
    # bf16 network body (geometry fp32) — the TPU-native serving dtype;
    # registration outputs match fp32 to ~4e-4 in R (recall threshold is 1 deg)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    B, N = 24, 717
    rs = np.random.RandomState(0)

    def stack():
        return (jnp.asarray(rs.randn(R, B, N, 3).astype(np.float32) * 0.3),
                jnp.asarray(rs.randn(R, B, N, 3).astype(np.float32) * 0.3))

    warm_stack = stack()
    fresh_stacks = [stack() for _ in range(3)]     # one per timed dispatch
    src, tgt = warm_stack[0][0], warm_stack[1][0]

    model = GMMReg(cfg=cfg.model)
    variables = model.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                           train=False)

    # tunnel dispatch RTT floor, subtracted from every measurement
    noop = jax.jit(lambda x: x + 1.0)
    tiny = jnp.zeros((8,), jnp.float32)
    np.asarray(noop(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(noop(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    def scanned(srcs, tgts):
        def body(c, st):
            s, t = st
            rot, trans, *_ = model.apply(variables, s, t, train=False)
            return c + rot.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            (srcs, tgts))[0]

    fwd = jax.jit(scanned)
    np.asarray(fwd(*warm_stack))                # compile + warm
    ts = []
    for xs in fresh_stacks:
        t0 = time.perf_counter()
        np.asarray(fwd(*xs))
        ts.append(time.perf_counter() - t0)
    dt = (min(ts) - rtt) / R
    pps = B / dt

    baseline = FALLBACK_BASELINE_PPS
    here = os.path.dirname(os.path.abspath(__file__))
    meas = os.path.join(here, "BASELINE_MEASURED.json")
    if os.path.exists(meas):
        with open(meas) as f:
            baseline = json.load(f)["value"]

    result = {
        "metric": "gmmreg_fwd_pairs_per_sec_per_chip",
        "value": round(pps, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pps / baseline, 1) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
