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
"""
import json
import os
import time

import numpy as np

# frozen from bench_reference.py on this image (torch 2.13 CPU, 1 core host)
FALLBACK_BASELINE_PPS = 0.5379


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

    # Timing protocol (CLAUDE.md): the tunnel can dedup repeated identical
    # dispatches, so pre-stage several DISTINCT (src, tgt) buffer sets and
    # cycle them across reps; pipeline the loop; final host fetch of every
    # set's last output is the sync barrier (block_until_ready has been
    # observed returning early over the tunnel).
    n_sets = 4
    inputs = [
        (jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.3),
         jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.3))
        for _ in range(n_sets)
    ]
    src, tgt = inputs[0]

    model = GMMReg(cfg=cfg.model)
    variables = model.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                           train=False)
    fwd = jax.jit(lambda s, t: model.apply(variables, s, t, train=False))

    for s, t in inputs:
        np.asarray(fwd(s, t)[0])                    # compile + warmup + sync
    reps = 20
    outs = [None] * n_sets
    t0 = time.perf_counter()
    for i in range(reps):
        s, t = inputs[i % n_sets]
        outs[i % n_sets] = fwd(s, t)
    for o in outs:                                  # hard sync barrier
        np.asarray(o[0])
    dt = (time.perf_counter() - t0) / reps
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
