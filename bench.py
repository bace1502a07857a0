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

    def timed(fn, stacks, warm, r):
        np.asarray(fn(*warm))                   # compile + warm (real fetch)
        ts = []
        for xs in stacks:
            t0 = time.perf_counter()
            np.asarray(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return (min(ts) - rtt) / r

    def scanned(srcs, tgts):
        def body(c, st):
            s, t = st
            rot, trans, *_ = model.apply(variables, s, t, train=False)
            return c + rot.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            (srcs, tgts))[0]

    pps = B / timed(jax.jit(scanned), fresh_stacks, warm_stack, R)

    # --- secondary hot paths, regression-tracked in the same JSON line ----
    # eval + batched on-device ICP refinement (is_test=True)
    def scanned_icp(srcs, tgts):
        def body(c, st):
            s, t = st
            rot, trans, *_ = model.apply(variables, s, t, train=False,
                                         is_test=True)
            return c + rot.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            (srcs, tgts))[0]

    icp_stacks = [stack() for _ in range(3)]
    pps_icp = B / timed(jax.jit(scanned_icp), icp_stacks, warm_stack, R)

    # full train step (fwd+bwd+Adam+metrics, train/trainer.py) — state is
    # the scan carry so the R steps chain like a real epoch
    from ogmm_tpu.train.state import create_train_state
    from ogmm_tpu.train.trainer import make_train_step
    Rt = 8
    eye34 = np.broadcast_to(np.eye(4, dtype=np.float32)[:3], (B, 3, 4))

    def tstack():
        return (jnp.asarray(rs.randn(Rt, B, N, 3).astype(np.float32) * 0.3),
                jnp.asarray(rs.randn(Rt, B, N, 3).astype(np.float32) * 0.3))

    def as_batch(s, t):
        return {'src_xyz': s, 'tgt_xyz': t,
                'src_overlap': jnp.ones((B, N), jnp.float32),
                'tgt_overlap': jnp.ones((B, N), jnp.float32),
                'transform_gt': jnp.asarray(eye34)}

    tmodel, tstate, tx = create_train_state(
        cfg, steps_per_epoch=100,
        sample_batch={'src_xyz': np.asarray(warm_stack[0][0]),
                      'tgt_xyz': np.asarray(warm_stack[1][0])})
    step = make_train_step(tmodel, tx, cfg, jit=False)

    def scanned_train(srcs, tgts):
        def body(state, st):
            s, t = st
            state, metrics = step(state, as_batch(s, t))
            return state, metrics['loss'][0]
        _, losses = jax.lax.scan(body, tstate, (srcs, tgts))
        return losses.sum()

    warm_t = tstack()
    t_stacks = [tstack() for _ in range(3)]
    fn_t = jax.jit(lambda s, t: scanned_train(s, t))
    pps_train = B / timed(fn_t, t_stacks, warm_t, Rt)

    # --- indoor regime (B=1, N=35k, K=16 — the reference's real-data
    # operating point, configs/cfgs.py:77,100): eval forward, streamed
    # kernels. Guarded: a failure degrades to omitting the fields, never
    # to breaking the headline JSON line. ---
    indoor_ms = None
    try:
        from ogmm_tpu.configs import indoor as indoor_preset
        Ni, Ri = 35000, 4
        icfg = dataclasses.replace(indoor_preset().model, dtype="bfloat16")
        imodel = GMMReg(cfg=icfg)

        def istack():
            u = rs.rand(Ri, 1, Ni, 2).astype(np.float32)
            z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:]))
            pts = np.concatenate([u, 0.3 * z], -1).astype(np.float32)
            return jnp.asarray(pts + 0.01 * rs.randn(Ri, 1, Ni, 3)
                               .astype(np.float32))

        iw_s, iw_t = istack(), istack()
        ivars = imodel.init({'params': jax.random.PRNGKey(0)},
                            iw_s[0], iw_t[0], train=False)

        def iscanned(srcs, tgts):
            def body(c, st):
                s, t = st
                rot, *_ = imodel.apply(ivars, s, t, train=False)
                return c + rot.astype(jnp.float32).sum(), None
            return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                (srcs, tgts))[0]

        ifn = jax.jit(iscanned)
        np.asarray(ifn(iw_s, iw_t))
        its = []
        for _ in range(3):
            xs, xt = istack(), istack()
            t0 = time.perf_counter()
            np.asarray(ifn(xs, xt))
            its.append(time.perf_counter() - t0)
        indoor_ms = (min(its) - rtt) / Ri * 1e3
    except Exception:
        pass

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
        "eval_icp_pairs_per_sec": round(pps_icp, 1),
        "train_step_pairs_per_sec": round(pps_train, 1),
    }
    if indoor_ms is not None:
        result["indoor_fwd_ms_per_pair"] = round(indoor_ms, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
