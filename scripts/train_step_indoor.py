#!/usr/bin/env python
"""Demonstrate a FULL train step at the indoor operating point on chip:
B=1, N=35,000 through GMMReg with the streamed overlap head training via
its flash-style custom VJP (ops/pallas_stream.py:_wproject_bwd). The torch
reference cannot express this point at all (its materialised (N, M)
matrices are ~4.9 GB each, several per forward+backward).

Prints loss/grad-finiteness and the step time (scan protocol, R=2).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ogmm_tpu.configs import indoor
    from ogmm_tpu.train.state import create_train_state
    from ogmm_tpu.train.trainer import BATCH_KEYS, make_train_step

    assert jax.devices()[0].platform == "tpu"
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    B = 1
    # "control" restores the r4 original-order graph routing
    # (dgcnn_vspace=False) for the round-5c train-step A/B
    control = len(sys.argv) > 2 and sys.argv[2] == "control"
    cfg = indoor()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dtype="bfloat16",
                                  dgcnn_vspace=(False if control else None)),
        train=dataclasses.replace(cfg.train, batch_size=B))
    if control:
        print("routing: r4 control (dgcnn_vspace=False)", flush=True)
    rs = np.random.RandomState(0)

    def batch(seed):
        g = np.random.RandomState(seed)
        src = g.randn(B, N, 3).astype(np.float32) * 0.3
        return {
            'src_xyz': src,
            'tgt_xyz': src + 0.05 * g.randn(B, N, 3).astype(np.float32),
            'src_overlap': np.ones((B, N), np.float32),
            'tgt_overlap': np.ones((B, N), np.float32),
            'transform_gt': np.broadcast_to(
                np.eye(4, dtype=np.float32)[:3], (B, 3, 4)).copy(),
        }

    b0 = batch(0)
    model, state, tx = create_train_state(cfg, steps_per_epoch=10,
                                          sample_batch=b0)
    step = make_train_step(model, tx, cfg)
    dev = {k: jnp.asarray(b0[k]) for k in BATCH_KEYS}
    t0 = time.perf_counter()
    state, metrics = step(state, dev)
    loss = float(np.asarray(metrics['loss'])[0])
    print(f"compile+first step {time.perf_counter()-t0:.0f}s  "
          f"loss={loss:.4f}", flush=True)
    assert np.isfinite(loss), loss
    finite = all(np.all(np.isfinite(np.asarray(x)))
                 for x in jax.tree_util.tree_leaves(state.params))
    assert finite, "non-finite params after update"

    ts = []
    for seed in (1, 2, 3):
        dev = {k: jnp.asarray(batch(seed)[k]) for k in BATCH_KEYS}
        t0 = time.perf_counter()
        state, metrics = step(state, dev)
        l = float(np.asarray(metrics['loss'])[0])
        ts.append(time.perf_counter() - t0)
    print(f"indoor train step: {min(ts)*1e3:.0f} ms/step (B={B}, N={N}), "
          f"loss finite={np.isfinite(l)}", flush=True)


if __name__ == "__main__":
    main()
