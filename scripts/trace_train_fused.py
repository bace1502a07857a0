#!/usr/bin/env python
"""Trace the fused-DGCNN train step for per-kernel device times."""
import dataclasses
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "profiles", "r2_fused")


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import mnet
    from ogmm_tpu.train.state import create_train_state
    from ogmm_tpu.train.trainer import make_train_step

    os.makedirs(OUT, exist_ok=True)
    rs = np.random.RandomState(0)
    B, N = 24, 717
    cfg = mnet()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, dtype="bfloat16", dgcnn_fused_train=True))
    batch_np = {
        'src_xyz': rs.randn(B, N, 3).astype(np.float32) * 0.3,
        'tgt_xyz': rs.randn(B, N, 3).astype(np.float32) * 0.3,
        'src_overlap': np.ones((B, N), np.float32),
        'tgt_overlap': np.ones((B, N), np.float32),
        'transform_gt': np.broadcast_to(
            np.eye(4, dtype=np.float32)[:3], (B, 3, 4)).copy(),
    }
    model, state, tx = create_train_state(cfg, steps_per_epoch=100,
                                          sample_batch=batch_np)
    step = make_train_step(model, tx, cfg, mesh=None)
    batches = []
    for i in range(4):
        b = {k: jnp.asarray(v) for k, v in batch_np.items()}
        b['src_xyz'] = jnp.asarray(
            rs.randn(B, N, 3).astype(np.float32) * 0.3)
        b['tgt_xyz'] = jnp.asarray(
            rs.randn(B, N, 3).astype(np.float32) * 0.3)
        batches.append(b)
    state, m = step(state, batches[0])
    np.asarray(m['loss'])
    print("warm", flush=True)
    jax.profiler.start_trace(OUT)
    for i in range(6):
        state, m = step(state, batches[i % 4])
    np.asarray(m['loss'])
    jax.profiler.stop_trace()
    print("trace written to", OUT, flush=True)


if __name__ == "__main__":
    main()
