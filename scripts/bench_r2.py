#!/usr/bin/env python
"""Round-2 chip measurements (SUPERSEDED: wall-loop timing here measures
the tunnel dispatch RTT, not the chip — use the scan protocol of
scripts/kernel_ab.py / bench.py instead; kept for the historical record).

Timing protocol: distinct pre-staged inputs per rep, pipelined loop, final
np.asarray host fetch as the barrier.
"""
import dataclasses
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def timed(fn, inputs, reps=20):
    import jax
    outs = [None] * len(inputs)
    for a in inputs:                      # compile + warm every buffer set
        # NB: a real host fetch, not block_until_ready — the tunnel's
        # block_until_ready can return before compile/dispatch completes
        # (CLAUDE.md), which leaks compile time into the timed region
        np.asarray(jax.tree_util.tree_leaves(fn(*a))[0])
    t0 = time.perf_counter()
    for i in range(reps):
        a = inputs[i % len(inputs)]
        outs[i % len(inputs)] = fn(*a)
    for o in outs:
        np.asarray(jax.tree_util.tree_leaves(o)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    print("platform:", jax.devices()[0].platform, flush=True)
    rs = np.random.RandomState(0)

    # --- FPS (new transposed-layout loop), eval-stacked shape --------------
    from ogmm_tpu.ops.fps import farthest_point_sample, fps_combined
    xs = [jnp.asarray(rs.randn(48, 717, 3).astype(np.float32) * 0.3)
          for _ in range(4)]
    f = jax.jit(lambda x: fps_combined(x, 128))
    print(f"fps_combined B=48 (96-row loop): {timed(f, [(x,) for x in xs]):.2f} ms",
          flush=True)
    g = jax.jit(lambda x: farthest_point_sample(x, 128))
    x24 = [jnp.asarray(rs.randn(24, 717, 3).astype(np.float32) * 0.3)
           for _ in range(4)]
    print(f"fps B=24: {timed(g, [(x,) for x in x24]):.2f} ms", flush=True)

    # --- DGCNN kernel variants ---------------------------------------------
    from ogmm_tpu.ops.pallas_dgcnn import dgcnn_eval_pallas
    dims = [6, 64, 64, 128, 256]
    ws = [jnp.asarray(rs.randn(dims[i], dims[i + 1]).astype(np.float32) * 0.1)
          for i in range(4)]
    ws.append(jnp.asarray(rs.randn(512, 512).astype(np.float32) * 0.05))
    affines = [(jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32))
               for c in (64, 64, 128, 256, 512)]
    for tile in (128, 256):
        f = jax.jit(lambda x, t=tile: dgcnn_eval_pallas(
            x, ws, affines, k=20, tile_n=t, dtype=jnp.bfloat16))
        ms = timed(f, [(x,) for x in xs])
        print(f"dgcnn kernel tile_n={tile} B=48: {ms:.2f} ms", flush=True)

    # --- full eval forward (bench protocol) --------------------------------
    from ogmm_tpu.configs import mnet
    from ogmm_tpu.nn import GMMReg
    cfg = mnet()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    B, N = 24, 717
    inputs = [(jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.3),
               jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.3))
              for _ in range(4)]
    model = GMMReg(cfg=cfg.model)
    variables = model.init({'params': jax.random.PRNGKey(0)}, *inputs[0],
                           train=False)
    fwd = jax.jit(lambda s, t: model.apply(variables, s, t, train=False))
    t0 = time.perf_counter()
    ms = timed(fwd, inputs)
    print(f"eval fwd: {ms:.2f} ms/batch ({B/ms*1e3:.0f} pairs/s)  "
          f"[compile+bench {time.perf_counter()-t0:.0f}s]", flush=True)

    # --- full train step ----------------------------------------------------
    from ogmm_tpu.train.state import create_train_state
    from ogmm_tpu.train.trainer import make_train_step
    batch_np = {
        'src_xyz': np.asarray(inputs[0][0]), 'tgt_xyz': np.asarray(inputs[0][1]),
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
        b['src_xyz'], b['tgt_xyz'] = inputs[i]
        batches.append(b)
    state, m = step(state, batches[0])
    np.asarray(m['loss'])
    reps = 12
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = step(state, batches[i % 4])
    np.asarray(m['loss'])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"train step: {dt:.2f} ms/batch ({B/dt*1e3:.0f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
