#!/usr/bin/env python
"""A/B the large-N fused DGCNN stage chain (ops/pallas_dgcnn.py:
dgcnn_edges_pallas) vs the naive jnp composition at the indoor shape
(VERDICT r4 #7: the streamed fused encoder). Two levels:

  [1] encoder-only: DGCNN eval forward fed the SAME precomputed k=20 graph,
      naive vs edges-fused (tile_n 128 / 256) — isolates the kernel.
  [2] full indoor eval forward (GMMReg, B=1, N=35k, bf16):
      cfg.dgcnn_fused_edges False vs True — what bench.py will see.

Scan protocol per CLAUDE.md: one dispatch over R stacked distinct inputs
reduced to a scalar, no-op RTT subtracted, min of 3 runs on alternating
stacks.

Each full-forward variant of [2] runs in its own child process, and the
orchestrating process never initialises a TPU client: several giant N=35k
model compiles in one process kill the axon TPU worker (r5c session
finding — see verify_r5c.py section 4). Encoder-scale programs ([1]) are
fine stacked in one child.

Usage: python scripts/kernel_ab_edges.py [N] [R]            # full A/B
       python scripts/kernel_ab_edges.py N R enc            # child: [1]
       python scripts/kernel_ab_edges.py N R fwd <variant>  # child: [2]
"""
import dataclasses
import functools
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FWD_VARIANTS = [("r4-control", False, False, None),
                ("vspace", True, False, None),
                ("vspace+edges tile_n=128", True, True, 128),
                ("vspace+edges tile_n=256", True, True, 256)]


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mode = sys.argv[3] if len(sys.argv) > 3 else None

    if mode is None:       # orchestrator: no TPU client in this process
        me = os.path.abspath(__file__)
        subprocess.run([sys.executable, me, str(N), str(R), "enc"],
                       check=False)
        for label, _, _, _ in FWD_VARIANTS:
            subprocess.run([sys.executable, me, str(N), str(R), "fwd",
                            label], check=False)
        return

    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import indoor
    from ogmm_tpu.nn import GMMReg
    from ogmm_tpu.nn.dgcnn import DGCNN
    from ogmm_tpu.ops.common import knn

    print("platform:", jax.devices()[0].platform, flush=True)
    only_fwd = mode == "fwd"
    k = 20
    rs = np.random.RandomState(0)

    def surface(seed, B):
        # fragment-like clouds (bench_indoor.py): smooth 2-D manifold + noise
        g = np.random.RandomState(seed)
        u = g.rand(R, B, N, 2).astype(np.float32)
        z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
        pts = np.concatenate([u, 0.3 * z], axis=-1)
        pts += 0.01 * g.randn(R, B, N, 3).astype(np.float32)
        return jnp.asarray(pts)

    noop = jax.jit(lambda x: x + 1.0)
    tiny = jnp.zeros((8,), jnp.float32)
    np.asarray(noop(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(noop(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    def timed(f, stacks):
        np.asarray(f(*stacks[0]))           # compile + warm fetch
        ts = []
        for st in stacks[1:]:
            t0 = time.perf_counter()
            np.asarray(f(*st))
            ts.append(time.perf_counter() - t0)
        return (min(ts) - rtt) / R * 1e3

    import ogmm_tpu.ops.pallas_dgcnn as pd
    orig_edges = pd.dgcnn_edges_pallas

    # ---- [1] encoder-only, stacked indoor shape (B=2: src+tgt) -----------
    if not only_fwd:
        B = 2
        model = DGCNN(emb_dims=512, k=k, dtype="bfloat16", fused=False)
        x0 = surface(0, B)[0]
        v = model.init(jax.random.PRNGKey(0), x0, train=False)
        graph = jax.jit(lambda x: knn(x, x, k))

        def stacks_with_idx(seeds):
            out = []
            for s in seeds:
                xs = surface(s, B)
                idxs = jnp.stack([graph(xs[r]) for r in range(R)])
                out.append((xs, idxs))
            return out

        sts = stacks_with_idx((0, 1, 2, 3))

        def enc_scan(fused_edges):
            m = DGCNN(emb_dims=512, k=k, dtype="bfloat16", fused=False,
                      fused_edges=fused_edges)

            def f(xs, idxs):
                def body(c, xi):
                    x, idx = xi
                    out = m.apply(v, x, train=False, nbr_idx=idx)
                    return c + out.astype(jnp.float32).sum(), None
                return jax.lax.scan(body, jnp.zeros(()), (xs, idxs))[0]
            return jax.jit(f)

        variants = [("naive (jnp stages)", False, None),
                    ("edges-fused tile_n=128", True, 128),
                    ("edges-fused tile_n=256", True, 256)]
        for label, fe, tn in variants:
            try:
                if tn is not None:
                    pd.dgcnn_edges_pallas = functools.partial(orig_edges,
                                                              tile_n=tn)
                ms = timed(enc_scan(fe), sts)
                print(f"encoder B={B} N={N}: {label}: {ms:.1f} ms "
                      f"({ms/B:.1f} ms/cloud)", flush=True)
            except Exception as e:
                print(f"encoder {label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
            finally:
                pd.dgcnn_edges_pallas = orig_edges

        return

    # ---- [2] child: one full indoor eval forward variant ------------------
    # r4-control = original-order graph + naive stages (the BENCH_r04/r5a
    # configuration); vspace = sorted-space graph, one shared gather, one
    # feature un-sort; +edges = the fused stage-chain kernel on top.
    B = 1
    cfg = indoor().model
    label = sys.argv[4]
    vs, fe, tn = next((v, f_, t) for (l, v, f_, t) in FWD_VARIANTS
                      if l == label)
    mcfg = dataclasses.replace(cfg, dtype="bfloat16",
                               dgcnn_vspace=vs, dgcnn_fused_edges=fe)
    gm = GMMReg(cfg=mcfg)
    s0, t0_ = surface(10, B)[0], surface(11, B)[0]
    gv = gm.init({'params': jax.random.PRNGKey(0)}, s0, t0_, train=False)

    def fwd(ss, ts):
        def body(c, st):
            rot, trans, *_ = gm.apply(gv, st[0], st[1], train=False,
                                      is_test=False)
            return c + rot.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.zeros(()), (ss, ts))[0]

    f = jax.jit(fwd)
    stacks = [(surface(20 + i, B), surface(30 + i, B)) for i in range(4)]
    try:
        if tn is not None:
            pd.dgcnn_edges_pallas = functools.partial(orig_edges, tile_n=tn)
        ms = timed(f, stacks)
        print(f"indoor eval fwd B=1 N={N} {label}: {ms:.1f} ms/pair",
              flush=True)
    except Exception as e:
        print(f"indoor fwd {label}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
    finally:
        pd.dgcnn_edges_pallas = orig_edges


if __name__ == "__main__":
    main()
