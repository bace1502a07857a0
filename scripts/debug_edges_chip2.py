#!/usr/bin/env python
"""Second r5c edges-kernel chip isolation: reproduce the gate's section-2
comparison exactly (DGCNN emb512/k20, lecun init, N=35000, B=2, f32) and
localize the disagreement three ways:

  naive jnp  vs  kernel Mosaic     (the gate's failing comparison)
  naive jnp  vs  kernel interpret  (math/plumbing difference?)
  kernel interpret vs kernel Mosaic (Mosaic lowering difference?)

The first debug pass showed the kernel Mosaic==interpret when fed my own
random weights/affines at this exact shape — so either the DGCNN-init
weights or the surrounding jit changes the story.
"""
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.nn.dgcnn import DGCNN
    from ogmm_tpu.ops.common import knn
    import ogmm_tpu.ops.pallas_dgcnn as pd

    print("platform:", jax.devices()[0].platform, flush=True)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    k, B = 20, 2

    def surface(seed, BB, NN):
        g = np.random.RandomState(seed)
        u = g.rand(BB, NN, 2).astype(np.float32)
        z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(
            np.float32)
        pts = np.concatenate([u, 0.3 * z], axis=-1)
        return jnp.asarray(pts + 0.01 * g.randn(BB, NN, 3).astype(np.float32))

    x = surface(0, B, N)
    idx = jax.jit(lambda a: knn(a, a, k))(x)

    orig = pd.dgcnn_edges_pallas
    store = {}

    def enc(fused_edges, interpret=False):
        m = DGCNN(emb_dims=512, k=k, dtype=None, fused=False,
                  fused_edges=fused_edges)
        if "v" not in store:
            store["v"] = m.init(jax.random.PRNGKey(0), x[:1, :256],
                                train=False)
        try:
            if interpret:
                pd.dgcnn_edges_pallas = functools.partial(orig,
                                                          interpret=True)
            return np.asarray(jax.jit(
                lambda a, i: m.apply(store["v"], a, train=False,
                                     nbr_idx=i))(x, idx), np.float32)
        finally:
            pd.dgcnn_edges_pallas = orig

    naive = enc(False)
    mosaic = enc(True)
    # interpreter mode unrolls the whole grid into the jit graph — only
    # affordable at small N over the tunnel
    interp = enc(True, interpret=True) if N <= 4096 else None

    def cmp(label, a, b):
        d = np.abs(a - b) / (np.abs(b) + 1e-4)
        err = float(d.max())
        badmask = np.any(d > 1e-2, axis=-1)
        rows = np.where(badmask)
        print(f"{label}: max rel err {err:.2e}, rows>1e-2: "
              f"{badmask.mean():.4f}", flush=True)
        if rows[0].size:
            bs, rs = rows[0][:8], rows[1][:8]
            for bb, rr in zip(bs, rs):
                i0 = int(np.argmax(d[bb, rr]))
                print(f"  b={bb} row={rr} ch={i0}: a={a[bb, rr, i0]:.5f} "
                      f"b={b[bb, rr, i0]:.5f}", flush=True)
            print(f"  bad rows b0: {np.where(badmask[0])[0][:20]}",
                  flush=True)

    cmp("naive vs mosaic  ", mosaic, naive)
    if interp is not None:
        cmp("naive vs interp  ", interp, naive)
        cmp("interp vs mosaic ", mosaic, interp)


if __name__ == "__main__":
    main()
