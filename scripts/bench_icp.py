#!/usr/bin/env python
"""Chip validation + timing for the whole-loop fused ICP kernel and the
is_test (eval+refine) path. Scan protocol throughout."""
import dataclasses
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
R = 16


def main():
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation
    from ogmm_tpu.core import se3
    from ogmm_tpu.ops.icp import icp_point_to_point
    from ogmm_tpu.ops.pallas_icp import icp_pallas

    print("platform:", jax.devices()[0].platform, flush=True)
    rs = np.random.RandomState(7)
    B, N = 24, 717

    noop = jax.jit(lambda x: x + 1.0)
    tiny = jnp.zeros((8,), jnp.float32)
    np.asarray(noop(tiny))
    t0 = time.perf_counter()
    np.asarray(noop(tiny))
    rtt = time.perf_counter() - t0
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    # --- correctness on chip ------------------------------------------------
    src = rs.randn(B, N, 3).astype(np.float32) * 0.3
    rot = Rotation.from_rotvec(
        rs.uniform(-.6, .6, (B, 3))).as_matrix().astype(np.float32)
    t = rs.uniform(-.5, .5, (B, 3)).astype(np.float32)
    tgt = (src @ rot.transpose(0, 2, 1) + t[:, None, :])[:, rs.permutation(N)]
    drot = Rotation.from_rotvec(
        rs.uniform(-.1, .1, (B, 3))).as_matrix().astype(np.float32)
    init = se3.integrate(jnp.asarray(drot @ rot), jnp.asarray(t))
    thr = 0.07
    Rp, Tp = icp_pallas(jnp.asarray(src), jnp.asarray(tgt), init, thr * thr,
                        iters=30)
    rre = np.degrees(np.arccos(np.clip(
        (np.einsum('bii->b', np.asarray(Rp).transpose(0, 2, 1) @ rot) - 1) / 2,
        -1, 1)))
    print(f"icp_pallas chip RRE: max {rre.max():.4f} deg", flush=True)
    assert rre.max() < 0.5, rre

    # --- timing -------------------------------------------------------------
    def stack(seed):
        r = np.random.RandomState(seed)
        s = r.randn(R, B, N, 3).astype(np.float32) * 0.3
        return (jnp.asarray(s), jnp.asarray(s + r.randn(R, B, N, 3) * 0.02),
                jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32)[:3],
                                 (R, B, 3, 4)))

    def timed(fn, label):
        s1, s2 = stack(1), stack(2)
        f = jax.jit(lambda a, b, p: jax.lax.scan(
            lambda c, x: (c + fn(x[0], x[1], x[2]).sum(), None),
            jnp.zeros(()), (a, b, p))[0])
        np.asarray(f(*s1))
        ts = []
        for s in (s2, s1, s2):
            t0 = time.perf_counter()
            np.asarray(f(*s))
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {(min(ts)-rtt)/R*1e3:.2f} ms", flush=True)

    timed(lambda s, t, p: icp_pallas(s, t, p, thr * thr, iters=30)[0],
          "icp fused kernel 30 trips B=24")
    timed(lambda s, t, p: icp_point_to_point(
        s, t, p, thr, max_iter=30, method="horn_pi", use_pallas=False)[0],
          "icp jnp/XLA path 30 trips B=24")

    # --- is_test eval (forward + refinement) --------------------------------
    from ogmm_tpu.configs import mnet
    from ogmm_tpu.nn import GMMReg
    cfg = mnet()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    model = GMMReg(cfg=cfg.model)
    variables = model.init({'params': jax.random.PRNGKey(0)},
                           jnp.asarray(src), jnp.asarray(tgt), train=False)

    def fwd_refine(s, t, _):
        rot, trans, *_ = model.apply(variables, s, t, train=False,
                                     is_test=True)
        return rot.astype(jnp.float32)

    timed(fwd_refine, "eval fwd + ICP refine (is_test) B=24")


if __name__ == "__main__":
    main()
