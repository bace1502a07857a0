"""A/B: grid-hash vs streamed-1-NN ICP at the indoor operating point.

Each of the 30 ICP trips at N=M~35k pays a full M-streamed dense 1-NN
(~12 ms/trip, profiles/r3/PROFILE.md) even though ICP's inlier gate
(threshold 0.07) discards everything beyond a few cm — the uniform grid
(ops/grid_nn.py) does O(N * occupancy) instead of O(N * M) per trip.

Timing protocol: scan over R stacked distinct problems, one dispatch, RTT
subtracted (CLAUDE.md).

Usage: python scripts/bench_grid_icp.py [N] [R]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ogmm_tpu.core import se3
    from ogmm_tpu.ops.icp import icp_point_to_point

    assert jax.devices()[0].platform == "tpu"
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    B, thresh = 1, 0.07
    rs = np.random.RandomState(0)

    def stack():
        # fragment-like manifold clouds at metres scale (indoor-ish)
        u = rs.rand(R, B, N, 2).astype(np.float32) * 3.0
        z = np.sin(2 * u[..., :1]) * np.cos(u[..., 1:])
        src = np.concatenate([u, z.astype(np.float32)], -1)
        src += 0.005 * rs.randn(R, B, N, 3).astype(np.float32)
        ang = rs.uniform(-0.05, 0.05, (R, B, 3)).astype(np.float32)
        # small-angle rotation + small shift: the post-network ICP regime
        from scipy.spatial.transform import Rotation
        rot = Rotation.from_rotvec(ang.reshape(-1, 3)).as_matrix().reshape(
            R, B, 3, 3).astype(np.float32)
        t = rs.uniform(-0.03, 0.03, (R, B, 3)).astype(np.float32)
        tgt = np.einsum('rbij,rbnj->rbni', rot, src) + t[:, :, None, :]
        return jnp.asarray(src), jnp.asarray(tgt)

    warm = stack()
    init = se3.identity_pose((B,))

    noop = jax.jit(lambda x: x + 1.0)
    tiny = jnp.zeros((8,), jnp.float32)
    np.asarray(noop(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(noop(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    def scanned(srcs, tgts, **kw):
        def body(c, st):
            r, t = icp_point_to_point(st[0], st[1], init, thresh,
                                      max_iter=30, **kw)
            return c + r.sum() + t.sum(), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            (srcs, tgts))[0]

    results = {}
    # r3 verdicts: "stream" (now the Morton-sorted culled spatial route,
    # ops/icp.py) won 147.1 ms vs 394.8 pre-cull and 8.5-10.3 s for the
    # grid at cap 8/16; grid_cap32 FAULTS the TPU worker (kernel fault,
    # documented in ops/icp.py:_maybe_grid) and is deliberately absent.
    variants = [("stream", dict(use_grid=False)),
                ("grid_cap8", dict(use_grid=True, grid_cap=8)),
                ("grid_cap16", dict(use_grid=True, grid_cap=16))]
    base = None
    for name, kw in variants:
        fn = jax.jit(lambda s, t, _kw=kw: scanned(s, t, **_kw))
        t0 = time.perf_counter()
        v0 = float(np.asarray(fn(*warm)))
        compile_s = time.perf_counter() - t0
        if base is None:
            base = v0
        ts = []
        for _ in range(3):
            xs = stack()
            t0 = time.perf_counter()
            np.asarray(fn(*xs))
            ts.append(time.perf_counter() - t0)
        dt = (min(ts) - rtt) / R
        results[f"{name}_ms"] = round(dt * 1e3, 1)
        # warm-stack checksum drift vs stream variant = correctness canary
        results[f"{name}_dsum"] = round(abs(v0 - base), 5)
        print(f"{name}: {dt*1e3:.1f} ms/refine (30 trips), compile "
              f"{compile_s:.0f}s, |dsum|={abs(v0-base):.2e}", flush=True)

    results.update({"N": N, "B": B, "R": R, "threshold": thresh})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
