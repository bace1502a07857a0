#!/usr/bin/env python
"""On-chip parity gate for the round-5c large-N path changes BEFORE they
bench in the default indoor configuration — the r4 lesson: CPU interpreter
tests are structurally blind to chip-only numerics (bf16 tie flips, excess
precision), so everything newly wired into a default path gates on the
chip first.

Gates, compiled on the real chip at the indoor shape (N=35k, k=20):

  1. v-space graph equivalence: gathering COORDINATES through the
     Morton-sorted graph (knn_self_vspace) and un-sorting the result must
     equal gathering through knn_self_spatial's original-order graph,
     bit-for-bit (same kernel underneath — this checks the new plumbing,
     at full shape, on real Mosaic output).
  2. edges-fused encoder vs the naive jnp composition fed the SAME
     precomputed graph:
       2a. lowering: kernel Mosaic vs kernel interpret, f32 — catches
           Mosaic-only bugs (measured 2.1e-4 at N=35k, debug_edges_chip2).
       2b. truth-anchored: the truth is the naive composition in REAL f32
           on the host (numpy) — on TPU, DEFAULT-precision f32 matmuls are
           bf16-grade, so the on-device "f32" naive path itself deviates
           ~1e-3 from true f32 and cannot serve as a 1e-4 oracle (the
           first cut of this gate asserted exactly that and "failed" on
           fold-order noise amplified by near-zero init-scale outputs).
           Bar: the kernel's deviation from truth must sit within
           factor-2 of the naive path's own deviation (mean and p99 of
           relative deviation, RMS-floored denominator), in BOTH f32 and
           bf16 mode. Structural bugs (wrong neighbour, garbage tail
           tiles, wrong row mapping) are O(1) relative and blow this up.
  3. shared-gather alpha vs the r4 control path's alpha (pos_enc's own
     prefix gather through the original-order graph): same f32
     coordinates, same math -> 1e-5.
  4. full indoor eval forward (GMMReg bf16): r4 control routing
     (dgcnn_vspace=False, fused_edges off) vs v-space vs
     v-space+fused-edges — rotations must agree to geometry-grade
     tolerance (identical weights; only bf16 rounding order may differ).

Process structure: the top-level invocation never initialises a TPU
client — it orchestrates child processes, one for sections 1-3 and one
PER section-4 variant. Several giant N=35k model compiles in one process
kill the axon TPU worker (measured: the 3-variant in-process loop crashed
at a DIFFERENT variant on each attempt, while every variant passes in a
fresh process — debug_edges_chip3.py, /tmp/edges_full_fresh.log). Worker
pressure, not a kernel fault; sections 1-3 stack encoder-scale programs
only and are safe in one process.

Usage: python scripts/verify_r5c.py [N]            # full gate
       python scripts/verify_r5c.py N 123          # child: sections 1-3
       python scripts/verify_r5c.py N 4 <variant>  # child: one fwd variant
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def surface(seed, B, N):
    g = np.random.RandomState(seed)
    u = g.rand(B, N, 2).astype(np.float32)
    z = (np.sin(3 * u[..., :1]) * np.cos(2 * u[..., 1:])).astype(np.float32)
    pts = np.concatenate([u, 0.3 * z], axis=-1)
    return pts + 0.01 * g.randn(B, N, 3).astype(np.float32)


def _naive_f32_host(variables, x, idx, chunk=4096):
    """The DGCNN eval stage chain in REAL float32 on the host (numpy): the
    truth anchor for gate 2b. TPU DEFAULT-precision f32 matmuls are
    bf16-grade, so no on-device path can serve as an f32 oracle. Mirrors
    nn/dgcnn.py's naive eval path (BN running stats folded in f64)."""
    p, st = variables["params"], variables["batch_stats"]
    ws = [np.asarray(p[f"w{i}"], np.float32) for i in range(1, 6)]
    sb = []
    for i in range(1, 6):
        s = np.asarray(p[f"bn{i}_scale"], np.float64)
        b = np.asarray(p[f"bn{i}_bias"], np.float64)
        m = np.asarray(st[f"bn{i}_mean"], np.float64)
        v = np.asarray(st[f"bn{i}_var"], np.float64)
        sc = s / np.sqrt(v + 1e-5)
        sb.append(((sc).astype(np.float32),
                   (b - m * sc).astype(np.float32)))
    B, N, _ = x.shape
    out = np.zeros((B, N, ws[4].shape[1]), np.float32)
    for lo in range(0, N, chunk):
        hi = min(N, lo + chunk)
        q = x[:, lo:hi]                                    # (B, n, 3)
        ic = idx[:, lo:hi].reshape(B, -1)
        nbr = np.take_along_axis(x, ic[..., None], axis=1).reshape(
            B, hi - lo, -1, 3)
        e = np.concatenate(
            [nbr - q[:, :, None, :],
             np.broadcast_to(q[:, :, None, :], nbr.shape)], axis=-1)
        taps = []
        h = e
        for (w, (sc, bi)) in zip(ws[:4], sb[:4]):
            h = np.maximum(h @ w * sc + bi, 0.0)
            taps.append(h.max(axis=2))
        cat = np.concatenate(taps, axis=-1)
        sc5, bi5 = sb[4]
        out[:, lo:hi] = np.maximum(cat @ ws[4] * sc5 + bi5, 0.0)
    return out


VARIANTS = {
    "r4-control": dict(dgcnn_vspace=False, dgcnn_fused_edges=False),
    "vspace": dict(dgcnn_vspace=True, dgcnn_fused_edges=False),
    "vspace+edges": dict(dgcnn_vspace=True, dgcnn_fused_edges=True),
}


def _fwd_outfile(N, name):
    return f"/tmp/r5c_fwd_{name.replace('+', '_')}_{N}.npz"


def run_sections(N, sections):
    """Sections 1-3, in one process (encoder-scale programs only)."""
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.nn.dgcnn import DGCNN
    from ogmm_tpu.ops.common import gather_neighbors, posenc_alpha
    from ogmm_tpu.ops.pallas_stream import (knn_self_spatial,
                                            knn_self_vspace)

    print("platform:", jax.devices()[0].platform, flush=True)
    k = 20

    # --- 1. v-space coordinate-gather equivalence at full shape -----------
    x = jnp.asarray(surface(0, 2, N))
    B = 2

    @jax.jit
    def vspace_nbr(a):
        xs, idx_s, inv = knn_self_vspace(a, k)
        nbr_s = gather_neighbors(xs, idx_s)
        return jnp.take_along_axis(nbr_s.reshape(B, N, -1),
                                   inv[..., None], axis=1).reshape(B, N, k, 3)

    @jax.jit
    def spatial_nbr(a):
        return gather_neighbors(a, knn_self_spatial(a, k))

    if "1" in sections:
        nv = np.asarray(vspace_nbr(x))
        ns = np.asarray(spatial_nbr(x))
        mism = np.mean(np.any(nv != ns, axis=-1))
        print(f"vspace gather equivalence: mismatching entries {mism:.2e}",
              flush=True)
        assert mism == 0.0, mism

    # --- 2. edges-fused encoder vs naive, same graph ----------------------
    if "2" in sections:
        import functools

        import ogmm_tpu.ops.pallas_dgcnn as pd
        idx = jax.jit(lambda a: knn_self_spatial(a, k))(x)
        orig_edges = pd.dgcnn_edges_pallas
        store = {}

        store["v"] = DGCNN(emb_dims=512, k=k, dtype=None, fused=False,
                           fused_edges=False).init(
            jax.random.PRNGKey(0), x[:1, :256], train=False)

        def enc(dt, fused_edges, interpret=False):
            m = DGCNN(emb_dims=512, k=k, dtype=dt, fused=False,
                      fused_edges=fused_edges)
            try:
                if interpret:
                    pd.dgcnn_edges_pallas = functools.partial(orig_edges,
                                                              interpret=True)
                return np.asarray(jax.jit(
                    lambda a, i: m.apply(store["v"], a, train=False,
                                         nbr_idx=i))(x, idx), np.float32)
            finally:
                pd.dgcnn_edges_pallas = orig_edges

        # 2a. Mosaic lowering vs the interpreter, identical inputs
        mosaic32 = enc(None, True)
        interp32 = enc(None, True, interpret=True)
        lower = float(np.max(
            np.abs(mosaic32 - interp32) / (np.abs(interp32) + 1e-4)))
        print(f"edges-fused lowering (mosaic vs interpret, f32): "
              f"max rel err {lower:.2e}", flush=True)
        assert lower < 1e-2, lower

        # 2b. truth-anchored, both dtypes, vs REAL f32 on the host
        truth = _naive_f32_host(store["v"], np.asarray(x, np.float32),
                                np.asarray(idx))
        naive32 = enc(None, False)
        naive16 = enc("bfloat16", False)
        kern16 = enc("bfloat16", True)
        floor = float(np.sqrt(np.mean(truth ** 2)))

        def dev(a):
            d = np.abs(a - truth) / (np.abs(truth) + floor)
            return float(d.mean()), float(np.percentile(d, 99))

        for lab, kern_out, naive_out in (("float32", mosaic32, naive32),
                                         ("bfloat16", kern16, naive16)):
            km, kp99 = dev(kern_out)
            nm, np99 = dev(naive_out)
            print(f"edges-fused encoder ({lab} vs host-f32 truth): kernel "
                  f"mean/p99 {km:.2e}/{kp99:.2e}, naive {nm:.2e}/{np99:.2e}",
                  flush=True)
            assert (km <= max(2.0 * nm, 1e-6)
                    and kp99 <= max(2.0 * np99, 1e-5)), (
                lab, (km, nm), (kp99, np99))

    # --- 3. shared-gather alpha vs the control alpha -----------------------
    if "3" in sections:
        a_shared = np.asarray(jax.jit(
            lambda a: posenc_alpha(a, vspace_nbr(a)[:, :, :5]))(x))
        a_ctrl = np.asarray(jax.jit(
            lambda a: posenc_alpha(a, spatial_nbr(a)[:, :, :5]))(x))
        aerr = np.max(np.abs(a_shared - a_ctrl))
        print(f"shared-gather alpha vs control: max err {aerr:.2e}",
              flush=True)
        assert aerr < 1e-5, aerr

    print(f"verify_r5c sections {sections}: OK", flush=True)


def child_fwd(N, name):
    """Section-4 child: ONE full indoor forward variant, saved to npz."""
    import jax
    import jax.numpy as jnp
    from ogmm_tpu.configs import indoor
    from ogmm_tpu.nn import GMMReg

    src = jnp.asarray(surface(10, 1, N))
    tgt = jnp.asarray(surface(11, 1, N))
    mcfg = dataclasses.replace(indoor().model, dtype="bfloat16",
                               **VARIANTS[name])
    gm = GMMReg(cfg=mcfg)
    gv = gm.init({'params': jax.random.PRNGKey(0)}, src, tgt, train=False)
    rot, trans, *_ = jax.jit(
        lambda s, t: gm.apply(gv, s, t, train=False, is_test=False))(src,
                                                                     tgt)
    np.savez(_fwd_outfile(N, name), rot=np.asarray(rot, np.float32),
             trans=np.asarray(trans, np.float32))
    print(f"full fwd variant {name}: saved", flush=True)


def orchestrate_sec4(N):
    """Section 4: one child process per variant, then compare (numpy)."""
    import subprocess
    outs = {}
    for name in VARIANTS:
        print(f"full fwd variant {name}: subprocess...", flush=True)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        str(N), "4", name], check=True)
        d = np.load(_fwd_outfile(N, name))
        outs[name] = (d["rot"], d["trans"])
        assert np.all(np.isfinite(outs[name][0])), f"non-finite rot: {name}"
    ref_r, ref_t = outs["r4-control"]
    for name in ("vspace", "vspace+edges"):
        dR = outs[name][0] @ ref_r.transpose(0, 2, 1)
        ang = np.degrees(np.arccos(np.clip(
            (np.einsum('bii->b', dR) - 1) / 2, -1, 1)))
        dt_err = np.max(np.abs(outs[name][1] - ref_t))
        print(f"full fwd {name} vs control: rot delta "
              f"{float(ang.max()):.3f} deg, trans delta {dt_err:.2e}",
              flush=True)
        # identical weights; vspace is the same math (fp reduction order
        # only), edges adds bf16 rounding-order deltas through the encoder.
        # Downstream geometry is f32 — a selection/ordering bug would blow
        # this up by orders of magnitude.
        bar = 0.05 if name == "vspace" else 1.0
        assert float(ang.max()) < bar and dt_err < 0.02, (name, ang.max(),
                                                          dt_err)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 35000
    sections = sys.argv[2] if len(sys.argv) > 2 else "1234"
    variant = sys.argv[3] if len(sys.argv) > 3 else None
    if variant is not None:
        child_fwd(N, variant)
        return
    pre = "".join(c for c in sections if c in "123")
    if "4" not in sections:
        run_sections(N, pre)
        return
    # the orchestrating process must never hold a TPU client while its
    # children run — sections 1-3 go to a child process too
    import subprocess
    if pre:
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        str(N), pre], check=True)
    orchestrate_sec4(N)
    print("verify_r5c: OK")


if __name__ == "__main__":
    main()
