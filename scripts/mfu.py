"""MFU accounting for the two hot programs (VERDICT r2 next #2).

Compiles eval-forward and train-step at the bench shape on the TPU and reads
XLA's own FLOP count (`compiled.cost_analysis()['flops']`), then combines it
with the scan-protocol times (bench.py) into MFU vs the v5e peak. Also
prints an analytic per-phase FLOP split (same formulas as the model code) so
each profiled pole (profiles/r2/PROFILE.md) gets its own MFU/roofline
verdict.

v5e peak: 197 TFLOP/s bf16 (394 int8); fp32 via 3-6 bf16 passes. The
geometry phases (EM, FPS, kNN selection) are VPU/transcendental-bound, not
MXU-bound — for those the relevant roofline is VPU ops/s, printed as notes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12


def analytic_phases(B, N, D=512, K=128, k=20, heads=4, em_iters=10,
                    sk_iters=10, pos_k=5):
    """Per-batch-dispatch FLOPs by phase, eval forward (stacked: 2B clouds).

    Formulas mirror the model code (nn/gmmreg.py, nn/dgcnn.py,
    nn/attention.py); MACs counted as 2 FLOPs.
    """
    C = 2 * B                      # stacked eval: src+tgt as one batch
    ph = {}
    # DGCNN: distance matmul + k one-hot gathers + stage matmuls + final
    stage = 2 * (6 * 64 + 64 * 64 + 64 * 128 + 128 * 256)
    ph['dgcnn'] = C * (2 * N * N * 3 * (1 + k)      # dist + k gathers
                       + N * k * stage + 2 * N * 512 * D)
    # position encoding: kNN k=5 + two small dense branches
    ph['posenc'] = C * (2 * N * N * 3 * (1 + pos_k)
                        + 2 * N * (64 + 64 * D // 2)
                        + 2 * N * pos_k * 64 + 2 * N * 64 * D // 2)
    # 3 transformer blocks: 4 projections + scores/apply vs K anchors + MLP
    blk = (4 * 2 * N * D * D + 2 * 2 * N * K * D
           + 2 * N * (2 * D * 2 * D + 2 * D * D))
    ph['attention_x3'] = C * 3 * blk
    # conv1/conv2 deep heads (2D hidden), proj + overlap heads
    head_deep = 2 * N * (D * 2 * D + 2 * D * 2 * D + 2 * D * D)
    # conv2 input is D + 1 + 1 wide -> same order; proj/overlap D//2 hidden
    ph['conv_heads'] = C * (2 * head_deep
                            + 2 * 2 * N * (D * D // 2 + D // 2 * 1))
    # overlap similarity + the two softmax-weighted projections
    ph['overlap_sim'] = B * (2 * N * N * D + 2 * 2 * N * N * 1)
    # EM clustering: cdist + M-step matmuls per trip (sinkhorn inner trips
    # are logsumexp VPU work, ~7 ops/elem/trip, not MXU FLOPs)
    ph['em_mxu'] = C * em_iters * (2 * N * K * 3 * 2)
    ph['em_vpu_ops'] = C * em_iters * sk_iters * N * K * 7   # note, not FLOPs
    # GMMSVD + Procrustes: K x K similarity + 3x3 solves — noise
    ph['gmmsvd'] = B * (2 * K * K * D + 2 * K * K * 3)
    return ph


def main():
    from ogmm_tpu.configs import mnet
    from ogmm_tpu.nn import GMMReg
    from ogmm_tpu.train.state import create_train_state
    from ogmm_tpu.train.trainer import make_train_step

    assert jax.devices()[0].platform == "tpu"
    cfg = mnet()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    B, N = 24, 717
    rs = np.random.RandomState(0)
    src = jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.3)

    model = GMMReg(cfg=cfg.model)
    variables = model.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                           train=False)

    fwd = jax.jit(lambda v, s, t: model.apply(v, s, t, train=False))
    c_fwd = fwd.lower(variables, src, tgt).compile()
    fa = c_fwd.cost_analysis()
    fwd_flops = float(fa.get('flops', float('nan')))

    batch = {'src_xyz': np.asarray(src), 'tgt_xyz': np.asarray(tgt),
             'src_overlap': np.ones((B, N), np.float32),
             'tgt_overlap': np.ones((B, N), np.float32),
             'transform_gt': np.broadcast_to(
                 np.eye(4, dtype=np.float32)[:3], (B, 3, 4)).copy()}
    tmodel, tstate, tx = create_train_state(cfg, 100, batch)
    step = make_train_step(tmodel, tx, cfg)
    dev_batch = {k: jnp.asarray(batch[k]) for k in
                 ('src_xyz', 'tgt_xyz', 'src_overlap', 'tgt_overlap',
                  'transform_gt')}
    c_step = step.lower(tstate, dev_batch).compile()
    ta = c_step.cost_analysis()
    step_flops = float(ta.get('flops', float('nan')))

    # measured times (scan protocol): pass on the command line or use the
    # RESULTS.md r3 values
    t_fwd_ms = float(sys.argv[1]) if len(sys.argv) > 1 else 15.4
    t_step_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 52.5

    out = {
        'fwd_flops_xla': fwd_flops,
        'train_flops_xla': step_flops,
        'fwd_ms': t_fwd_ms,
        'train_ms': t_step_ms,
        'fwd_mfu_vs_bf16_peak': fwd_flops / (t_fwd_ms * 1e-3) / PEAK_BF16,
        'train_mfu_vs_bf16_peak': step_flops / (t_step_ms * 1e-3) / PEAK_BF16,
        'fwd_bytes_accessed': float(fa.get('bytes accessed', float('nan'))),
        'train_bytes_accessed': float(ta.get('bytes accessed', float('nan'))),
    }
    print(json.dumps(out, indent=1))

    ph = analytic_phases(B, N)
    vpu = ph.pop('em_vpu_ops')
    total = sum(ph.values())
    print("\nanalytic eval-forward phase FLOPs (MACs x2), total "
          f"{total/1e9:.1f} GFLOP (XLA says {fwd_flops/1e9:.1f}):")
    for k, v in sorted(ph.items(), key=lambda kv: -kv[1]):
        print(f"  {k:14s} {v/1e9:8.2f} GFLOP  "
              f"({100*v/total:5.1f}%)  ideal@peak {v/PEAK_BF16*1e3:6.2f} ms")
    print(f"  em sinkhorn VPU ~{vpu/1e9:.1f} G elementwise ops "
          "(logsumexp chain — VPU/transcendental roofline, not MXU)")


if __name__ == "__main__":
    main()
