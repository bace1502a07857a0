#!/usr/bin/env python
"""Rank indoor checkpoints on a LARGE eval split (VERDICT r4 next #4).

The r4b campaign ranked its checkpoints on 32 fragments — recall quantum
0.031, adjacent eval points oscillating 0.03<->0.34, so best-by-pcab vs
final was inside selection noise. This evaluates every named checkpoint
on one (bigger) split so adjacent rows differ by more than the quantum
(>=128 fragments -> quantum <=0.008), reference eval protocol
(realdata.py:64-135: office scene at test, crop 70%, rot<=45deg,
trans<=0.5m, eval with ICP refinement).

Usage:
    python scripts/eval_indoor_rank.py <data_root> <label>=<ckpt> ...

where <ckpt> is either a weights-only .npz (train.checkpoint
.export_weights) or an orbax model_path[:name] (the trainer's tree, e.g.
/tmp/ckpt_indoor_r4b2:model_0200). The data root must hold the 7scene
layout (scripts/gen_indoor_fragments.py writes it).
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load(spec, data_root):
    from ogmm_tpu.api import Registrar
    if spec.endswith(".npz"):
        reg = Registrar.from_weights(spec)
    elif ":" in spec:
        path, name = spec.rsplit(":", 1)
        reg = Registrar.from_checkpoint(path, name=name)
    else:
        reg = Registrar.from_checkpoint(spec)
    cfg = reg.cfg.replace(
        data=dataclasses.replace(reg.cfg.data, root=data_root))
    return Registrar(cfg, variables=reg.variables,
                     example_n=cfg.data.n_points), cfg


def main():
    import numpy as np
    from ogmm_tpu.core.metrics import dcp_metrics, summarize_metrics
    from ogmm_tpu.data import data_loader

    data_root = sys.argv[1]
    specs = [s.split("=", 1) for s in sys.argv[2:]]

    print(f"{'checkpoint':24s} {'recall':>7s} {'r_mae':>7s} {'t_mae':>7s} "
          f"{'pcab':>8s}  (n_pairs)", flush=True)
    for label, spec in specs:
        reg, cfg = load(spec, data_root)
        _, test_loader = data_loader(cfg)
        accs, n = {}, 0
        for batch in test_loader:
            rot, trans, _, _ = reg(batch['src_xyz'], batch['tgt_xyz'],
                                   refine=True)
            g = batch['transform_gt']
            m = dcp_metrics(batch['src_xyz'], batch['tgt_xyz'],
                            g[..., :3, :3], g[..., :3, 3], rot, trans)
            for k, v in m.items():
                accs.setdefault(k, []).append(np.asarray(v))
            n += batch['src_xyz'].shape[0]
        s = summarize_metrics({k: np.concatenate(v) for k, v in accs.items()})
        print(f"{label:24s} {s['n_correct']:7.4f} {s['r_mae']:7.3f} "
              f"{s['t_mae']:7.4f} {s['pcab_dist']:8.5f}  ({n})", flush=True)


if __name__ == "__main__":
    main()
