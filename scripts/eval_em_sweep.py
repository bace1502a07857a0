#!/usr/bin/env python
"""Accuracy side of the EM-trip A/B: evaluate a trained checkpoint on the
synthetic eval split at several `em_iters` settings (the Sinkhorn-EM pole is
~28% of eval forward; the reference's early exit usually converges well
before its 10x10 trips — if recall holds at fewer trips, serving can dial
them down; training/eval parity default stays 10).

Usage: python scripts/eval_em_sweep.py <model_path> [trips...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json


def main():
    import numpy as np
    from ogmm_tpu.api import Registrar
    from ogmm_tpu.configs import config_to_dict
    from ogmm_tpu.core.metrics import dcp_metrics, summarize_metrics
    from ogmm_tpu.data import data_loader

    model_path = sys.argv[1]
    trips = [int(t) for t in sys.argv[2:]] or [10, 6, 4, 2]

    base = Registrar.from_checkpoint(model_path)
    cfg = base.cfg
    print("checkpoint cfg:", json.dumps(config_to_dict(cfg)['model']),
          flush=True)
    _, test_loader = data_loader(cfg)

    for em in trips:
        mcfg = dataclasses.replace(cfg.model, em_iters=em)
        reg = Registrar(cfg.replace(model=mcfg), variables=base.variables,
                        example_n=cfg.data.n_points)
        accs = {}
        for batch in test_loader:
            rot, trans, _, _ = reg(batch['src_xyz'], batch['tgt_xyz'],
                                   refine=True)
            g = batch['transform_gt']
            m = dcp_metrics(batch['src_xyz'], batch['tgt_xyz'],
                            g[..., :3, :3], g[..., :3, 3], rot, trans)
            for k, v in m.items():
                accs.setdefault(k, []).append(np.asarray(v))
        summary = summarize_metrics(
            {k: np.concatenate(v) for k, v in accs.items()})
        print(f"em_iters={em}: recall={summary['n_correct']:.4f} "
              f"r_mae={summary['r_mae']:.3f} t_mae={summary['t_mae']:.4f} "
              f"pcab={summary['pcab_dist']:.5f}", flush=True)


if __name__ == "__main__":
    main()
