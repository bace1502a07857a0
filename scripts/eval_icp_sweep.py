#!/usr/bin/env python
"""Accuracy side of the ICP-trip A/B: evaluate a trained checkpoint on the
synthetic eval split at several `icp_iters` settings. The reference's Open3D
refinement (lib/o3dutils.py:186-188) runs registration_icp with its default
max_iteration=30 but a RELATIVE early-exit — well-initialised pairs converge
in far fewer trips. Our fixed-trip batched ICP pays all 30 every time
(5.7 ms of the 22.0 ms eval+ICP batch at the bench shape; ~370 ms of the
558 ms indoor pair). If recall holds at fewer trips, serving can dial down.

Usage: python scripts/eval_icp_sweep.py <model_path> [trips...]
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
    trips = [int(t) for t in sys.argv[2:]] or [30, 20, 15, 10, 5, 0]

    base = Registrar.from_checkpoint(model_path)
    cfg = base.cfg
    print("checkpoint cfg:", json.dumps(config_to_dict(cfg)['model']),
          flush=True)
    _, test_loader = data_loader(cfg)
    batches = list(test_loader)

    for it in trips:
        mcfg = dataclasses.replace(cfg.model, icp_iters=max(it, 1))
        reg = Registrar(cfg.replace(model=mcfg), variables=base.variables,
                        example_n=cfg.data.n_points)
        accs = {}
        for batch in batches:
            rot, trans, _, _ = reg(batch['src_xyz'], batch['tgt_xyz'],
                                   refine=it > 0)
            g = batch['transform_gt']
            m = dcp_metrics(batch['src_xyz'], batch['tgt_xyz'],
                            g[..., :3, :3], g[..., :3, 3], rot, trans)
            for k, v in m.items():
                accs.setdefault(k, []).append(np.asarray(v))
        summary = summarize_metrics(
            {k: np.concatenate(v) for k, v in accs.items()})
        print(f"icp_iters={it}: recall={summary['n_correct']:.4f} "
              f"r_mae={summary['r_mae']:.3f} t_mae={summary['t_mae']:.4f} "
              f"pcab={summary['pcab_dist']:.5f}", flush=True)


if __name__ == "__main__":
    main()
