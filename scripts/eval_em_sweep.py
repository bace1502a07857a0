#!/usr/bin/env python
"""Accuracy side of the EM-trip A/B: evaluate a trained checkpoint on the
synthetic eval split at several `em_iters` settings (the Sinkhorn-EM pole is
~28% of eval forward; the reference's early exit usually converges well
before its 10x10 trips — if recall holds at fewer trips, serving can dial
them down; training/eval parity default stays 10).

Usage: python scripts/eval_em_sweep.py [--root=<data_root>] <model_path> [trips...]

--root overrides the checkpoint's cfg.data.root (e.g. to sweep against a
bigger eval split than the campaign's); <model_path> may be an orbax
tree or a weights-only .npz artifact.
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

    args = sys.argv[1:]
    root = None
    if args and args[0].startswith("--root="):
        root = args.pop(0).split("=", 1)[1]
    model_path = args[0]
    trips = [int(t) for t in args[1:]] or [10, 6, 4, 2]

    if model_path.endswith(".npz"):
        base = Registrar.from_weights(model_path)
    else:
        base = Registrar.from_checkpoint(model_path)
    cfg = base.cfg
    if root is not None:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, root=root))
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
