#!/usr/bin/env python
"""Training CLI — the ogmm_tpu equivalent of reference train.py.

Usage:
    python train.py --dataset synthetic --epochs 2 --batch_size 8
    python train.py --root /data --dataset modelnet --model GMMReg

Flags mirror the reference argparse presets (configs/cfgs.py:12-65); unknown
datasets fall back with a clear error. `--preset indoor` switches to the
7-Scenes/ICL-NUIM defaults (configs/cfgs.py:68-125).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='TPU point cloud registration')
    p.add_argument('--preset', type=str, default='mnet',
                   choices=['mnet', 'indoor'])
    p.add_argument('--root', type=str, default='synthetic')
    p.add_argument('--dataset', type=str, default=None,
                   help='modelnet|modelnetcp|modelnetdv|7scene|icl_nuim|synthetic')
    p.add_argument('--model', type=str, default=None, choices=['GMMReg', 'DeepGMR'])
    p.add_argument('--n_points', type=int, default=None)
    p.add_argument('--noise_type', type=str, default=None)
    p.add_argument('--rot_mag', type=float, default=None)
    p.add_argument('--trans_mag', type=float, default=None)
    p.add_argument('--emb_dims', type=int, default=None)
    p.add_argument('--n_clusters', type=int, default=None)
    p.add_argument('--km_clusters', type=int, default=None)
    p.add_argument('--num_heads', type=int, default=None)
    p.add_argument('--gnn_k', type=int, default=None)
    p.add_argument('--dtype', type=str, default=None,
                   choices=['float32', 'bfloat16'],
                   help='network-body compute dtype (geometry stays fp32)')
    p.add_argument('--batch_size', type=int, default=None)
    p.add_argument('--test_batch_size', type=int, default=None)
    p.add_argument('--epochs', type=int, default=None)
    p.add_argument('--lr', type=float, default=None)
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--eval_every', type=int, default=None,
                   help='full test-split eval every k-th epoch (default 1 '
                        '= reference-faithful; final epoch always evals)')
    p.add_argument('--metrics_every', type=int, default=None,
                   help='full dcp_metrics every k-th train step (1 = every '
                        'step like the reference; >1 trims the step tail)')
    p.add_argument('--model_path', type=str, default=None)
    p.add_argument('--steps_per_epoch', type=int, default=None,
                   help='cap optimizer steps per epoch (smoke runs)')
    p.add_argument('--eval_only', action='store_true')
    p.add_argument('--export_weights', type=str, default=None,
                   help='after fit, write the best checkpoint as a single '
                        'weights-only .npz (params+stats+config)')
    p.add_argument('--profile_dir', type=str, default=None,
                   help='capture a jax.profiler trace of epoch-0 steps 5-10')
    p.add_argument('--multihost', action='store_true',
                   help='initialise jax.distributed (multi-host DP over DCN)')
    p.add_argument('--device_overlap', action='store_true',
                   help='compute GT overlap labels on device in the jitted '
                        'step (7scene/icl_nuim: skips the host KD-tree '
                        'pass, which dominates per-sample wall time at '
                        'indoor scale)')
    return p.parse_args(argv)


def build_config(args):
    from ogmm_tpu.configs import indoor, mnet
    cfg = indoor() if args.preset == 'indoor' else mnet()
    model_kw, data_kw, train_kw, top_kw = {}, {}, {}, {}
    if args.model:
        top_kw['model_name'] = args.model
    for k in ('emb_dims', 'n_clusters', 'km_clusters', 'num_heads', 'gnn_k',
              'dtype'):
        v = getattr(args, k)
        if v is not None:
            model_kw[k] = v
    for k in ('root', 'dataset', 'n_points', 'noise_type', 'rot_mag',
              'trans_mag'):
        v = getattr(args, k)
        if v is not None:
            data_kw[k] = v
    if args.root == 'synthetic' and args.dataset is None:
        data_kw['dataset'] = 'synthetic'
    for k in ('batch_size', 'test_batch_size', 'epochs', 'lr', 'seed',
              'metrics_every', 'eval_every', 'model_path'):
        v = getattr(args, k)
        if v is not None:
            train_kw[k] = v
    if args.device_overlap:
        train_kw['device_overlap'] = True
        dataset = data_kw.get('dataset', cfg.data.dataset)
        # each dataset's host-label radius (realdata.py): 7scene 0.05,
        # icl_nuim 0.075
        train_kw['overlap_thresh'] = 0.075 if dataset == 'icl_nuim' else 0.05
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, **model_kw),
        data=dataclasses.replace(cfg.data, **data_kw),
        train=dataclasses.replace(cfg.train, **train_kw),
        **top_kw)
    return cfg


class CappedLoader:
    """Wraps a loader to yield at most n batches per epoch (smoke runs)."""

    def __init__(self, loader, n):
        self.loader, self.n = loader, n

    def __iter__(self):
        for i, b in enumerate(self.loader):
            if i >= self.n:
                break
            yield b

    def __len__(self):
        return min(self.n, len(self.loader))


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args)

    if args.multihost:
        from ogmm_tpu.train.distributed import init_distributed
        init_distributed()

    import jax
    from ogmm_tpu.data import data_loader
    from ogmm_tpu.train import (CheckpointManager, Trainer,
                                create_train_state)
    from ogmm_tpu.train.trainer import make_mesh

    log_dir = os.path.join(cfg.train.model_path, cfg.model_name)
    os.makedirs(log_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format='%(asctime)s - %(name)s - %(levelname)s - %(message)s',
        handlers=[logging.FileHandler(os.path.join(log_dir, 'train.log')),
                  logging.StreamHandler(sys.stdout)],
        force=True)  # jax/absl already installed root handlers
    logger = logging.getLogger("ogmm_tpu")
    logger.info("devices: %s", jax.devices())
    logger.info("config: %s", json.dumps(dataclasses.asdict(cfg), default=str))

    train_loader, test_loader = data_loader(cfg)
    if args.steps_per_epoch:
        train_loader = CappedLoader(train_loader, args.steps_per_epoch)
        test_loader = CappedLoader(test_loader, max(1, args.steps_per_epoch // 4))
    steps_per_epoch = max(1, len(train_loader))

    sample = next(iter(train_loader))
    model, state, tx = create_train_state(cfg, steps_per_epoch, sample)

    mesh = make_mesh(cfg) if len(jax.devices()) > 1 else None
    ckpt = CheckpointManager(cfg.train.model_path, cfg.model_name, cfg=cfg)
    restored = ckpt.restore(state)
    if restored is not None:
        logger.info("restored full train state from optim_model")
        state = restored

    trainer = Trainer(cfg, model, state, tx, mesh=mesh, checkpointer=ckpt,
                      profile_dir=args.profile_dir)
    if args.eval_only:
        from ogmm_tpu.core.metrics import print_metrics
        summary = trainer.eval_epoch(0, test_loader)
        print_metrics(summary, title=f"{cfg.model_name} eval",
                      log=logger.info)
    else:
        trainer.fit(train_loader, test_loader, epochs=cfg.train.epochs)
        if args.export_weights:
            from ogmm_tpu.train.checkpoint import export_weights
            best = ckpt.restore(trainer.state) if ckpt.has_best() else None
            src = best if best is not None else trainer.state
            export_weights({'params': src.params,
                            'batch_stats': src.batch_stats},
                           args.export_weights, cfg)
            logger.info("exported weights-only artifact to %s",
                        args.export_weights)
    return trainer


if __name__ == "__main__":
    main()
