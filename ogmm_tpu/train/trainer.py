"""Jitted train/eval steps + epoch driver, sharded over a device mesh.

The TPU-native replacement for the reference's epoch loops
(train.py:27-177) and its `nn.DataParallel` distribution
(train.py:190-191). One jitted `train_step` per optimizer update: forward,
composite loss, grads, Adam update, and the full dcp_metrics suite all fused
into a single XLA program — no per-step host round-trips (the reference
crosses GPU->CPU every step for metrics, lib/metric.py:200-230, and inside
every forward for the SVD, lib/se3.py:276).

Distribution: a 1-D `jax.sharding.Mesh` over the 'dp' axis. The batch is
sharded on axis 0, parameters/optimizer state are replicated, and XLA inserts
the gradient all-reduce over ICI — the pjit equivalent of
DataParallel+NCCL (SURVEY.md §2.10). Under jit's global semantics BatchNorm
statistics are computed over the *global* batch (sync-BN) — a documented
improvement over DataParallel's per-replica stats.
"""
from __future__ import annotations

import logging
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ogmm_tpu.configs import Config
from ogmm_tpu.core.metrics import dcp_metrics, summarize_metrics
from ogmm_tpu.losses import composite_loss, dcp_loss
from ogmm_tpu.train.state import TrainState

logger = logging.getLogger("ogmm_tpu")

BATCH_KEYS = ("src_xyz", "tgt_xyz", "src_overlap", "tgt_overlap",
              "transform_gt")


def make_mesh(cfg: Config, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = tuple(cfg.train.mesh_shape)
    if shape == (-1,) or shape == ():
        shape = (len(devices),)
    n = int(np.prod(shape))
    return Mesh(np.asarray(devices[:n]).reshape(shape),
                tuple(cfg.train.mesh_axes))


def _gt_rt(batch):
    g = batch['transform_gt']
    return g[..., :3, :3], g[..., :3, 3]


def make_train_step(model, tx, cfg: Config, mesh: Optional[Mesh] = None,
                    with_metrics: bool = True, jit: bool = True):
    """Returns jitted (state, batch) -> (state, metrics).

    GMMReg trains on the composite loss (reference train.py:69-71); DeepGMR
    (2-output forward) trains on dcp_loss alone (reference train_base.py:57).
    `with_metrics=False` skips the dcp_metrics suite (loss/clu only) — the
    light step the trainer uses between `metrics_every` strides. `jit=False`
    returns the raw traceable step (callers embedding it in a scan, e.g.
    bench.py's chained-steps timing protocol).
    """
    t = cfg.train
    is_gmmreg = cfg.model_name == "GMMReg"

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        state, key = state.next_rng()
        src, tgt = batch['src_xyz'], batch['tgt_xyz']
        rot_gt, trans_gt = _gt_rt(batch)
        if t.device_overlap:
            from ogmm_tpu.losses import overlap_labels_device
            so, to = overlap_labels_device(src, tgt, rot_gt, trans_gt,
                                           thresh=t.overlap_thresh)
            # tgt_overlap = src_overlap: the realdata quirk (reference
            # realdata.py:127/187) the host labels also carry, unless the
            # dataset opted into the corrected labels (DataConfig
            # .fix_tgt_overlap — ADVICE r4: the two paths used to disagree)
            if not cfg.data.fix_tgt_overlap:
                to = so
            batch = {**batch, 'src_overlap': so, 'tgt_overlap': to}

        def loss_fn(params):
            out, mut = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                src, tgt, train=True,
                mutable=['batch_stats'], rngs={'anchors': key})
            if is_gmmreg:
                rot, trans, src_o, tgt_o, clu = out
                loss = composite_loss(
                    rot, trans, clu, src_o, tgt_o, rot_gt, trans_gt,
                    batch['src_overlap'], batch['tgt_overlap'], src, tgt,
                    w_dcp=t.w_dcp, w_clu=t.w_clu, w_overlap=t.w_overlap,
                    w_welsch=t.w_welsch, welsch_alpha=t.mu,
                    welsch_topk=t.n_keypoints)
            else:
                rot, trans = out
                clu = jnp.zeros((), src.dtype)
                loss = dcp_loss(rot, rot_gt, trans, trans_gt)
            return loss, (mut['batch_stats'], rot, trans, clu)

        (loss, (bstats, rot, trans, clu)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=bstats, opt_state=opt_state)
        if with_metrics:
            metrics = dcp_metrics(src, tgt, rot_gt, trans_gt, rot, trans)
        else:
            metrics = {}
        metrics['loss'] = jnp.broadcast_to(loss, rot.shape[:1])
        metrics['clu_loss'] = jnp.broadcast_to(clu, rot.shape[:1])
        return new_state, metrics

    if not jit:
        return step
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        return jax.jit(step,
                       in_shardings=(repl, {k: shard for k in BATCH_KEYS}),
                       donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, cfg: Config, mesh: Optional[Mesh] = None,
                   is_test: bool = True):
    """Returns jitted (state, batch) -> metrics (with ICP refinement)."""
    t = cfg.train

    is_gmmreg = cfg.model_name == "GMMReg"

    def step(state: TrainState, batch):
        src, tgt = batch['src_xyz'], batch['tgt_xyz']
        rot_gt, trans_gt = _gt_rt(batch)
        if t.device_overlap:
            from ogmm_tpu.losses import overlap_labels_device
            so, to = overlap_labels_device(src, tgt, rot_gt, trans_gt,
                                           thresh=t.overlap_thresh)
            if not cfg.data.fix_tgt_overlap:
                to = so                 # reference quirk, see train step
            batch = {**batch, 'src_overlap': so, 'tgt_overlap': to}
        out = model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            src, tgt, train=False, is_test=is_test)
        if is_gmmreg:
            rot, trans, src_o, tgt_o, clu = out
            loss = composite_loss(
                rot, trans, clu, src_o, tgt_o, rot_gt, trans_gt,
                batch['src_overlap'], batch['tgt_overlap'], src, tgt,
                w_dcp=t.w_dcp, w_clu=t.w_clu, w_overlap=t.w_overlap,
                w_welsch=t.w_welsch, welsch_alpha=t.mu,
                welsch_topk=t.n_keypoints)
        else:
            rot, trans = out
            loss = dcp_loss(rot, rot_gt, trans, trans_gt)
        metrics = dcp_metrics(src, tgt, rot_gt, trans_gt, rot, trans)
        metrics['loss'] = jnp.broadcast_to(loss, rot.shape[:1])
        return metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        return jax.jit(step,
                       in_shardings=(repl, {k: shard for k in BATCH_KEYS}),
                       static_argnames=())
    return jax.jit(step)


def _device_batch(batch: Dict[str, np.ndarray], sharding=None):
    sub = {k: batch[k] for k in BATCH_KEYS}
    if sharding is None:
        return {k: jnp.asarray(v) for k, v in sub.items()}
    # multi-host aware: under jax.process_count() > 1 each host contributes
    # its own row-slice and the global array is assembled from local shards
    # (SURVEY.md §2.10 DP row; single-process reduces to a device_put)
    from ogmm_tpu.train.distributed import assemble_global_batch
    return assemble_global_batch(sub, sharding)


@jax.jit
def _concat_device(acc):
    """Concatenate each metric's per-step arrays ON DEVICE.

    The epoch summary needs steps*n_metrics (~1,400) tiny arrays; fetching
    them one by one costs a tunnel round-trip each (~30 ms over axon). One
    jitted concat turns that into a single dispatch + one small download per
    metric. jit caches by structure, so this compiles once per (n_steps,
    batch-shape) combination.
    """
    return {k: jnp.concatenate([jnp.atleast_1d(x) for x in v])
            for k, v in acc.items()}


def _fetch_concat(acc) -> Dict[str, np.ndarray]:
    if not acc:
        return {}
    out = _concat_device(dict(acc))
    return {k: np.asarray(v) for k, v in out.items()}


class Trainer:
    """Epoch driver: train/eval interleave, best-checkpoint tracking,
    throughput logging (pairs/sec/chip — the metric the reference collects
    then discards, train.py:29-30, 100-104)."""

    def __init__(self, cfg: Config, model, state: TrainState, tx,
                 mesh: Optional[Mesh] = None, checkpointer=None,
                 profile_dir: Optional[str] = None):
        self.cfg = cfg
        self.model = model
        self.state = state
        self.mesh = mesh
        self.checkpointer = checkpointer
        # pin Pallas dispatch to the platform we actually run on (a CPU mesh
        # in a process that also has the TPU plugin registered must not
        # trace TPU kernels)
        from ogmm_tpu.ops.dispatch import set_pallas
        platform = (mesh.devices.flat[0].platform if mesh is not None
                    else jax.devices()[0].platform)
        set_pallas(platform == "tpu")
        self.train_step = make_train_step(model, tx, cfg, mesh)
        # loss-only step between metric strides (cfg.train.metrics_every > 1
        # thins the per-step dcp_metrics tail; epoch summaries then average
        # metrics over the sampled steps only)
        self.metrics_every = max(1, cfg.train.metrics_every)
        self.train_step_light = (
            make_train_step(model, tx, cfg, mesh, with_metrics=False)
            if self.metrics_every > 1 else None)
        self.eval_step = make_eval_step(model, cfg, mesh)
        self.batch_sharding = (
            NamedSharding(mesh, P(mesh.axis_names[0])) if mesh else None)
        self.best = {'pcab_dist': np.inf}
        self.history = []
        # jax.profiler capture of a few warm steps (the tracing subsystem the
        # reference lacks, SURVEY.md §5.1): epoch 0 steps [5, 10) -> XPlane
        # trace viewable in TensorBoard / xprof.
        self.profile_dir = profile_dir
        self._profile_window = (5, 10)

    # How many train-step dispatches may be in flight before the driver
    # forces a device sync. Over the axon tunnel an unbounded async queue is
    # fragile: dispatches don't pipeline, and a tunnel stall with hundreds of
    # queued programs wedges the end-of-epoch fetch indefinitely (observed
    # r3: a 450-epoch run hung >25 min at the first epoch's metric fetch).
    # One extra RTT every stride is noise next to the stride's device time.
    sync_every = 32

    def train_epoch(self, epoch: int, loader) -> Dict[str, float]:
        acc = defaultdict(list)
        n_pairs = 0
        profiling = False
        t0 = time.perf_counter()
        for i, batch in enumerate(loader):
            if self.profile_dir and epoch == 0:
                if i == self._profile_window[0]:
                    jax.profiler.start_trace(self.profile_dir)
                    profiling = True
                elif i == self._profile_window[1] and profiling:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("profiler trace written to %s", self.profile_dir)
            with jax.profiler.StepTraceAnnotation("train", step_num=i):
                dev_batch = _device_batch(batch, self.batch_sharding)
                step_fn = (self.train_step
                           if (self.train_step_light is None
                               or i % self.metrics_every == 0)
                           else self.train_step_light)
                self.state, metrics = step_fn(self.state, dev_batch)
            n_pairs += batch['src_xyz'].shape[0]
            for k, v in metrics.items():
                acc[k].append(v)
            if i % self.sync_every == self.sync_every - 1:
                # bound the in-flight queue with a REAL fetch (CLAUDE.md:
                # block_until_ready can return early over the tunnel)
                np.asarray(metrics['loss'])
        jax.block_until_ready(self.state.params)
        if profiling:
            jax.profiler.stop_trace()
        dt = time.perf_counter() - t0
        summary = summarize_metrics(_fetch_concat(acc))
        n_dev = self.mesh.size if self.mesh else 1
        summary['pairs_per_sec'] = n_pairs / dt
        summary['pairs_per_sec_per_chip'] = n_pairs / dt / n_dev
        nan = float('nan')
        logger.info(
            "Epoch %-4d Mean-Loss: %.4f r_rmse:%.4f r_mae:%.4f t_rmse:%.4f "
            "t_mae:%.4f clip_dist:%.4f recall:%.4f | %.1f pairs/s/chip",
            epoch, summary['loss'], summary.get('r_rmse', nan),
            summary.get('r_mae', nan), summary.get('t_rmse', nan),
            summary.get('t_mae', nan), summary.get('clip_chamfer_dist', nan),
            summary.get('n_correct', nan), summary['pairs_per_sec_per_chip'])
        return summary

    def eval_epoch(self, epoch: int, loader) -> Dict[str, float]:
        acc = defaultdict(list)
        n_pairs = 0
        t0 = time.perf_counter()
        for batch in loader:
            dev_batch = _device_batch(batch, self.batch_sharding)
            metrics = self.eval_step(self.state, dev_batch)
            n_pairs += batch['src_xyz'].shape[0]
            for k, v in metrics.items():
                acc[k].append(v)
        dt = time.perf_counter() - t0
        summary = summarize_metrics(_fetch_concat(acc))
        n_dev = self.mesh.size if self.mesh else 1
        summary['pairs_per_sec'] = n_pairs / dt
        summary['pairs_per_sec_per_chip'] = n_pairs / dt / n_dev
        logger.info(
            "Eval  %-4d Mean-Loss: %.4f r_rmse:%.4f r_mae:%.4f t_rmse:%.4f "
            "t_mae:%.4f clip_dist:%.4f recall:%.4f | %.1f pairs/s/chip",
            epoch, summary['loss'], summary['r_rmse'], summary['r_mae'],
            summary['t_rmse'], summary['t_mae'],
            summary['clip_chamfer_dist'], summary['n_correct'],
            summary['pairs_per_sec_per_chip'])
        return summary

    def fit(self, train_loader, test_loader, epochs: Optional[int] = None):
        epochs = epochs if epochs is not None else self.cfg.train.epochs
        # eval cadence: the reference interleaves a full test-split eval
        # every epoch (train.py:227-239) — the default here. On a 1-core
        # host the eval pipeline costs about as much wall time as the train
        # epoch itself, so long accuracy runs can thin it with
        # cfg.train.eval_every=k (always evaluating the final epoch);
        # best-checkpoint tracking then samples every k-th epoch.
        every = max(1, getattr(self.cfg.train, 'eval_every', 1))
        for epoch in range(epochs):
            train_summary = self.train_epoch(epoch, train_loader)
            # periodic (crash-recovery) saves are gated ONLY by save_every —
            # they must not silently thin to lcm(save_every, eval_every)
            # when the eval cadence skips this epoch
            if (self.checkpointer is not None
                    and (epoch + 1) % self.cfg.train.save_every == 0):
                self.checkpointer.save_periodic(self.state, epoch)
            if (epoch + 1) % every and epoch != epochs - 1:
                self.history.append({'train': train_summary})
                continue
            val_summary = self.eval_epoch(epoch, test_loader)
            self.history.append({'train': train_summary, 'val': val_summary})
            if self.checkpointer is not None:
                if val_summary['pcab_dist'] < self.best['pcab_dist']:
                    self.best = {k: val_summary[k] for k in
                                 ('pcab_dist', 'r_mae', 't_mae',
                                  'clip_chamfer_dist', 'n_correct')}
                    self.checkpointer.save_best(self.state, epoch)
                logger.info(
                    "Current best rotation: %.4f, transl: %.4f, ccd: %.4f, "
                    "recall: %.4f", self.best.get('r_mae', np.inf),
                    self.best.get('t_mae', np.inf),
                    self.best.get('clip_chamfer_dist', np.inf),
                    self.best.get('n_correct', 0.0))
        return self.history
