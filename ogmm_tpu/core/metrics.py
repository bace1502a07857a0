"""Registration metrics — identical definitions to the reference, on-device.

Reference: lib/metric.py:197-245 (`dcp_metrics`), 248-264
(`summarize_metrics`), 85-93 (rotation/translation error). The reference
round-trips GPU->CPU every training step (numpy + scipy Euler per item,
lib/metric.py:200-201) and hard-codes `.cuda()` for the Chamfer clip
(lib/metric.py:227); here everything is one jitted batch computation (Euler
via core.se3.mat2euler_zyx_deg) so metrics ride along with the train step.

Recall definition preserved exactly: n_correct = (r_mae < 1.0 deg) AND
(t_mae < 0.1) (lib/metric.py:197, 225).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ogmm_tpu.core import se3
from ogmm_tpu.ops.common import nn1, nn1_both


def rotation_error(rot1: jnp.ndarray, rot2: jnp.ndarray) -> jnp.ndarray:
    """Isotropic rotation error in degrees. Reference: lib/metric.py:85-88."""
    cos_theta = jnp.einsum('bij,bij->b', rot1, rot2)
    return jnp.arccos(jnp.clip((cos_theta - 1.0) / 2.0, -1.0, 1.0)) * (180.0 / jnp.pi)


def translation_error(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    """L2 translation error. Reference: lib/metric.py:91-93."""
    return jnp.linalg.norm(t1 - t2, axis=1)


@partial(jax.jit, static_argnames=("r_th", "t_th"))
def dcp_metrics(src, tgt, rot_gt, trans_gt, rot_pred, trans_pred,
                r_th: float = 1.0, t_th: float = 0.1) -> Dict[str, jnp.ndarray]:
    """Per-pair registration metric suite. Reference: lib/metric.py:197-245.

    src/tgt: (B, N, 3) channel-last. Returns a dict of (B,) arrays (the
    reference returns numpy; callers here np.asarray after device sync).
    """
    rot_pred = jax.lax.stop_gradient(rot_pred)
    trans_pred = jax.lax.stop_gradient(trans_pred).reshape(-1, 3)
    trans_gt = trans_gt.reshape(-1, 3)

    r_pred_euler = se3.mat2euler_zyx_deg(rot_pred)
    r_gt_euler = se3.mat2euler_zyx_deg(rot_gt)
    r_mse = jnp.mean((r_gt_euler - r_pred_euler) ** 2, axis=1)
    r_mae = jnp.mean(jnp.abs(r_gt_euler - r_pred_euler), axis=1)
    t_mse = jnp.mean((trans_gt - trans_pred) ** 2, axis=1)
    t_mae = jnp.mean(jnp.abs(trans_gt - trans_pred), axis=1)

    # isotropic residual of gt^-1 ∘ pred (lib/metric.py:207-213)
    gt_pose = jnp.concatenate([rot_gt, trans_gt[..., None]], axis=-1)
    pred_pose = jnp.concatenate([rot_pred, trans_pred[..., None]], axis=-1)
    residual = se3.concatenate(se3.inverse(gt_pose), pred_pose)
    rot_trace = residual[:, 0, 0] + residual[:, 1, 1] + residual[:, 2, 2]
    err_r_deg = jnp.arccos(jnp.clip(0.5 * (rot_trace - 1.0), -1.0, 1.0)) * (180.0 / jnp.pi)
    err_t = jnp.linalg.norm(residual[:, :, 3], axis=-1)

    # Chamfer distances (lib/metric.py:214-230). The NN mins run through the
    # single 1-NN dispatch point (ops/common.py:nn1): fused / M-streamed
    # Pallas kernels on TPU, dense or chunked jnp elsewhere — no oversized
    # (B, N, M) matrices in HBM at any operating point (these metrics ride
    # along with every train step, and at the indoor shape M ~ 35k).
    src_pred = se3.transform(pred_pose, src)
    src_gt = se3.transform(gt_pose, src)
    dist_src, dist_ref = nn1_both(src_pred, tgt)
    pcab = nn1(src_pred, src_gt)[0].mean(axis=1)
    chamfer = dist_src.mean(axis=1) + dist_ref.mean(axis=1)
    clip = 0.1
    clip_chamfer = (jnp.minimum(jnp.sqrt(dist_src), clip).mean(axis=1)
                    + jnp.minimum(jnp.sqrt(dist_ref), clip).mean(axis=1))

    n_correct = ((r_mae < r_th) & (t_mae < t_th)).astype(jnp.float32)

    return {
        'r_mse': r_mse, 'r_mae': r_mae,
        't_mse': t_mse, 't_mae': t_mae,
        'err_r_deg': err_r_deg, 'err_t': err_t,
        'chamfer_dist': chamfer, 'pcab_dist': pcab,
        'clip_chamfer_dist': clip_chamfer, 'n_correct': n_correct,
    }


def summarize_metrics(metrics: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Epoch reductions. Reference: lib/metric.py:248-264 — *mse keys become
    *rmse via sqrt-of-mean; err* keys get _mean and _rmse; rest are means."""
    out = {}
    for k, v in metrics.items():
        v = np.asarray(v)
        if k.endswith('mse'):
            out[k[:-3] + 'rmse'] = float(np.sqrt(np.mean(v)))
        elif k.startswith('err'):
            out[k + '_mean'] = float(np.mean(v))
            out[k + '_rmse'] = float(np.sqrt(np.mean(v ** 2)))
        elif k.endswith('n_correct'):
            out[k] = float(np.mean(v))
        else:
            out[k] = float(np.mean(v))
    return out


def print_metrics(summary: Dict[str, float], title: str = 'Metrics',
                  log=None) -> None:
    """Formatted metric report — reference lib/metric.py:267-290 (defined
    there but commented out of the loop, train.py:90; wired here for the
    eval CLI)."""
    emit = log if log is not None else print
    emit('=' * (len(title) + 1))
    emit(title + ':')
    emit('DeepCP metrics: {:.4f}(rot-rmse) | {:.4f}(rot-mae) | '
         '{:.4g}(trans-rmse) | {:.4g}(trans-mae)'.format(
             summary['r_rmse'], summary['r_mae'],
             summary['t_rmse'], summary['t_mae']))
    emit('Rotation error {:.4f}(deg, mean) | {:.4f}(deg, rmse)'.format(
        summary['err_r_deg_mean'], summary['err_r_deg_rmse']))
    emit('Translation error {:.4g}(mean) | {:.4g}(rmse)'.format(
        summary['err_t_mean'], summary['err_t_rmse']))
    emit('Chamfer error: {:.7f}(mean-sq)'.format(summary['chamfer_dist']))
    emit('Source error: {:.7f}(mean-sq)'.format(summary['pcab_dist']))
    emit('Clip Chamfer error: {:.7f}(mean-sq)'.format(
        summary['clip_chamfer_dist']))
    emit('Recall: {:.7f}'.format(summary['n_correct']))
