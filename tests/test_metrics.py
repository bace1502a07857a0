"""Metric suite: exact-recovery zeros + scipy cross-check for Euler angles."""
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from ogmm_tpu.core import se3
from ogmm_tpu.core.metrics import (dcp_metrics, rotation_error,
                                   summarize_metrics, translation_error)


def _random_rt(rng, B, mag=40.0):
    R = Rotation.from_euler(
        'zyx', rng.uniform(-mag, mag, size=(B, 3)), degrees=True).as_matrix()
    t = 0.3 * rng.randn(B, 3)
    return R.astype(np.float32), t.astype(np.float32)


def test_euler_matches_scipy(rng):
    R, _ = _random_rt(rng, 8)
    ours = np.asarray(se3.mat2euler_zyx_deg(jnp.asarray(R)))
    ref = Rotation.from_matrix(R).as_euler('zyx', degrees=True)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_perfect_prediction_zero_errors(rng):
    B, N = 4, 64
    src = rng.randn(B, N, 3).astype(np.float32)
    R, t = _random_rt(rng, B)
    tgt = np.einsum('bij,bnj->bni', R, src) + t[:, None]
    m = dcp_metrics(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(R),
                    jnp.asarray(t), jnp.asarray(R), jnp.asarray(t))
    assert float(m['r_mae'].mean()) < 1e-3
    assert float(m['t_mae'].mean()) < 1e-6
    assert float(m['err_r_deg'].mean()) < 0.1
    # fp32 pairwise-distance cancellation noise floor ~1e-6
    assert float(m['chamfer_dist'].mean()) < 1e-4
    assert float(m['pcab_dist'].mean()) < 1e-4
    assert float(m['n_correct'].mean()) == 1.0


def test_identity_prediction_fails_recall(rng):
    B, N = 4, 64
    src = rng.randn(B, N, 3).astype(np.float32)
    R, t = _random_rt(rng, B, mag=40.0)
    t = t + 1.0
    tgt = np.einsum('bij,bnj->bni', R, src) + t[:, None]
    eyeR = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    zt = np.zeros((B, 3), dtype=np.float32)
    m = dcp_metrics(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(R),
                    jnp.asarray(t), jnp.asarray(eyeR), jnp.asarray(zt))
    assert float(m['n_correct'].mean()) == 0.0
    assert float(m['err_t'].mean()) > 0.5


def test_rotation_translation_error_defs(rng):
    R, t = _random_rt(rng, 6)
    r_err = np.asarray(rotation_error(jnp.asarray(R), jnp.asarray(R)))
    # arccos near 1 amplifies fp32 eps to ~0.03 deg — same floor as the
    # reference's identical formula in fp32 (lib/metric.py:85-88)
    np.testing.assert_allclose(r_err, 0.0, atol=0.05)
    t_err = np.asarray(translation_error(jnp.asarray(t), jnp.asarray(t + 1.0)))
    np.testing.assert_allclose(t_err, np.sqrt(3.0), rtol=1e-5)


def test_summarize_reductions():
    metrics = {'r_mse': np.array([4.0, 0.0]), 'err_t': np.array([1.0, 3.0]),
               'n_correct': np.array([1.0, 0.0]), 'chamfer_dist': np.array([2.0, 4.0])}
    s = summarize_metrics(metrics)
    assert abs(s['r_rmse'] - np.sqrt(2.0)) < 1e-9
    assert abs(s['err_t_mean'] - 2.0) < 1e-9
    assert abs(s['err_t_rmse'] - np.sqrt(5.0)) < 1e-9
    assert abs(s['n_correct'] - 0.5) < 1e-9
    assert abs(s['chamfer_dist'] - 3.0) < 1e-9


def test_print_metrics_formats(capsys):
    from ogmm_tpu.core.metrics import print_metrics
    summary = {'r_rmse': 1.0, 'r_mae': 0.5, 't_rmse': 0.1, 't_mae': 0.05,
               'err_r_deg_mean': 1.2, 'err_r_deg_rmse': 1.5,
               'err_t_mean': 0.07, 'err_t_rmse': 0.09,
               'chamfer_dist': 0.001, 'pcab_dist': 0.002,
               'clip_chamfer_dist': 0.0015, 'n_correct': 0.8}
    print_metrics(summary, title='T')
    out = capsys.readouterr().out
    assert 'Rotation error' in out and 'Recall' in out
    lines = []
    print_metrics(summary, title='T', log=lines.append)
    assert any('Clip Chamfer' in l for l in lines)
