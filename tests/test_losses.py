"""Losses: hand-computed cases + parity with reference formulas via torch-free
re-derivation (SURVEY.md §4 — reference has no tests; formulas are the gold)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ogmm_tpu import losses
from ogmm_tpu.core import se3


def random_rotation(rng, mag_deg=30.0):
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    angle = np.deg2rad(mag_deg) * rng.rand()
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def test_dcp_loss_zero_at_identity(rng):
    R = np.stack([random_rotation(rng) for _ in range(3)])
    t = rng.randn(3, 3).astype(np.float32)
    loss = losses.dcp_loss(jnp.asarray(R), jnp.asarray(R),
                           jnp.asarray(t), jnp.asarray(t))
    assert float(loss) < 1e-10


def test_dcp_loss_positive_otherwise(rng):
    R1 = np.stack([random_rotation(rng) for _ in range(2)]).astype(np.float32)
    R2 = np.stack([random_rotation(rng) for _ in range(2)]).astype(np.float32)
    t = rng.randn(2, 3).astype(np.float32)
    loss = losses.dcp_loss(jnp.asarray(R1), jnp.asarray(R2),
                           jnp.asarray(t), jnp.asarray(t + 1.0))
    assert float(loss) > 0.1


def test_con_loss_prefers_aligned_pairs(rng):
    # identical x/y (perfect positives) must score lower than shuffled pairs
    x = rng.randn(2, 16, 8).astype(np.float32)
    perm = rng.permutation(16)
    aligned = losses.con_loss(jnp.asarray(x), jnp.asarray(x), tau=0.1)
    shuffled = losses.con_loss(jnp.asarray(x), jnp.asarray(x[:, perm]), tau=0.1)
    assert float(aligned) < float(shuffled)


def test_con_loss_matches_manual_ce(rng):
    # brute-force NT-Xent for B=1, n=3 against the vectorised implementation
    x = rng.randn(1, 3, 4).astype(np.float32)
    y = rng.randn(1, 3, 4).astype(np.float32)
    tau = 0.5
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    yn = y / np.linalg.norm(y, axis=-1, keepdims=True)
    sxy = xn[0] @ yn[0].T / tau
    sxx = xn[0] @ xn[0].T / tau
    syy = yn[0] @ yn[0].T / tau
    syx = sxy.T
    rows = []
    for i in range(3):
        negs = [sxx[i, j] for j in range(3) if j != i] + \
               [sxy[i, j] for j in range(3) if j != i]
        rows.append([sxy[i, i]] + negs)
    for i in range(3):
        negs = [syx[i, j] for j in range(3) if j != i] + \
               [syy[i, j] for j in range(3) if j != i]
        rows.append([syx[i, i]] + negs)
    logits = np.array(rows)
    expected = np.mean([np.log(np.exp(r).sum()) - r[0] for r in logits])
    got = float(losses.con_loss(jnp.asarray(x), jnp.asarray(y), tau=tau))
    np.testing.assert_allclose(got, expected, rtol=2e-3)


def test_welsch_loss_zero_when_aligned(rng):
    src = rng.randn(2, 32, 3).astype(np.float32)
    eye = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    # src == tgt, identity transform -> z=0 -> loss = 0
    loss = losses.welsch_loss(jnp.asarray(src), jnp.asarray(src), eye,
                              alpha=1.0, top_k=16)
    # fp32 a^2+b^2-2ab cancellation leaves ~1e-6 residual min-distances
    assert float(loss) < 1e-3


def test_welsch_loss_decreases_with_alignment(rng):
    src = rng.randn(2, 32, 3).astype(np.float32)
    R = random_rotation(rng, 40.0).astype(np.float32)
    t = np.array([0.3, -0.2, 0.1], dtype=np.float32)
    tgt = src @ R.T + t
    gt = np.concatenate([np.broadcast_to(R, (2, 3, 3)),
                         np.broadcast_to(t[:, None], (2, 3, 1))], axis=-1)
    eye = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    good = losses.welsch_loss(jnp.asarray(src), jnp.asarray(tgt),
                              jnp.asarray(gt), alpha=1.0, top_k=16)
    bad = losses.welsch_loss(jnp.asarray(src), jnp.asarray(tgt), eye,
                             alpha=1.0, top_k=16)
    assert float(good) < float(bad)


def test_overlap_loss_is_mse(rng):
    p = rng.rand(4, 10).astype(np.float32)
    g = rng.rand(4, 10).astype(np.float32)
    got = float(losses.overlap_loss(jnp.asarray(p), jnp.asarray(g)))
    np.testing.assert_allclose(got, np.mean((p - g) ** 2), rtol=1e-6)


def test_composite_loss_finite_and_grad(rng):
    B, N = 2, 32
    src = rng.randn(B, N, 3).astype(np.float32)
    R = np.stack([random_rotation(rng) for _ in range(B)]).astype(np.float32)
    t = 0.1 * rng.randn(B, 3).astype(np.float32)
    tgt = np.einsum('bij,bnj->bni', R, src) + t[:, None]
    ov = np.ones((B, N), dtype=np.float32)

    def f(rot):
        return losses.composite_loss(
            rot, jnp.asarray(t), jnp.asarray(0.5), jnp.asarray(ov),
            jnp.asarray(ov), jnp.asarray(R), jnp.asarray(t),
            jnp.asarray(ov), jnp.asarray(ov), jnp.asarray(src),
            jnp.asarray(tgt), welsch_topk=16)

    loss, grad = jax.value_and_grad(f)(jnp.asarray(R))
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_overlap_labels_device_matches_host(rng):
    """Device labels (losses.overlap_labels_device) must reproduce the host
    KD-tree labels (data/datautils.overlap_labels) bit-for-bit away from the
    radius boundary — same definition, d2 <= thresh^2."""
    import jax.numpy as jnp
    from ogmm_tpu.data.datautils import overlap_labels, random_pose
    from ogmm_tpu.losses import overlap_labels_device

    B, N = 3, 400
    src = rng.randn(B, N, 3).astype(np.float32) * 0.3
    tsfms = np.stack([random_pose(np.pi / 4, 0.5) for _ in range(B)])
    # partial overlap: transformed src + an offset cluster in tgt
    tgt = np.concatenate([
        (src[:, :N // 2] @ tsfms[:, :3, :3].transpose(0, 2, 1)
         + tsfms[:, None, :3, 3]
         + 0.03 * rng.randn(B, N // 2, 3).astype(np.float32)),
        src[:, N // 2:] + 5.0], axis=1).astype(np.float32)

    host_s, host_t = zip(*(overlap_labels(src[b], tgt[b], tsfms[b],
                                          thresh=0.05) for b in range(B)))
    dev_s, dev_t = overlap_labels_device(
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(tsfms[:, :3, :3]), jnp.asarray(tsfms[:, :3, 3]),
        thresh=0.05)
    np.testing.assert_array_equal(np.stack(host_s), np.asarray(dev_s))
    np.testing.assert_array_equal(np.stack(host_t), np.asarray(dev_t))
