"""DeepGMR baseline: per-point softmax clustering + closed-form GMM alignment.

Reference: baseline/deepgmr.py. DGCNN features -> K-class softmax clustering
head -> GMM moments with diagonal-isotropic covariances (lib/utils.py:141-148)
-> Sigma^-1-weighted cross-covariance -> rotation solve. The reference ships
the 3x3 SVD to CPU (baseline/deepgmr.py:29); here the solve is the on-device
batched Horn eigen-solve (core/procrustes.py), which also subsumes the
reflection fix.

Known reference quirk: `DeepGMR.forward` returns `tsfm[:, 3, 0:3]` — the
*bottom row* of the 4x4 (always zeros) — as the translation
(baseline/deepgmr.py:79). `quirk_translation_row=True` (default) reproduces
that behaviour for parity; set False for the correct column `tsfm[:, :3, 3]`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ogmm_tpu.configs import ModelConfig
from ogmm_tpu.core.procrustes import horn_rotation
from ogmm_tpu.nn.dgcnn import DGCNN
from ogmm_tpu.nn.layers import ConvHead
from ogmm_tpu.ops.gmm import gmm_params
from ogmm_tpu.ops.icp import icp_point_to_point


def gmm_register(pi_s, mu_s, mu_t, sigma_t):
    """Closed-form alignment of two GMMs (reference baseline/deepgmr.py:17-38).

    pi_s (B,K), mu_s/mu_t (B,K,3), sigma_t (B,K,3,3) isotropic.
    Returns (B, 4, 4) transform mapping the source mixture onto the target.
    """
    c_s = jnp.einsum('bk,bkd->bd', pi_s, mu_s)[:, None, :]     # (B,1,3)
    c_t = jnp.einsum('bk,bkd->bd', pi_s, mu_t)[:, None, :]
    ds = mu_s - c_s                                            # (B,K,3)
    dt = mu_t - c_t
    dt_w = jnp.einsum('bkj,bkji->bki', dt, jnp.linalg.inv(sigma_t))
    ms = jnp.einsum('bki,bkj->bij', pi_s[..., None] * ds, dt_w,
                    precision=jax.lax.Precision.HIGHEST)
    ms = jnp.nan_to_num(ms) + 1e-4
    rot = horn_rotation(ms)                                    # proper rotation
    t = c_t.swapaxes(-1, -2) - jnp.matmul(rot, c_s.swapaxes(-1, -2),
                                          precision=jax.lax.Precision.HIGHEST)
    top = jnp.concatenate([rot, t], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=rot.dtype),
                              (rot.shape[0], 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


class DeepGMR(nn.Module):
    """Call: (src, tgt) -> (rot (B,3,3), trans (B,3)). Reference baseline/deepgmr.py:57-79."""
    cfg: ModelConfig = ModelConfig()
    quirk_translation_row: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, src: jnp.ndarray, tgt: jnp.ndarray,
                 train: bool = True, is_test: bool = False):
        cfg = self.cfg
        backbone = DGCNN(cfg.emb_dims, cfg.gnn_k, self.bn_axis_name)
        cluster = ConvHead(cfg.n_clusters, cfg.emb_dims // 2, deep=True,
                           bn_axis_name=self.bn_axis_name)

        src_gamma = jax.nn.softmax(cluster(backbone(src, train), train), axis=-1)
        tgt_gamma = jax.nn.softmax(cluster(backbone(tgt, train), train), axis=-1)
        src_pi, src_mu, _ = gmm_params(src_gamma, src, return_sigma=True)
        tgt_pi, tgt_mu, tgt_sigma = gmm_params(tgt_gamma, tgt, return_sigma=True)
        tsfm = gmm_register(src_pi, src_mu, tgt_mu, tgt_sigma)

        if is_test:
            rot, trans = icp_point_to_point(
                src, tgt, tsfm, threshold=2.0 * cfg.overlap_radius,
                max_iter=cfg.icp_iters)
            return rot, trans
        rot = tsfm[:, 0:3, 0:3]
        trans = tsfm[:, 3, 0:3] if self.quirk_translation_row else tsfm[:, 0:3, 3]
        return rot, trans
