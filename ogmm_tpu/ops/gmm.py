"""GMM moment estimation and Sinkhorn-EM weighted k-means (overlap-guided).

Replaces reference lib/utils.py:130-167 (gmm_params / og_params),
lib/utils.py:201-219 (wkeans), lib/utils.py:244-266 (anchor helpers) and
lib/utils.py:269-291 (wkeans_plus). Differences by design:

  * torch.no_grad()/.detach() become jax.lax.stop_gradient (reference
    lib/utils.py:278-289: gradients only flow through the final node_feats
    moment step — preserved exactly here).
  * The 10-iteration EM loop is a lax.scan over fixed trips; the nested
    Sinkhorn is the fixed-iteration scan from ops/sinkhorn.py.
  * Everything is channel-last (B, N, C).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ogmm_tpu.ops.common import (cdist, index_points, l2_normalize,
                                 square_distance)
from ogmm_tpu.ops.fps import farthest_point_sample
from ogmm_tpu.ops.sinkhorn import sinkhorn


def gmm_params(gamma: jnp.ndarray, pts: jnp.ndarray,
               return_sigma: bool = False,
               axis_name: str | None = None):
    """Mixture weights / means (/ isotropic covariances) from responsibilities.

    gamma: (B, N, J) responsibilities; pts: (B, N, D).
    Returns pi (B, J), mu (B, J, D) [, sigma (B, J, D, D) diagonal-isotropic].
    Reference: lib/utils.py:130-149.

    `axis_name`: the point axis is sharded over that mesh axis
    (parallel/sp.py) — gamma/pts hold this shard's rows and every moment is
    a psum over shards; outputs are replicated and equal the unsharded
    values up to summation order.
    """
    N = gamma.shape[1]
    D = pts.shape[-1]
    gsum = gamma.sum(axis=1)                     # (B, J)
    mu_num = jnp.einsum('bnj,bnd->bjd', gamma, pts,
                        preferred_element_type=jnp.float32)
    if axis_name is not None:
        gsum, mu_num = jax.lax.psum((gsum, mu_num), axis_name)
        N = N * jax.lax.axis_size(axis_name)
    pi = gsum / N                                # (B, J)
    npi = pi * N + 1e-5
    mu = mu_num / npi[..., None]
    if not return_sigma:
        return pi, mu
    diff = pts[:, :, None, :] - mu[:, None, :, :]          # (B, N, J, D)
    # isotropic: mean squared distance along each axis, times identity
    sq = jnp.einsum('bnjd,bnjd->bnj', diff, diff)          # (B, N, J) = |diff|^2
    var = jnp.einsum('bnj,bnj->bj', sq, gamma)             # (B, J)
    if axis_name is not None:
        var = jax.lax.psum(var, axis_name)
    var = var / npi
    eye = jnp.eye(D, dtype=pts.dtype)
    sigma = var[..., None, None] * eye
    return pi, mu, sigma


def og_params(pts, gamma, o_score=None, feature=None):
    """Overlap-guided GMM params with an explicit non-overlap component.

    Reference: lib/utils.py:152-167. gamma (B,N,J) is reweighted by the
    overlap score and a (1-score) trash column is appended.
    """
    if o_score is not None:
        gamma_ex = (1.0 - o_score)[..., None]
        score = jnp.concatenate([gamma * o_score[..., None], gamma_ex], axis=-1)
    else:
        score = gamma
    pi, mu = gmm_params(score, pts)
    if feature is not None:
        fea_mu = gmm_params(score, feature)[1]
        return pi, mu, fea_mu
    return pi, mu


def wkeans(x: jnp.ndarray, num_clusters: int, dst: str = 'feats',
           iters: int = 10) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sinkhorn k-means over features or coordinates.

    Reference: lib/utils.py:201-219 (is_fast=True path: center-seeded FPS init).
    Returns (gamma (B,N,J), pi (B,J), centroids (B,J,C)).
    """
    B, N, C = x.shape
    ids = farthest_point_sample(x, num_clusters, is_center=True)
    centroids = index_points(x, ids)

    gamma0 = jnp.zeros((B, N, num_clusters), dtype=x.dtype)
    pi0 = jnp.full((B, num_clusters), 1.0 / num_clusters, dtype=x.dtype)

    def body(carry, _):
        centroids, x_cur, _, _ = carry
        if dst == 'eu':
            cost = square_distance(x_cur, centroids)
        else:
            x_cur = l2_normalize(x_cur)
            centroids = l2_normalize(centroids)
            cost = 2.0 - 2.0 * jnp.einsum('bnd,bmd->bnm', x_cur, centroids)
        gamma = N * sinkhorn(cost, max_iter=10)[0]
        pi, centroids = gmm_params(gamma, x_cur)
        return (centroids, x_cur, gamma, pi), None

    (centroids, _, gamma, pi), _ = jax.lax.scan(
        body, (centroids, x, gamma0, pi0), None, length=iters)
    return gamma, pi, centroids


def _em_jnp(xyz_sg, o, node_xyz0, iters, tau, axis_name: str | None = None):
    """Reference jnp composition of the EM loop (HBM round-trip per step)."""
    def body(carry, _):
        node_xyz, _, _ = carry
        cost = jnp.maximum(cdist(xyz_sg, node_xyz), 0.0) / tau
        gamma = sinkhorn(cost, p=o, q=None, max_iter=10,
                         axis_name=axis_name)[0]
        gamma = jnp.nan_to_num(gamma, nan=0.0)
        gamma = gamma / jnp.maximum(gamma.sum(axis=-1, keepdims=True), 1e-3)
        pi, node_xyz = gmm_params(gamma, xyz_sg, axis_name=axis_name)
        return (node_xyz, gamma, pi), None

    B, N, _ = xyz_sg.shape
    n_clusters = node_xyz0.shape[1]
    gamma0 = jnp.ones((B, N, n_clusters), dtype=xyz_sg.dtype)
    pi0 = jnp.full((B, n_clusters), 1.0 / n_clusters, dtype=xyz_sg.dtype)
    (node_xyz, gamma, pi), _ = jax.lax.scan(
        body, (node_xyz0, gamma0, pi0), None, length=iters)
    return gamma, pi, node_xyz


def wkeans_plus(xyz: jnp.ndarray, feats: jnp.ndarray, o_scores: jnp.ndarray,
                n_clusters: int, iters: int = 10, tau: float = 1.0,
                use_pallas: bool | None = None,
                init_ids: jnp.ndarray | None = None,
                init_nodes: jnp.ndarray | None = None,
                axis_name: str | None = None):
    """Overlap-weighted Sinkhorn-EM clustering (the OGMM core).

    E-step: Sinkhorn on cdist(xyz, nodes)/tau with row marginal p = normalised
    overlap scores; M-step: weighted means. All EM iterations run under
    stop_gradient; gradients flow only through the final node_feats moments
    (reference lib/utils.py:269-291: `with torch.no_grad()` + `.detach()`).

    On TPU the EM loop runs as one fused Pallas kernel that keeps the (N, K)
    block VMEM-resident for all iters*sk_iters trips (ops/pallas_em.py);
    `use_pallas=None` selects it automatically by backend. The jnp path is
    the portable fallback and the numerical reference.

    `init_ids` overrides the centre-seeded FPS initialisation (callers that
    already ran a combined FPS pass, ops/fps.py:fps_combined); `init_nodes`
    supplies the initial cluster centres DIRECTLY — point-sharded forwards
    (parallel/sp.py) must use it, because local row gathers cannot reach the
    full cloud. With `axis_name` set, xyz/feats/o_scores carry this shard's
    rows: the overlap normalisation, every EM moment, and the Sinkhorn
    column update psum across shards, gamma returns the local rows, and
    pi/node_xyz/node_feats come back replicated.

    Returns (gamma (B,N,K), pi (B,K), node_xyz (B,K,3), node_feats (B,K,C)).
    """
    if axis_name is not None and init_nodes is None:
        raise ValueError("wkeans_plus(axis_name=...) needs init_nodes: FPS "
                         "initialisation cannot run on a point shard")
    if axis_name is not None and use_pallas:
        raise ValueError(
            "wkeans_plus: use_pallas=True is incompatible with axis_name — "
            "the fused EM kernel is whole-cloud-resident and cannot psum "
            "across point shards")
    if init_nodes is not None:
        node_xyz0 = init_nodes
    else:
        ids = (init_ids if init_ids is not None
               else farthest_point_sample(xyz, n_clusters, is_center=True))
        node_xyz0 = index_points(xyz, ids)
    o = jax.lax.stop_gradient(o_scores)
    osum = o.sum(axis=-1, keepdims=True)
    if axis_name is not None:
        osum = jax.lax.psum(osum, axis_name)
    o = o / jnp.maximum(osum, 1e-4)
    xyz_sg = jax.lax.stop_gradient(xyz)
    node_xyz0 = jax.lax.stop_gradient(node_xyz0)

    if axis_name is not None:
        use_pallas = False     # guarded above: an explicit True raises
    if use_pallas is None:
        from ogmm_tpu.ops.dispatch import use_pallas as _auto
        # VMEM bound, measured on chip (r3): the kernel keeps ~5 (N, K)
        # blocks resident and Mosaic pads the K lane dim to 128, so the
        # real footprint is N * max(K, 128) * 4 * 5 bytes regardless of a
        # small K (N=8192, K=16 allocated 20.0 MB > the 16 MB scoped VMEM
        # limit under the old N*K rule). Beyond the bound the jnp scan is
        # fine: at indoor scale the (B, N, K<=16) blocks are small in HBM.
        B, N, _ = xyz.shape
        use_pallas = (N * max(n_clusters, 128) * 4 * 5 <= 14 * 2 ** 20
                      and _auto())
    if use_pallas:
        from ogmm_tpu.ops.pallas_em import auto_clouds_per_block, sinkhorn_em
        B, N, _ = xyz.shape
        gamma, pi, node_xyz = sinkhorn_em(
            xyz_sg, o, node_xyz0, iters=iters, sk_iters=10, tau=tau,
            clouds_per_block=auto_clouds_per_block(B, N, n_clusters))
    else:
        gamma, pi, node_xyz = _em_jnp(xyz_sg, o, node_xyz0, iters, tau,
                                      axis_name=axis_name)
    gamma = jax.lax.stop_gradient(gamma)
    pi = jax.lax.stop_gradient(pi)
    node_xyz = jax.lax.stop_gradient(node_xyz)
    # grads flow through feats only
    node_feats = gmm_params(gamma, feats, axis_name=axis_name)[1]
    return gamma, pi, node_xyz, node_feats


def get_local_corrs(xyz: jnp.ndarray, xyz_mu: jnp.ndarray,
                    feats: jnp.ndarray,
                    axis_name: str | None = None) -> jnp.ndarray:
    """Features of the point nearest to each cluster mean.

    xyz (B,N,3), xyz_mu (B,J,3), feats (B,N,C) -> (B,J,C).
    Reference: lib/utils.py:244-254. The argmin runs through the single 1-NN
    dispatch point (ops/common.py:nn1 — fused/streamed kernel on TPU, dense
    or chunked jnp elsewhere; argmin over squared == argmin over cdist).

    `axis_name`: xyz/feats are point-sharded rows — the 1-NN combines
    across shards (ops/common.py:nn1_sp) and the feature gather psums the
    owning shard's rows; xyz_mu is replicated.
    """
    if axis_name is not None:
        from ogmm_tpu.ops.common import index_points_sp, nn1_sp
        idx = nn1_sp(xyz_mu, xyz, axis_name)[1]  # (B, J) global indices
        return index_points_sp(feats, idx, axis_name)
    from ogmm_tpu.ops.common import nn1
    idx = nn1(xyz_mu, xyz)[1]                    # (B, J)
    return index_points(feats, idx)


def get_anchor_corrs(xyz: jnp.ndarray, feats: jnp.ndarray, num_clusters: int,
                     dst: str = 'eu', iters: int = 10, is_fast: bool = True,
                     key: jax.Array | None = None,
                     anchor_ids: jnp.ndarray | None = None):
    """FPS anchor selection + anchor/nearest-point feature gather.

    Returns (feats_anchor (B,J,C), feats_pos (B,J,C), xyz_mu (B,J,3),
    anchor_ids (B,J)). The reference recomputes FPS with an unseeded random
    start at every call site (lib/utils.py:257-266, used 6x per forward at
    models/gmmreg.py:54-57,67-70,92-95); since anchors depend only on xyz,
    callers here may pass `anchor_ids` to reuse one FPS pass — the default in
    our model (documented divergence; config.recompute_anchors restores the
    per-stage recompute).
    """
    if is_fast:
        if anchor_ids is None:
            anchor_ids = farthest_point_sample(xyz, num_clusters, is_center=False, key=key)
        xyz_mu = index_points(xyz, anchor_ids)
        feats_pos = index_points(feats, anchor_ids)
    else:
        gamma, pi, xyz_mu = wkeans(xyz, num_clusters, dst, iters)
        feats_pos = gmm_params(gamma, feats)[1]
        anchor_ids = jnp.argmin(square_distance(xyz_mu, xyz), axis=-1).astype(jnp.int32)
    feats_anchor = get_local_corrs(xyz, xyz_mu, feats)
    return feats_anchor, feats_pos, xyz_mu, anchor_ids
