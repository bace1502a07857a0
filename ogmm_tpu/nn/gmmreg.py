"""GMMReg — the OGMM overlap-guided registration network, TPU-native.

Reference: models/gmmreg.py:32-119. One fixed-shape forward:
DGCNN features -> geometric position encoding -> anchor-conditioned
self-attention -> cross-attention -> overlap head -> second self-attention ->
overlap-weighted Sinkhorn-EM clustering -> soft GMM matching -> weighted
Procrustes (on-device Horn solve) [-> batched ICP at test time].

Everything is channel-last (B, N, C) and jit-clean: the reference's CPU SVD
hop (lib/se3.py:276) and per-item Open3D ICP loop (lib/o3dutils.py:192-214)
are replaced by on-device batched equivalents.

Anchor note: only the `feats_pos` output of the reference's
`get_anchor_corrs` (features gathered at FPS anchor indices,
lib/utils.py:261) is ever consumed by the model (models/gmmreg.py:54-97);
anchors depend only on xyz, so by default we run FPS once per cloud and
re-gather per stage — identical features when the FPS start matches
(config.recompute_anchors restores per-stage recompute with fresh random
starts, the reference's unseeded-randint behaviour, lib/utils.py:190).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ogmm_tpu.configs import ModelConfig
from ogmm_tpu.core.procrustes import rigid_transform
from ogmm_tpu.losses import clu_loss
from ogmm_tpu.nn.attention import PositionEncoding, TransformerBlock
from ogmm_tpu.nn.dgcnn import DGCNN
from ogmm_tpu.nn.layers import ConvHead
from ogmm_tpu.ops.common import (cos_similarity, index_points,
                                 index_points_sp, l2_normalize)
from ogmm_tpu.ops.fps import farthest_point_sample
from ogmm_tpu.ops.gmm import wkeans_plus
from ogmm_tpu.ops.icp import icp_point_to_point
from ogmm_tpu.ops.sinkhorn import sinkhorn


def _overlap_wproject(a_fn, b_fn, a_o, b_o):
    """Both directions of the overlap head's similarity-weighted projection
    WITHOUT materialising the (N, M) similarity matrix (reference
    models/gmmreg.py:81-84). Inputs are l2-normalised features (B,N,D) /
    (B,M,D) and raw scores (B,N,1)/(B,M,1); returns (a_wo, b_wo), both f32.

    Preserves the reference's axis quirk exactly: direction 2 weights the
    SOURCE-axis-indexed scores by the column softmax (requires N == M).
    """
    from ogmm_tpu.ops.dispatch import use_pallas as _auto
    if _auto():
        from ogmm_tpu.ops.pallas_stream import wproject_stream as _wp
    else:
        from ogmm_tpu.ops.pallas_stream import wproject_chunked as _wp
    return _wp(a_fn, b_fn, a_o), _wp(b_fn, a_fn, b_o)


def gmm_svd(src_nodes, tgt_nodes, src_desc, tgt_desc, src_pi, tgt_pi,
            is_sk: bool = False, softmax_temp: float = 0.05):
    """Match two GMMs by feature similarity and solve the rigid transform.

    Reference: models/dgcnn.py:90-115 (`GMMSVD`). GMMReg instantiates the
    softmax path (is_sk=False, models/gmmreg.py:41); the Sinkhorn-OT path is
    kept behind the same flag.

    Returns (rot (B,3,3), trans (B,3), src_corr (B,K,3), tgt_nodes).
    """
    similarity = cos_similarity(src_desc, tgt_desc)           # (B, K, K)
    if is_sk:
        cost = 2.0 * (1.0 - similarity)
        scores = sinkhorn(cost, p=src_pi, q=tgt_pi, epsilon=1e-2, max_iter=30)[0]
        scores = jnp.nan_to_num(scores, nan=1e-4)
        scores = scores / jnp.maximum(scores.sum(axis=-1, keepdims=True), 1e-4)
    else:
        scores = jax.nn.softmax(similarity / softmax_temp, axis=2)
    src_corr = jnp.einsum('bnm,bmd->bnd', scores, tgt_nodes,
                          preferred_element_type=jnp.float32)  # Eq. (4)
    weight = scores.sum(axis=-1)                               # (B, K)
    rot, trans = rigid_transform(src_nodes, src_corr, weight)
    return rot, trans[..., 0], src_corr, tgt_nodes


class GMMReg(nn.Module):
    """The OGMM network. Call: (src, tgt) -> (rot, trans, src_o, tgt_o, clu).

    src/tgt: (B, N, 3) channel-last point clouds (the reference takes
    (B, 3, N), train.py:50-51 — our data pipeline stays channel-last
    throughout). `is_test=True` appends on-device batched ICP refinement
    (reference models/gmmreg.py:115-117).
    """
    cfg: ModelConfig = ModelConfig()
    bn_axis_name: Optional[str] = None
    # Point-sharded (sequence-parallel) eval: the mesh axis that shards the
    # POINT dimension. Callers (parallel/sp.py) pass device-local chunks as
    # src/tgt plus the full replicated clouds as full_src/full_tgt; per-point
    # compute stays shard-local and the cross-shard reductions (EM moments,
    # InstanceNorm stats, overlap softmax key side, Procrustes/ICP moments,
    # anchor gathers) run as XLA collectives. Eval-only (BN batch statistics
    # make the training semantics a different contract) and stacked-path
    # only (the serving default).
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, src: jnp.ndarray, tgt: jnp.ndarray,
                 train: bool = True, is_test: bool = False,
                 full_src: Optional[jnp.ndarray] = None,
                 full_tgt: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        D = cfg.emb_dims
        km = cfg.km_clusters
        B, N, _ = src.shape
        M = tgt.shape[1]
        assert N == M, (
            "the reference overlap head mixes src/tgt point axes and requires "
            "equal point counts (models/gmmreg.py:79-80)")

        sp = self.sp_axis
        if sp is not None:
            assert not train, (
                "sp_axis is an eval/serving contract: BN batch statistics "
                "over a point shard are not reference semantics")
            assert full_src is not None and full_tgt is not None, (
                "sp_axis needs the full replicated clouds (full_src/full_tgt)"
                " beside the device-local chunks")
            assert full_src.shape[1] == full_tgt.shape[1]
            assert cfg.pos_k <= cfg.gnn_k, (
                "sp shares one kNN graph; pos_k must be a prefix of gnn_k")

        # compute dtype for the network body; geometry (kNN, FPS, clustering,
        # Procrustes, ICP) always runs fp32
        dt = None if cfg.dtype in (None, "float32") else cfg.dtype

        # overlap head: materialise the (B, N, M) similarity (ModelNet-scale)
        # or stream its softmax online (indoor ~35k: the dense matrix would
        # be ~4.9 GB at B=1). The streamed path is differentiable — a
        # flash-style recompute VJP (ops/pallas_stream.py:_wproject_bwd) —
        # so indoor-scale training works on TPU too.
        stream_overlap = cfg.overlap_stream
        if stream_overlap is None:
            from ogmm_tpu.ops.common import _DENSE_ELEMS
            stream_overlap = B * N * M > _DENSE_ELEMS

        # Large-N: the kNN selection dominates the forward (profiles/r3:
        # 85% of the indoor eval at N=35k was the two knn_stream calls).
        # DGCNN's k=20 graph and the position encoding's k=5 graph are both
        # built on the same xyz, and knn() sorts ascending with stable
        # ties, so the k=5 graph is EXACTLY the k=20 graph's prefix —
        # compute once, slice. Below the fused-kernel envelope (N <= 1024)
        # the in-VMEM kernels build their own graphs faster than a shared
        # HBM round-trip, so sharing only engages above it.
        share_graph = sp is not None or (N > 1024 and cfg.pos_k <= cfg.gnn_k)
        if cfg.pos_k <= 0:
            # DGCNN returns a bare array for with_posenc_alpha=0; the tuple
            # unpacks below would then silently iterate the batch axis
            # (ADVICE r4). The reference has no pos_k=0 mode either
            # (models/attn.py:59-75 always builds the angle branch).
            raise ValueError(f"cfg.pos_k must be > 0, got {cfg.pos_k}")

        dgcnn = DGCNN(D, cfg.gnn_k, self.bn_axis_name, dt,
                      fused_train=cfg.dgcnn_fused_train,
                      fused_edges=cfg.dgcnn_fused_edges)

        def encode(pts, full_pts=None):
            """DGCNN features + position-encoding angle features for one
            (possibly stacked) cloud, in ORIGINAL row order.

            Graph-space routing (round 5, profiles/r3 2026_08_19 trace):
              * no shared graph (N <= 1024): the fused whole-cloud kernels
                build their own in-VMEM graphs; alpha comes from them on
                TPU, None elsewhere.
              * sp: cross-shaped global-id graph against the full
                replicated cloud (original order; pos_enc re-gathers its
                k=pos_k prefix itself).
              * large-N self graph: Morton-sorted v-space
                (ops/common.py:knn_self_vspace) — the graph stays in
                sorted row order, ONE coordinate gather feeds both the
                edge features and the angle features, and only the final
                (B, N, D) features un-sort. Skips knn_self_spatial's
                sorted->original id remap (14.1 ms/fwd at N=35k).
              * cfg.dgcnn_vspace=False: the round-4 original-order routing
                (A/B control).

            Returns (feats, alpha, g): alpha (B, N, pos_k) f32 or None; g
            is an original-order graph for pos_enc's own prefix gather,
            only set when alpha is None and a shared graph exists.
            """
            from ogmm_tpu.ops.common import (gather_neighbors,
                                             knn as _knn,
                                             knn_self_vspace as _kv)
            if not share_graph:
                f, a = dgcnn(pts, train, with_posenc_alpha=cfg.pos_k)
                return f, a, None
            if sp is not None:
                # local query rows against the full replicated cloud —
                # global indices out, every downstream gather reads full_pts
                g = _knn(pts, full_pts, cfg.gnn_k)
                f, a = dgcnn(pts, train, nbr_idx=g, nbr_pts=full_pts,
                             with_posenc_alpha=cfg.pos_k)
                return f, a, g
            if cfg.dgcnn_vspace is False:
                g = _knn(pts, pts, cfg.gnn_k)
                f, a = dgcnn(pts, train, nbr_idx=g,
                             with_posenc_alpha=cfg.pos_k)
                return f, a, g
            xs, idx, inv = _kv(pts, cfg.gnn_k)
            nbr = gather_neighbors(xs, idx)      # the ONE coordinate gather
            # the pos-enc centroid sums 35k rows: do it in ORIGINAL row
            # order (the r5c gate measured 0.097 deg of rot drift from the
            # sorted-order sum alone — f32 reduction order, bf16-amplified)
            cen = pts.mean(axis=1, keepdims=True)
            f, a = dgcnn(xs, train, nbr_xyz=nbr, with_posenc_alpha=cfg.pos_k,
                         posenc_centroid=cen)
            if inv is not None:
                f = jnp.take_along_axis(f, inv[..., None], axis=1)
                a = jnp.take_along_axis(a, inv[..., None], axis=1)
            return f, a, None
        pos_enc = PositionEncoding(D, self.bn_axis_name, dt)
        _sattn1 = TransformerBlock(D, cfg.num_heads, dt, sp_axis=sp)
        _cattn = TransformerBlock(D, cfg.num_heads, dt, sp_axis=sp)
        _sattn2 = TransformerBlock(D, cfg.num_heads, dt, sp_axis=sp)
        _conv1 = ConvHead(D, 2 * D, deep=True, bn_axis_name=self.bn_axis_name, dtype=dt)
        _conv2 = ConvHead(D, 2 * D, deep=True, bn_axis_name=self.bn_axis_name, dtype=dt)
        _proj = ConvHead(1, D // 2, deep=False, bn_axis_name=self.bn_axis_name, dtype=dt)
        _overlap = ConvHead(1, D // 2, deep=True, bn_axis_name=self.bn_axis_name, dtype=dt)

        # cfg.remat: checkpoint the attention blocks + conv heads so their
        # internal activations are recomputed in the backward instead of
        # stored — the train step is HBM-roofline-bound with the MXU 74%
        # idle (profiles/r3/PROFILE.md), exactly the regime where remat
        # converts spare FLOPs into the bytes that bound the step. The
        # FUNCTION-target form of nn.remat keeps the modules' own scopes, so
        # param trees/checkpoints interchange with the plain path (the class
        # form would rename them Checkpoint*); `train` is closed over, hence
        # static.
        tb_call = (lambda m, x, a: m(x, a, train))
        ch_call = (lambda m, x: m(x, train))
        if cfg.remat:
            tb_call = nn.remat(tb_call)
            ch_call = nn.remat(ch_call)
        sattn1 = partial(tb_call, _sattn1)
        cattn = partial(tb_call, _cattn)
        sattn2 = partial(tb_call, _sattn2)
        conv1 = partial(ch_call, _conv1)
        conv2 = partial(ch_call, _conv2)
        proj = partial(ch_call, _proj)
        overlap = partial(ch_call, _overlap)

        # --- FPS anchors (reference get_anchor_corrs, random-start FPS) ----
        # Documented divergence (PARITY.md "eval anchor start"): the reference
        # seeds anchor FPS at an UNSEEDED random point even at eval
        # (lib/utils.py:190 torch.randint); here, when no 'anchors' rng is
        # supplied (eval/serving), FPS deterministically starts at index 0 —
        # same anchor *coverage* property, reproducible outputs. Pass an
        # 'anchors' rng at apply() time to restore randomized starts.
        if self.has_rng('anchors'):
            kroot = self.make_rng('anchors')
            ks = list(jax.random.split(kroot, 6))
        else:
            ks = [None] * 6

        def norm32(x):
            # l2-normalise with fp32 accumulation, matmul in compute dtype
            return l2_normalize(x.astype(jnp.float32)).astype(x.dtype)

        # At eval every per-cloud stage is a per-sample map, so src and tgt
        # run STACKED as one (2B, N, .) batch: half the serial FPS/EM trips
        # and kernel dispatches, double the matmul heights. Training keeps
        # per-cloud calls — the reference updates BN batch statistics once
        # per cloud (models/gmmreg.py:52-53) and stacking would change them.
        stacked = (cfg.stack_eval and not train) or (cfg.stack_train and train)
        assert sp is None or stacked, (
            "sp_axis requires the stacked eval path (the serving default; "
            "set stack_eval=True)")

        if stacked:
            both = jnp.concatenate([src, tgt], axis=0)          # (2B, N, 3)
            # sp: `both` holds the device-local chunks; FPS / clustering
            # init / kNN targets / edge gathers read the full replicated
            # clouds, and anchor-feature gathers become psum-assembled
            # cross-shard gathers (ops/common.py:index_points_sp).
            both_full = (jnp.concatenate([full_src, full_tgt], axis=0)
                         if sp is not None else None)
            fps_base = both_full if sp is not None else both
            gather = ((lambda a, i: index_points_sp(a, i, sp))
                      if sp is not None else index_points)
            n_stages = 3 if cfg.recompute_anchors else 1
            center_ids = None
            if not cfg.recompute_anchors and km == cfg.n_clusters:
                # anchors + clustering init share one 128-step FPS loop
                from ogmm_tpu.ops.fps import fps_combined
                anchor_ids, center_ids = fps_combined(fps_base, km, key=ks[0])
                ids = [anchor_ids] * 3
            else:
                ids = [farthest_point_sample(fps_base, km, is_center=False,
                                             key=ks[i])
                       for i in range(n_stages)]
                if not cfg.recompute_anchors:
                    ids = ids * 3

            # alpha rides along wherever a fused kernel or the shared
            # gather produces it (~free — the standalone angle pass was
            # 1.40 ms of the 16.6 ms eval forward, profiles/r4/PROFILE.md);
            # when it comes back None pos_enc falls through to its usual
            # branches (g_both's pos_k prefix, or its own graph).
            feats, alpha_both, g_both = encode(both, both_full)
            anchor0 = gather(feats, ids[0])
            t_all = feats + pos_enc(
                both, cfg.pos_k, train,
                nbr_idx=None if g_both is None else g_both[..., :cfg.pos_k],
                centroid=(None if sp is None
                          else both_full.mean(axis=1, keepdims=True)),
                nbr_pts=both_full, alpha=alpha_both)
            t_all = conv1(sattn1(t_all, anchor0) + t_all)

            anchor1 = gather(t_all, ids[1])
            swapped = jnp.concatenate([anchor1[B:], anchor1[:B]], axis=0)
            f_all = cattn(t_all, swapped) + t_all

            src_f, tgt_f = f_all[:B], f_all[B:]
            o_all = proj(f_all)                          # (2B, N, 1)
            src_o, tgt_o = o_all[:B], o_all[B:]
            if sp is not None:
                # each shard's query rows attend over the FULL other cloud:
                # one all-gather of the l2-normalised features + raw scores
                # (the only per-point tensors that cross shards), then the
                # streamed/chunked projection exactly as on one device
                fn_loc = norm32(f_all)
                fn_full = jax.lax.all_gather(fn_loc, sp, axis=1, tiled=True)
                o_full = jax.lax.all_gather(o_all, sp, axis=1, tiled=True)
                from ogmm_tpu.ops.dispatch import use_pallas as _auto
                if _auto():
                    from ogmm_tpu.ops.pallas_stream import wproject_stream as _wp
                else:
                    from ogmm_tpu.ops.pallas_stream import wproject_chunked as _wp
                src_wo = _wp(fn_loc[:B], fn_full[B:], o_full[:B])
                tgt_wo = _wp(fn_loc[B:], fn_full[:B], o_full[B:])
            elif stream_overlap:
                fn_all = norm32(f_all)
                src_wo, tgt_wo = _overlap_wproject(
                    fn_all[:B], fn_all[B:], src_o, tgt_o)
            else:
                sim = jnp.einsum('bnd,bmd->bnm', norm32(src_f), norm32(tgt_f),
                                 preferred_element_type=jnp.float32)
                src_wo = jnp.einsum('bnm,bmd->bnd',
                                    jax.nn.softmax(sim, axis=-1), src_o)
                tgt_wo = jnp.einsum('bnm,bnd->bmd',
                                    jax.nn.softmax(sim, axis=1), tgt_o)
            wo_all = jnp.concatenate([src_wo, tgt_wo], axis=0)
            fo_all = conv2(jnp.concatenate([f_all, wo_all, o_all], axis=-1))
            o_all = nn.sigmoid(
                overlap(fo_all).astype(jnp.float32)).reshape(2 * B, N)

            anchor2 = gather(f_all, ids[2])
            f_all = (sattn2(f_all, anchor2) + f_all).astype(jnp.float32)

            init_nodes = None
            if sp is not None:
                # clustering init reads the full cloud (wkeans_plus cannot
                # FPS or gather global rows from a point shard)
                node0_ids = (center_ids if center_ids is not None
                             else farthest_point_sample(
                                 both_full, cfg.n_clusters, is_center=True))
                init_nodes = index_points(both_full, node0_ids)
                center_ids = None
            g_all, pi_all, n_all, nf_all = wkeans_plus(
                both, f_all, o_all, cfg.n_clusters, iters=cfg.em_iters,
                tau=cfg.tau, init_ids=center_ids, init_nodes=init_nodes,
                axis_name=sp)
            src_f, tgt_f = f_all[:B], f_all[B:]
            src_o, tgt_o = o_all[:B], o_all[B:]
            s_gamma, t_gamma = g_all[:B], g_all[B:]
            s_pi, t_pi = pi_all[:B], pi_all[B:]
            s_nodes, t_nodes = n_all[:B], n_all[B:]
            s_nfeats, t_nfeats = nf_all[:B], nf_all[B:]
        else:
            n_stages = 3 if cfg.recompute_anchors else 1
            src_ids = [farthest_point_sample(src, km, is_center=False, key=ks[i])
                       for i in range(n_stages)]
            tgt_ids = [farthest_point_sample(tgt, km, is_center=False,
                                             key=ks[3 + i])
                       for i in range(n_stages)]
            if not cfg.recompute_anchors:
                src_ids = src_ids * 3
                tgt_ids = tgt_ids * 3

            # --- stage 0: features + position encoding --------------------
            # the fused DGCNN kernels (eval AND the train custom-VJP path)
            # and the shared large-N gather all emit the pos-enc angle
            # features along the way — the standalone angle pass was
            # ~1.4 ms of both the eval forward and the train step
            # (profiles/r4). alpha is None on the small-N naive/CPU paths
            # and pos_enc falls through.
            pk = cfg.pos_k
            src_feats, a_src, g_src = encode(src)             # (B, N, D)
            tgt_feats, a_tgt, g_tgt = encode(tgt)
            src_anchor0 = index_points(src_feats, src_ids[0])  # (B, km, D)
            tgt_anchor0 = index_points(tgt_feats, tgt_ids[0])
            src_t = src_feats + pos_enc(
                src, pk, train,
                nbr_idx=None if g_src is None else g_src[..., :pk],
                alpha=a_src)
            tgt_t = tgt_feats + pos_enc(
                tgt, pk, train,
                nbr_idx=None if g_tgt is None else g_tgt[..., :pk],
                alpha=a_tgt)

            # --- stage 1: anchor-conditioned self-attention ----------------
            src_t = conv1(sattn1(src_t, src_anchor0) + src_t)
            tgt_t = conv1(sattn1(tgt_t, tgt_anchor0) + tgt_t)

            # --- stage 2: cross-attention via anchors ----------------------
            src_anchor1 = index_points(src_t, src_ids[1])
            tgt_anchor1 = index_points(tgt_t, tgt_ids[1])
            src_f = cattn(src_t, tgt_anchor1) + src_t
            tgt_f = cattn(tgt_t, src_anchor1) + tgt_t

            # --- overlap head -----------------------------------------------
            # (reference models/gmmreg.py:74-89; note the reference weights
            # the *source* scores by src_o gathered along the target axis — a
            # quirk that requires N == M and is preserved bit-for-bit here)
            src_o = proj(src_f)                         # (B, N, 1)
            tgt_o = proj(tgt_f)
            if stream_overlap:
                src_wo, tgt_wo = _overlap_wproject(
                    norm32(src_f), norm32(tgt_f), src_o, tgt_o)
            else:
                sim = jnp.einsum('bnd,bmd->bnm', norm32(src_f), norm32(tgt_f),
                                 preferred_element_type=jnp.float32)  # (B, N, M)
                src_wo = jnp.einsum('bnm,bmd->bnd',
                                    jax.nn.softmax(sim, axis=-1), src_o)
                tgt_wo = jnp.einsum('bnm,bnd->bmd',
                                    jax.nn.softmax(sim, axis=1), tgt_o)
            src_fo = conv2(jnp.concatenate([src_f, src_wo, src_o], axis=-1))
            tgt_fo = conv2(jnp.concatenate([tgt_f, tgt_wo, tgt_o], axis=-1))
            # overlap scores feed clustering weights + the loss: fp32 out
            src_o = nn.sigmoid(
                overlap(src_fo).astype(jnp.float32)).reshape(B, N)
            tgt_o = nn.sigmoid(
                overlap(tgt_fo).astype(jnp.float32)).reshape(B, M)

            # --- stage 3: second self-attention ----------------------------
            src_anchor2 = index_points(src_f, src_ids[2])
            tgt_anchor2 = index_points(tgt_f, tgt_ids[2])
            # back to fp32: everything downstream is geometry (clustering
            # EM, cosine matching, Procrustes) + the contrastive loss
            src_f = (sattn2(src_f, src_anchor2) + src_f).astype(jnp.float32)
            tgt_f = (sattn2(tgt_f, tgt_anchor2) + tgt_f).astype(jnp.float32)

            # --- overlap-guided clustering (models/gmmreg.py:100-101) ------
            s_gamma, s_pi, s_nodes, s_nfeats = wkeans_plus(
                src, src_f, src_o, cfg.n_clusters, iters=cfg.em_iters,
                tau=cfg.tau)
            t_gamma, t_pi, t_nodes, t_nfeats = wkeans_plus(
                tgt, tgt_f, tgt_o, cfg.n_clusters, iters=cfg.em_iters,
                tau=cfg.tau)

        # --- soft GMM matching + Procrustes --------------------------------
        rot, trans, _, _ = gmm_svd(s_nodes, t_nodes, s_nfeats, t_nfeats,
                                   s_pi, t_pi, is_sk=cfg.is_sk,
                                   softmax_temp=cfg.softmax_temp)

        # --- clustering contrastive loss (models/gmmreg.py:106-110) --------
        clu = 0.5 * (clu_loss(src, s_nodes, src_f, s_gamma, tau=0.1,
                              axis_name=sp)
                     + clu_loss(tgt, t_nodes, tgt_f, t_gamma, tau=0.1,
                                axis_name=sp))

        if is_test:
            init = jnp.concatenate([rot, trans[..., None]], axis=-1)
            # sp: local source rows against the full replicated target —
            # per-trip 1-NN is shard-local, Procrustes moments psum
            rot, trans = icp_point_to_point(
                src, full_tgt if sp is not None else tgt, init,
                threshold=2.0 * cfg.overlap_radius,
                max_iter=cfg.icp_iters, axis_name=sp)

        return rot, trans, src_o, tgt_o, clu
