"""DGCNN edge-conv encoder, channel-last, with a fully-fused eval path.

Reference: models/dgcnn.py:118-154. Five 1x1-conv stages over edge features
from a single kNN graph built on the raw xyz input; each stage is
Dense -> BN -> ReLU with a max over the k neighbour axis tapped off after
each; the four tap-offs concatenate (64+64+128+256 = 512) into a final
Dense(emb_dims) -> BN -> ReLU.

Two compute paths over ONE parameter set (explicit self.param/self.variable
— checkpoints are interchangeable between paths):

  * naive (training + CPU): jnp composition — kNN graph, materialised
    (B, N, k, C) edge tensor, per-stage matmuls. BN uses batch statistics
    and updates running stats; autodiff works.
  * fused (eval on TPU): one Pallas kernel per 128-query tile computes the
    distance block, the k neighbour passes, all stage matmuls, maxes, and
    the final Dense without the edge tensor ever reaching HBM
    (ops/pallas_dgcnn.py). BN folds into per-channel affines from running
    stats. Not differentiable — selected only when train=False on a TPU
    backend (or via `fused`).

BatchNorm here is a manual implementation with torch/flax semantics:
eps=1e-5, biased variance, running = 0.9*running + 0.1*batch, stats in fp32,
normalisation in the compute dtype, optional cross-replica pmean via
`bn_axis_name` (under jit/pjit stats are already global — sync-BN).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ogmm_tpu.ops.common import graph_feature, knn

_STAGES = (64, 64, 128, 256)


class DGCNN(nn.Module):
    emb_dims: int = 512
    k: int = 20
    bn_axis_name: str | None = None
    dtype: str | None = None    # compute dtype for the conv stack; the kNN
                                # graph is built on fp32 xyz either way
    fused: bool | None = None   # None = auto (eval + TPU backend)
    fused_train: bool | None = None  # None = auto (train + TPU backend);
                                # the custom-VJP path of ops/dgcnn_train.py
                                # (same math/params/stats as naive, grads
                                # proven in tests/test_dgcnn_train_fused.py)
    fused_edges: bool | None = None  # None = auto (eval + TPU + large N +
                                # a supplied graph): run the stage chain as
                                # the large-N fused kernel over pre-gathered
                                # neighbour coordinates
                                # (ops/pallas_dgcnn.py:dgcnn_edges_pallas)
                                # instead of the jnp composition

    def _bn(self, name: str, z: jnp.ndarray, train: bool) -> jnp.ndarray:
        """BatchNorm over all axes but the last (torch BN2d semantics)."""
        C = z.shape[-1]
        scale = self.param(f'{name}_scale', nn.initializers.ones, (C,))
        bias = self.param(f'{name}_bias', nn.initializers.zeros, (C,))
        ra_mean = self.variable('batch_stats', f'{name}_mean',
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable('batch_stats', f'{name}_var',
                               lambda: jnp.ones((C,), jnp.float32))
        if train:
            z32 = z.astype(jnp.float32)
            axes = tuple(range(z.ndim - 1))
            mean = z32.mean(axes)
            var = z32.var(axes)
            if self.bn_axis_name is not None:
                mean = jax.lax.pmean(mean, self.bn_axis_name)
                var = jax.lax.pmean(var, self.bn_axis_name)
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
        else:
            mean, var = ra_mean.value, ra_var.value
        dt = z.dtype
        inv = jax.lax.rsqrt(var + 1e-5)
        return ((z - mean.astype(dt)) * (inv * scale).astype(dt)
                + bias.astype(dt))

    def _folded_affine(self, name: str, C: int):
        """(scale, bias) folding BN running stats — the eval-mode affine."""
        scale = self.param(f'{name}_scale', nn.initializers.ones, (C,))
        bias = self.param(f'{name}_bias', nn.initializers.zeros, (C,))
        mean = self.variable('batch_stats', f'{name}_mean',
                             lambda: jnp.zeros((C,), jnp.float32)).value
        var = self.variable('batch_stats', f'{name}_var',
                            lambda: jnp.ones((C,), jnp.float32)).value
        s = scale * jax.lax.rsqrt(var + 1e-5)
        return s, bias - mean * s

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 nbr_idx: jnp.ndarray | None = None,
                 nbr_pts: jnp.ndarray | None = None,
                 nbr_xyz: jnp.ndarray | None = None,
                 with_posenc_alpha: int = 0,
                 posenc_centroid: jnp.ndarray | None = None):
        """x: (B, N, 3) points -> (B, N, emb_dims) features.

        `with_posenc_alpha` (static k2 > 0): return (feats, alpha) where
        alpha (B, N, k2) f32 holds the PositionEncoding angle features for
        the k2 nearest neighbours — emitted ~free by the fused eval kernel
        (it already selects and gathers every neighbour; the standalone
        angle pass was 1.40 ms of the 16.6 ms eval forward, profiles/r4).
        alpha is None when this call does not take the fused eval kernel —
        the caller falls back to PositionEncoding's own paths.

        `nbr_idx` (B, N, k) optionally supplies the kNN graph (the naive
        path only — the fused kernels build it in-VMEM and only engage at
        N <= 1024). GMMReg passes a shared graph at large N, where the kNN
        selection dominates the forward (profiles/r3): the position
        encoding's k=5 graph is a prefix of this k=20 graph.

        `nbr_pts` (B, M, 3) supplies the gather source for the edge
        features when x is a device-local query chunk of a point-sharded
        forward (parallel/sp.py) and nbr_idx holds global indices into it.
        Setting it disables the fused kernels (they are whole-cloud
        single-device designs).

        `nbr_xyz` (B, N, k, 3) supplies PRE-GATHERED neighbour coordinates
        — the large-N shared-graph path (nn/gmmreg.py) gathers the graph's
        coordinates once (in whatever row space the graph lives in, see
        ops/common.py:knn_self_vspace) and feeds DGCNN, the position-
        encoding angles, and the fused edges kernel from that single
        gather. Mutually redundant with nbr_idx (nbr_xyz wins); when
        given, `with_posenc_alpha` is honoured on the naive and
        fused-edges paths too (alpha from the same f32 prefix).

        `posenc_centroid` (B, 1, 3) optionally supplies the cloud centroid
        for those alpha angles. When x lives in a permuted row space
        (v-space), x.mean(axis=1) sums rows in a different order than the
        original-order path — an f32 reduction-order difference the bf16
        body amplifies to ~0.1 deg of rotation drift at indoor scale (r5c
        chip gate). Callers pass the ORIGINAL-order centroid so the
        v-space forward is math-identical to the control routing.
        """
        init = nn.initializers.lecun_normal()
        dims = [6] + list(_STAGES)
        ws = [self.param(f'w{i+1}', init, (dims[i], dims[i + 1]))
              for i in range(4)]
        w5 = self.param('w5', init, (sum(_STAGES), self.emb_dims))

        fused = self.fused
        if fused is None:
            from ogmm_tpu.ops.dispatch import use_pallas as _auto
            # N bound: the fused kernel holds an (N, N) f32 block in VMEM
            fused = (not train) and x.shape[1] <= 1024 and _auto() \
                and nbr_pts is None

        if fused and not self.is_initializing():
            from ogmm_tpu.ops.pallas_dgcnn import dgcnn_eval_pallas
            affines = [self._folded_affine(f'bn{i+1}', dims[i + 1])
                       for i in range(4)]
            affines.append(self._folded_affine('bn5', self.emb_dims))
            dt = jnp.dtype(self.dtype) if self.dtype else jnp.float32
            return dgcnn_eval_pallas(x, ws + [w5], affines, k=self.k,
                                     dtype=dt,
                                     posenc_k=with_posenc_alpha)

        fused_edges = self.fused_edges
        have_graph = nbr_xyz is not None or nbr_idx is not None
        if fused_edges is None:
            # OPT-IN (cfg.dgcnn_fused_edges=True): the kernel's chip parity
            # is gated (verify_r5c sections 2a/2b: Mosaic lowering 3e-4,
            # truth-anchored deviation equal to the naive path's in f32 AND
            # bf16) but no timing win is measured at the indoor shape — the
            # fresh profile (profiles/r3 2026_08_19) puts the naive stage
            # chain at only ~4 ms of the 124 ms forward, and the repo rule
            # is measure-before-keeping for default-path kernels.
            fused_edges = False
        elif fused_edges and (train or not have_graph or nbr_pts is not None):
            # an explicit force must not silently take the naive path
            raise ValueError(
                "fused_edges=True needs eval mode, a supplied graph "
                "(nbr_idx or nbr_xyz), and no nbr_pts: the kernel folds BN "
                "running stats (eval-only, no VJP) and gathers neighbour "
                "coordinates from x itself")
        if fused_edges and not self.is_initializing():
            from ogmm_tpu.ops.common import gather_neighbors, posenc_alpha
            from ogmm_tpu.ops.pallas_dgcnn import dgcnn_edges_pallas
            affines = [self._folded_affine(f'bn{i+1}', dims[i + 1])
                       for i in range(4)]
            affines.append(self._folded_affine('bn5', self.emb_dims))
            dt = jnp.dtype(self.dtype) if self.dtype else jnp.float32
            nbr = (nbr_xyz if nbr_xyz is not None
                   else gather_neighbors(x.astype(jnp.float32), nbr_idx))
            out = dgcnn_edges_pallas(x, nbr, ws + [w5], affines, k=self.k,
                                     dtype=dt)
            if with_posenc_alpha:
                # from the same f32 neighbour block — the angle math never
                # sees rounded coordinates (the r4/r5 alpha lesson)
                return out, posenc_alpha(x, nbr[:, :, :with_posenc_alpha],
                                         posenc_centroid)
            return out

        fused_train = self.fused_train
        if fused_train is None:
            from ogmm_tpu.ops.dispatch import use_pallas as _auto
            # auto: TPU + fusable N. Measured 52.5 vs 53.3 ms/step naive at
            # the bench shape (graph_stage1 kernel replaces kNN + edge
            # gather); CPU keeps the naive composition. A pre-gathered
            # graph (nbr_xyz) keeps the naive path — the fused-train kernel
            # builds its own in-VMEM graph and would waste the gather.
            fused_train = (x.shape[1] <= 1024 and _auto()
                           and nbr_pts is None and nbr_xyz is None)
        elif fused_train and self.bn_axis_name is not None:
            # an explicit force must not silently measure the naive path
            # (ADVICE r2): the fused custom-VJP path computes BN moments
            # inside the kernel and cannot cross-replica pmean them
            raise ValueError(
                "dgcnn_fused_train=True is incompatible with "
                "bn_axis_name (sync-BN): the fused path cannot pmean its "
                "batch moments. Leave fused_train=None (auto) or unset "
                "bn_axis_name.")
        if (train and fused_train and not self.is_initializing()
                and self.bn_axis_name is None):
            from ogmm_tpu.ops.dgcnn_train import dgcnn_train_fused
            chans = list(_STAGES) + [self.emb_dims]
            gammas, betas, ras = [], [], []
            for i, C in enumerate(chans):
                gammas.append(self.param(f'bn{i+1}_scale',
                                         nn.initializers.ones, (C,)))
                betas.append(self.param(f'bn{i+1}_bias',
                                        nn.initializers.zeros, (C,)))
                ras.append((
                    self.variable('batch_stats', f'bn{i+1}_mean',
                                  lambda C=C: jnp.zeros((C,), jnp.float32)),
                    self.variable('batch_stats', f'bn{i+1}_var',
                                  lambda C=C: jnp.ones((C,), jnp.float32))))
            out, moments, alpha = dgcnn_train_fused(
                x, ws + [w5], gammas, betas, k=self.k,
                dtype=self.dtype or 'float32',
                posenc_k=with_posenc_alpha)
            for (ra_mean, ra_var), (mean, var) in zip(ras, moments):
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
            return (out, alpha) if with_posenc_alpha else out

        alpha = None
        if nbr_xyz is not None:
            center = jnp.broadcast_to(x[:, :, None, :], nbr_xyz.shape)
            e = jnp.concatenate([nbr_xyz - center, center], axis=-1)
            if with_posenc_alpha:
                from ogmm_tpu.ops.common import posenc_alpha
                alpha = posenc_alpha(x, nbr_xyz[:, :, :with_posenc_alpha],
                                     posenc_centroid)
        else:
            idx = nbr_idx if nbr_idx is not None else knn(x, x, self.k)
            e = graph_feature(x, self.k, idx=idx, nbr_pts=nbr_pts)  # (B,N,k,6)
        if self.dtype is not None:
            e = e.astype(self.dtype)                 # halve edge-tensor HBM traffic

        def stage(h, i):
            z = jnp.einsum('...i,io->...o', h, ws[i].astype(h.dtype),
                           preferred_element_type=jnp.float32).astype(h.dtype)
            return nn.relu(self._bn(f'bn{i+1}', z, train))

        h = stage(e, 0)
        x1 = h.max(axis=2)                           # (B, N, 64)
        h = stage(h, 1)
        x2 = h.max(axis=2)
        h = stage(h, 2)
        x3 = h.max(axis=2)
        h = stage(h, 3)
        x4 = h.max(axis=2)

        cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)   # (B, N, 512)
        z = jnp.einsum('...i,io->...o', cat, w5.astype(cat.dtype),
                       preferred_element_type=jnp.float32).astype(cat.dtype)
        out = nn.relu(self._bn('bn5', z, train))
        return (out, alpha) if with_posenc_alpha else out
