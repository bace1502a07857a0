"""High-level inference API: register point-cloud pairs with one call.

The reference exposes registration only through its training script's model
object (models/gmmreg.py:50-119 with is_test=True appending ICP). This
wrapper is the serving-side equivalent: build (or restore) a model once,
then call it on (B, N, 3) numpy/jax arrays and get (R, t) back — jitted,
bf16 body, Pallas kernels, batched ICP refinement.

    reg = Registrar(cfg)                          # fresh params
    reg = Registrar.from_checkpoint("checkpoints")  # trained weights
    R, t, src_overlap, tgt_overlap = reg(src, tgt)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ogmm_tpu.configs import Config, mnet


class Registrar:
    """Stateless-weights registration frontend for GMMReg/DeepGMR."""

    def __init__(self, cfg: Optional[Config] = None, variables=None,
                 seed: int = 0, example_n: int = 717):
        from ogmm_tpu.train.state import build_model
        self.cfg = cfg if cfg is not None else mnet()
        self.model = build_model(self.cfg)
        if variables is None:
            rs = np.random.RandomState(seed)
            dummy = jnp.asarray(rs.randn(1, example_n, 3), jnp.float32)
            variables = self.model.init(
                {'params': jax.random.PRNGKey(seed)}, dummy, dummy,
                train=False)
        self.variables = variables
        self._fwd = jax.jit(
            lambda v, s, t, refine: self.model.apply(
                v, s, t, train=False, is_test=refine),
            static_argnames=("refine",))

    @classmethod
    def from_checkpoint(cls, model_path: str, cfg: Optional[Config] = None,
                        name: str = "optim_model",
                        model_name: str = "GMMReg",
                        override_config: bool = False) -> "Registrar":
        """Restore the best checkpoint written by the trainer.

        The trainer saves the Config as JSON beside the checkpoint, so
        `cfg=None` restores with the exact training-time architecture and
        semantics (dtype, stack_eval, ...). Passing a cfg that DIFFERS from
        the saved one raises — a silent mismatch would restore weights into
        a semantically different model; set `override_config=True` to use
        the passed cfg deliberately (e.g. to change eval-only knobs).
        """
        from ogmm_tpu.configs import config_to_dict
        from ogmm_tpu.train.checkpoint import CheckpointManager
        from ogmm_tpu.train.state import create_train_state
        # read-only probe: no CheckpointManager construction (its __init__
        # mkdirs — would litter dirs for mistyped paths / die on RO mounts)
        saved = CheckpointManager.read_config_at(
            CheckpointManager._models_dir(
                model_path, cfg.model_name if cfg else model_name))
        if cfg is None:
            if saved is None:
                raise FileNotFoundError(
                    f"no config.json beside checkpoint under {model_path!r} "
                    "(pre-r3 checkpoint?) — pass cfg= explicitly")
            cfg = saved
        elif saved is not None and not override_config:
            saved_d, cfg_d = config_to_dict(saved), config_to_dict(cfg)
            if saved_d != cfg_d:
                diff = [k for k in ("model", "data", "train", "model_name")
                        if saved_d.get(k) != cfg_d.get(k)]
                raise ValueError(
                    f"cfg mismatch vs the checkpoint's saved config "
                    f"(sections {diff}); pass cfg=None to use the saved "
                    f"one, or override_config=True to force yours")
        B, N = 1, cfg.data.n_points
        rs = np.random.RandomState(0)
        sample = {'src_xyz': rs.randn(B, N, 3).astype(np.float32),
                  'tgt_xyz': rs.randn(B, N, 3).astype(np.float32)}
        model, state, _ = create_train_state(cfg, steps_per_epoch=1,
                                             sample_batch=sample)
        ckpt = CheckpointManager(model_path, cfg.model_name)
        restored = ckpt.restore(state, name)
        if restored is None:
            raise FileNotFoundError(
                f"no checkpoint {name!r} under {model_path}")
        variables = {'params': restored.params,
                     'batch_stats': restored.batch_stats}
        return cls(cfg, variables=variables)

    @classmethod
    def from_weights(cls, path: str,
                     cfg: Optional[Config] = None) -> "Registrar":
        """Restore from a weights-only .npz written by
        `train.checkpoint.export_weights` (single file, params + batch_stats
        + embedded Config — the committable serving artifact; the orbax
        checkpoints carry the full optimizer state for resume instead)."""
        from ogmm_tpu.train.checkpoint import load_weights
        variables, saved = load_weights(path)
        if cfg is None:
            if saved is None:
                raise ValueError(
                    f"{path!r} embeds no config — pass cfg= explicitly")
            cfg = saved
        return cls(cfg, variables=variables,
                   example_n=cfg.data.n_points)

    def export_weights(self, path: str) -> None:
        """Write this Registrar's weights as a single-file .npz artifact."""
        from ogmm_tpu.train.checkpoint import export_weights
        export_weights(self.variables, path, self.cfg)

    def __call__(self, src, tgt, refine: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Register src onto tgt.

        src/tgt: (B, N, 3) arrays (numpy or jax). refine=True appends the
        batched on-device ICP (reference models/gmmreg.py:115-117).
        Returns (rot (B,3,3), trans (B,3), src_overlap (B,N), tgt_overlap (B,N));
        for DeepGMR the overlap outputs are ones.
        """
        src = jnp.asarray(src, jnp.float32)
        tgt = jnp.asarray(tgt, jnp.float32)
        out = self._fwd(self.variables, src, tgt, refine)
        if len(out) == 2:   # DeepGMR
            rot, trans = out
            ones = jnp.ones(src.shape[:2], jnp.float32)
            return rot, trans, ones, jnp.ones(tgt.shape[:2], jnp.float32)
        rot, trans, src_o, tgt_o, _ = out
        return rot, trans, src_o, tgt_o

    def sharded(self, mesh=None, refine: bool = True, axis: str = "sp"):
        """Point-sharded (sequence-parallel) forward over a device mesh.

        Returns `fn(src, tgt) -> (rot, trans, src_overlap, tgt_overlap)`
        computing ONE forward cooperatively across `mesh` (default: a 1-D
        mesh over all local devices) — the serving shape the reference's
        batch-parallelism cannot express: its indoor operating point is
        eval batch 1 at ~35k points (reference configs/cfgs.py:100), where
        only the point axis has parallelism to give. See parallel/sp.py.
        GMMReg only (DeepGMR's forward is already sub-6 ms single-chip).
        """
        if self.cfg.model_name != "GMMReg":
            raise NotImplementedError(
                "sharded serving implements the GMMReg forward")
        from ogmm_tpu.parallel import make_sp_eval, sp_mesh
        if mesh is None:
            mesh = sp_mesh(axis=axis)
        inner = make_sp_eval(self.variables, self.cfg, mesh, axis=axis,
                             is_test=refine)

        def fn(src, tgt):
            rot, trans, src_o, tgt_o, _ = inner(
                jnp.asarray(src, jnp.float32), jnp.asarray(tgt, jnp.float32))
            return rot, trans, src_o, tgt_o

        return fn

    def transform(self, rot, trans, points):
        """Apply the predicted rigid transform to (B, N, 3) points."""
        from ogmm_tpu.core import se3
        pose = jnp.concatenate([rot, trans[..., None]], axis=-1)
        return se3.transform(pose, jnp.asarray(points, jnp.float32))


def registrar_from_torch_checkpoint(path: str, cfg=None) -> "Registrar":
    """Serve a REFERENCE-trained torch checkpoint on TPU.

    Converts the reference GMMReg state_dict (lib/metric.py:293-297 save
    format) via ogmm_tpu.compat and wraps it in a Registrar.
    """
    from ogmm_tpu.compat import load_torch_checkpoint
    cfg = cfg if cfg is not None else mnet()
    variables = load_torch_checkpoint(path, num_heads=cfg.model.num_heads,
                                      emb_dims=cfg.model.emb_dims)
    return Registrar(cfg, variables=variables)
