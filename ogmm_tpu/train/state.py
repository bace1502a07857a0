"""Train state + optimizer matching the reference recipe.

Reference: train.py:200-202 — torch Adam(lr=1e-4, weight_decay=1e-4) with
MultiStepLR(milestones=[75, 150, 200], gamma=0.1) stepping per *epoch*.

torch's Adam(weight_decay=w) adds w*param to the gradient *before* the moment
updates (L2, not decoupled AdamW); the optax equivalent is
add_decayed_weights ∘ adam. The milestone schedule maps epochs -> steps via
`steps_per_epoch`.

Unlike the reference, the full state (params, batch_stats, optimizer moments,
step, PRNG) is a single pytree that checkpoints/restores losslessly
(reference resumes weights only, train.py:220-225).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ogmm_tpu.configs import Config


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                  # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array                     # PRNG key threaded through anchor FPS

    def next_rng(self) -> Tuple["TrainState", jax.Array]:
        new, sub = jax.random.split(self.rng)
        return self.replace(rng=new), sub


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    boundaries = {int(m) * steps_per_epoch: cfg.train.lr_gamma
                  for m in cfg.train.lr_milestones}
    schedule = optax.piecewise_constant_schedule(
        init_value=cfg.train.lr, boundaries_and_scales=boundaries)
    return optax.chain(
        optax.add_decayed_weights(cfg.train.weight_decay),
        optax.adam(schedule),
    )


def build_model(cfg: Config):
    from ogmm_tpu.nn import DeepGMR, GMMReg
    if cfg.model_name == "GMMReg":
        return GMMReg(cfg=cfg.model)
    if cfg.model_name == "DeepGMR":
        return DeepGMR(cfg=cfg.model)
    raise ValueError(f"unknown model {cfg.model_name!r}")


def create_train_state(cfg: Config, steps_per_epoch: int,
                       sample_batch: Dict[str, Any],
                       seed: int | None = None) -> Tuple[Any, TrainState, optax.GradientTransformation]:
    """Initialise (model, TrainState, tx) from one host batch."""
    model = build_model(cfg)
    seed = cfg.train.seed if seed is None else seed
    root = jax.random.PRNGKey(seed)
    init_key, anchors_key, state_key = jax.random.split(root, 3)
    src = jnp.asarray(sample_batch['src_xyz'])
    tgt = jnp.asarray(sample_batch['tgt_xyz'])
    variables = model.init({'params': init_key, 'anchors': anchors_key},
                           src, tgt, train=False)
    tx = make_optimizer(cfg, steps_per_epoch)
    params = variables['params']
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(params),
        rng=state_key,
    )
    return model, state, tx
