"""AOT memory-budget regression tests at the indoor operating point.

Round-3 lesson (RESULTS.md Round-3d): a lax.map in `_wproject_bwd` stacked
74 per-chunk (B, M, D) partials into a 21 GB intermediate. The program
COMPILED fine and only failed when a B=4 training launch OOM'd the real
chip — toy-shape parity tests cannot see this class of bug. These tests
close that hole pre-chip: `jax.jit(...).lower(shapes).compile()` on the CPU
backend runs the full XLA buffer assignment WITHOUT executing anything, and
`memory_analysis()` reports the peak. A v5e chip has 16 GB HBM; we budget
14 GB to leave headroom for the runtime.

Shapes are abstract (ShapeDtypeStruct) — no 35k-point arrays are ever
materialised, and params are initialised once at a small N (no parameter
shape depends on the point count). Only compile time is paid (~1-2 min for
the train step on the 1-core host).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ogmm_tpu.configs import indoor
from ogmm_tpu.nn import GMMReg

GB = 2 ** 30
BUDGET = 14 * GB          # v5e HBM is 16 GB; leave runtime headroom
N_INDOOR = 34992          # ~35k, divisible by 8 for the sp mesh


def _peak(compiled) -> int:
    ma = compiled.memory_analysis()
    # peak_memory_in_bytes alone excludes some buffer classes on CPU; the
    # conservative on-chip bound is args + outputs + temps (donation can
    # only lower it)
    return (ma.argument_size_in_bytes + ma.output_size_in_bytes
            + ma.temp_size_in_bytes - ma.alias_size_in_bytes)


def _indoor_cfg(B):
    cfg = indoor()
    return cfg.replace(
        model=dataclasses.replace(cfg.model, dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, batch_size=B))


def _variables(cfg):
    """Init at a small N — GMMReg parameter shapes are N-independent."""
    model = GMMReg(cfg=cfg.model)
    x = jnp.zeros((1, 1024, 3), jnp.float32)
    return model, model.init({'params': jax.random.PRNGKey(0)}, x, x,
                             train=False)


def test_eval_forward_fits_hbm():
    cfg = _indoor_cfg(1)
    model, variables = _variables(cfg)
    fn = jax.jit(lambda s, t: model.apply(variables, s, t, train=False,
                                          is_test=True))
    s = jax.ShapeDtypeStruct((1, N_INDOOR, 3), jnp.float32)
    peak = _peak(fn.lower(s, s).compile())
    assert peak < BUDGET, f"indoor eval fwd peak {peak/GB:.1f} GB"


def test_train_step_memory_regression():
    """The exact program of the r3d indoor training launch (B=4, N=35k).

    The CPU buffer plan is NOT representative for this program: measured
    2026-08-19, the CPU plan allocates 125.1 GB of temps while the REAL
    TPU lowering of the same program plans 14.15 GiB (args+temps; the
    B=4 launch runs on a 16 GB v5e, B=8 OOMs — both consistent with the
    TPU number). CPU XLA keeps the naive DGCNN stage activations and
    their f32 upcasts live across the whole backward where the TPU
    pipeline fuses/reuses them. So this asserts a REGRESSION TRIPWIRE on
    the CPU plan (baseline + headroom) rather than the chip budget — a
    new stacked-intermediate bug of the r3d class (21 GB in one shot)
    still trips it, growth tracks real growth, but the absolute number
    means nothing for the chip. Eval/sp below stay on the true budget
    (their CPU plans are lean and in-band).
    """
    from ogmm_tpu.train.state import create_train_state
    from ogmm_tpu.train.trainer import BATCH_KEYS, make_train_step

    CPU_PLAN_BASELINE = 126 * GB      # measured 125.1 GB, 2026-08-19
    HEADROOM = 1.10                   # VERDICT r4 #6: 1.25 let the r3d
    # class (a 21 GB one-shot stacked intermediate) pass silently at
    # 146 < 157.5 GB. Static guard: the budget must always trip on it.
    assert CPU_PLAN_BASELINE * HEADROOM < CPU_PLAN_BASELINE + 21 * GB

    B = 4
    cfg = _indoor_cfg(B)
    sample = {
        'src_xyz': np.zeros((B, 256, 3), np.float32),
        'tgt_xyz': np.zeros((B, 256, 3), np.float32),
        'src_overlap': np.ones((B, 256), np.float32),
        'tgt_overlap': np.ones((B, 256), np.float32),
        'transform_gt': np.broadcast_to(
            np.eye(4, dtype=np.float32)[:3], (B, 3, 4)).copy(),
    }
    model, state, tx = create_train_state(cfg, steps_per_epoch=10,
                                          sample_batch=sample)
    step = make_train_step(model, tx, cfg)
    batch_abs = {
        'src_xyz': jax.ShapeDtypeStruct((B, N_INDOOR, 3), jnp.float32),
        'tgt_xyz': jax.ShapeDtypeStruct((B, N_INDOOR, 3), jnp.float32),
        'src_overlap': jax.ShapeDtypeStruct((B, N_INDOOR), jnp.float32),
        'tgt_overlap': jax.ShapeDtypeStruct((B, N_INDOOR), jnp.float32),
        'transform_gt': jax.ShapeDtypeStruct((B, 3, 4), jnp.float32),
    }
    assert set(batch_abs) == set(BATCH_KEYS)
    state_abs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        state)
    peak = _peak(step.lower(state_abs, batch_abs).compile())
    assert peak < CPU_PLAN_BASELINE * HEADROOM, (
        f"indoor train step CPU-plan peak {peak/GB:.1f} GB grew >10% over "
        f"the {CPU_PLAN_BASELINE/GB:.0f} GB baseline — a new stacked "
        f"intermediate (r3d class)? Re-measure the baseline only if the "
        f"growth is intended and understood.")


def test_sp_forward_fits_hbm():
    """Per-device footprint of the point-sharded serving program."""
    from ogmm_tpu.parallel import make_sp_eval, sp_mesh
    cfg = _indoor_cfg(1)
    _, variables = _variables(cfg)
    fn = make_sp_eval(variables, cfg, sp_mesh(8), is_test=True)
    s = jax.ShapeDtypeStruct((1, N_INDOOR, 3), jnp.float32)
    peak = _peak(fn.lower(s, s).compile())
    assert peak < BUDGET, f"sp eval fwd peak {peak/GB:.1f} GB"


def test_wproject_grad_memory_regression():
    """The r3d bug, pinned at its exact shape: grad of the flash-style
    overlap projection at B=4, N=M=35k, D=512. The buggy lax.map stacked
    nc=74 per-chunk (B, M, D) partials = 21 GB; the scan-carry fix keeps
    ~3 materialised (B, M, D)-class buffers (~1 GB). 4 GB is the tripwire.
    """
    from ogmm_tpu.ops.pallas_stream import wproject_stream
    B, N, D = 4, 35000, 512

    def loss(q, k, v):
        return wproject_stream(q, k, v, interpret=True).sum()

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    q = jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16)
    v = jax.ShapeDtypeStruct((B, N, 1), jnp.float32)
    peak = _peak(g.lower(q, q, v).compile())
    assert peak < 4 * GB, (
        f"wproject VJP peak {peak/GB:.1f} GB — the lax.map-stacking "
        f"regression (r3d: 21 GB) is back?")
