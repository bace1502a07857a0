"""Fused eval-mode PointMLP kernel: Dense -> InstanceNorm -> relu -> Dense.

The three attention blocks each end in a PointMLP (reference models/attn.py
MLP, nn/layers.py:PointMLP): Dense(2D) + InstanceNorm + relu + Dense(D) over
(B, N, 1024). Composed in XLA that is ~3.5 ms of the eval forward at the
bench shape (profiles/r2/PROFILE.md: the 1024-wide dense fusions + the
per-sample InstanceNorm reductions) — the IN stats break the matmul chain
into separate HBM-bound fusions. This kernel runs one cloud per program with
everything VMEM-resident: first matmul, fp32 IN statistics via ones-matmul
reductions over the point axis (the sublane direction), normalise+relu in
the compute dtype, second matmul.

Eval-only (no VJP): training keeps the jnp composition, whose autodiff XLA
handles. InstanceNorm semantics match nn/layers.py:instance_norm — fp32
two-pass biased variance over the N axis, eps 1e-5, normalised output cast
back to the compute dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, dtype):
    dt = dtype
    x = x_ref[0].astype(dt)                      # (N, Cin)
    N = x.shape[0]
    w1 = w1_ref[:].astype(dt)                    # (Cin, H)
    b1 = b1_ref[0].astype(dt)                    # (H,)
    w2 = w2_ref[:].astype(dt)                    # (H, Cout)
    b2 = b2_ref[0].astype(dt)

    # round the Dense output to the compute dtype BEFORE the IN statistics —
    # nn.Dense(dtype=bf16) emits bf16 and nn/layers.py:instance_norm takes
    # its fp32 moments over those rounded values; stats on the unrounded f32
    # accumulator would be a semantic divergence, not just dtype noise
    z = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (N, H) f32
    z = (z.astype(dt) + b1[None]).astype(jnp.float32)

    # InstanceNorm over N (fp32 two-pass): reductions over the sublane axis
    # ride the MXU as ones-matmuls
    ones = jnp.ones((8, N), jnp.float32)
    mean = (jax.lax.dot_general(ones, z, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[0:1]
            / N)                                                 # (1, H)
    cz = z - mean
    var = (jax.lax.dot_general(ones, cz * cz, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)[0:1]
           / N)
    h = jnp.maximum((cz * jax.lax.rsqrt(var + 1e-5)).astype(dt), 0)

    out = jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[0] = (out.astype(dt) + b2)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def pointmlp_eval_pallas(x: jnp.ndarray, w1, b1, w2, b2,
                         dtype=jnp.bfloat16,
                         interpret: bool = False) -> jnp.ndarray:
    """(B, N, Cin) -> (B, N, Cout): Dense(w1,b1) + IN + relu + Dense(w2,b2),
    one cloud per program. Weights fp32 (cast to `dtype` in-kernel like
    nn.Dense(dtype=...) does); output in `dtype`."""
    B, N, Cin = x.shape
    H = w1.shape[1]
    Cout = w2.shape[1]
    dt = jnp.dtype(dtype)
    kern = functools.partial(_mlp_kernel, dtype=dt)

    def full(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda b, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    w1f = w1.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    b1f = b1.astype(jnp.float32)[None]
    b2f = b2.astype(jnp.float32)[None]
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, Cin), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  full(w1f), full(b1f), full(w2f), full(b2f)],
        out_specs=pl.BlockSpec((1, N, Cout), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, Cout), dt),
        interpret=interpret,
    )(x, w1f, b1f, w2f, b2f)
