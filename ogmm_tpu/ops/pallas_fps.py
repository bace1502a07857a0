"""Farthest-point sampling as one VMEM-resident Pallas kernel.

FPS is a 128-step serial chain (reference lib/utils.py:170-198); composed
from jnp ops (ops/fps.py) each step is ~5 separate HLO ops over the (B, N)
distance table inside a lax.while_loop — per-op overhead dominates at these
sizes (~1.5 ms per call at B=24, N=717). Here the entire batch state lives
in VMEM for the whole traversal and each step is a handful of VPU ops.

Layout: points travel as (B, 3, N) — N on the lane axis. A channel-last
(B, N, 3) block would pad 3 -> 128 lanes (42x memory blowup, VMEM OOM at
B=24); transposed, the whole state is ~600 KB.

Mosaic restrictions shape two choices: selected indices accumulate via
masked select on an iota (dynamic lane-dim stores don't lower), and the
chosen point is extracted with a one-hot reduction (no dynamic gather).

Semantics identical to ops/fps.py:farthest_point_sample (same init, same
min/argmax recurrence) — verified in interpret mode against the jnp path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(xyz_ref, start_ref, out_ref, *, npoint: int,
                is_center: bool):
    x3 = xyz_ref[:]                        # (B, 3, N) f32
    B, _, N = x3.shape

    distance = jnp.full((B, N), 1e10, jnp.float32)
    if is_center:
        centroid = jnp.mean(x3, axis=2, keepdims=True)          # (B, 3, 1)
        d = jnp.sum((x3 - centroid) ** 2, axis=1)               # (B, N)
        distance = jnp.minimum(distance, d)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
    else:
        farthest = start_ref[:, 0]         # (B,)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    colp = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), 1)

    def body(i, carry):
        idxs, distance, farthest = carry
        idxs = jnp.where(colp == i, farthest[:, None], idxs)
        onehot = (col == farthest[:, None]).astype(jnp.float32)  # (B, N)
        centroid = jnp.sum(onehot[:, None, :] * x3, axis=2,
                           keepdims=True)                        # (B, 3, 1)
        d = jnp.sum((x3 - centroid) ** 2, axis=1)                # (B, N)
        distance = jnp.minimum(distance, d)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return idxs, distance, farthest

    idxs, _, _ = jax.lax.fori_loop(
        0, npoint, body,
        (jnp.zeros((B, npoint), jnp.int32), distance, farthest))
    out_ref[:] = idxs


@functools.partial(jax.jit, static_argnames=("npoint", "is_center",
                                             "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int, is_center: bool = False,
               start: jnp.ndarray | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """(B, N, 3) -> int32 (B, npoint) FPS indices (see ops/fps.py)."""
    B, N, _ = xyz.shape
    if start is None:
        start = jnp.zeros((B,), jnp.int32)
    kern = functools.partial(_fps_kernel, npoint=npoint, is_center=is_center)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        interpret=interpret,
    )(jnp.swapaxes(xyz.astype(jnp.float32), 1, 2),
      start.astype(jnp.int32)[:, None])
