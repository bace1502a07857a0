"""Farthest-point sampling as a batched lax.fori_loop.

Reference: lib/utils.py:170-198 (torch, batched, sequential python loop) and
datasets/datautils.py:249-272 (numpy per-cloud). The 128-step serial chain is
inherent to FPS; each step is a fully-vectorised (B, N) distance update +
argmax on the VPU, so the loop body is cheap and the whole thing stays
on-device with zero host sync.

Randomness: the reference's non-center variant uses *unseeded*
torch.randint (lib/utils.py:190). We thread an explicit jax PRNG key instead —
real determinism (the reference's --seed flag is dead, configs/cfgs.py:58).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("npoint", "is_center", "use_pallas"))
def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          is_center: bool = False,
                          key: jax.Array | None = None,
                          use_pallas: bool | None = None) -> jnp.ndarray:
    """Sample `npoint` indices per cloud by farthest-point traversal.

    Args:
      xyz: (B, N, 3) points.
      npoint: number of samples (static).
      is_center: seed traversal from the point farthest from the centroid
        (deterministic; reference lib/utils.py:183-188). Otherwise start from
        a random index drawn from `key` (or index 0 if no key given).
      key: PRNG key for the random start.
      use_pallas: run the VMEM-resident kernel (ops/pallas_fps.py). Default
        False: after the round-2 layout fix this fori_loop runs the whole
        128-step chain in ~0.03 ms at B=48 (points carried as (B, 3, N) so
        every update keeps N on the lanes) — far below the kernel's
        per-step cross-lane argmax cost; kept opt-in for the record.

    Returns: int32 (B, npoint) indices.
    """
    B, N, _ = xyz.shape
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        from ogmm_tpu.ops.pallas_fps import fps_pallas
        if is_center:
            return fps_pallas(xyz, npoint, is_center=True)
        start = (jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
                 if key is not None else jnp.zeros((B,), jnp.int32))
        return fps_pallas(xyz, npoint, is_center=False, start=start)
    distance = jnp.full((B, N), 1e10, dtype=xyz.dtype)
    if is_center:
        centroid = xyz.mean(axis=1, keepdims=True)
        dist = ((xyz - centroid) ** 2).sum(-1)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
    elif key is not None:
        farthest = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    else:
        farthest = jnp.zeros((B,), dtype=jnp.int32)

    return _fps_loop(xyz, npoint, distance, farthest)


def _fps_loop(xyz: jnp.ndarray, npoint: int, distance: jnp.ndarray,
              farthest: jnp.ndarray) -> jnp.ndarray:
    """Shared FPS recurrence from an explicit (distance, start) state.

    Layout: the loop carries the points TRANSPOSED to (B, 3, N) so every
    per-step tensor keeps N on the 128-lane axis — the natural (B, N, 3)
    form puts the size-3 coordinate axis on lanes and wastes 125/128 of the
    VPU (measured 2.8 of the 3.1 ms loop cost at B=96, N=717;
    profiles/r2/PROFILE.md). The selected point is picked by a one-hot
    multiply-reduce rather than a lane-dim gather; results are bit-identical
    to the direct form (exact pick, same 3-term sum order, same argmax tie
    rule)."""
    B, N, _ = xyz.shape
    xt = jnp.swapaxes(xyz, 1, 2)                        # (B, 3, N)
    centroids0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[:, i].set(farthest)
        onehot = (iota == farthest[:, None]).astype(xt.dtype)       # (B, N)
        centroid = (xt * onehot[:, None, :]).sum(-1, keepdims=True)  # (B,3,1)
        dist = ((xt - centroid) ** 2).sum(1)                        # (B, N)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids, _, _ = jax.lax.fori_loop(0, npoint, body, (centroids0, distance, farthest))
    return centroids


def fps_combined(xyz: jnp.ndarray, npoint: int,
                 key: jax.Array | None = None):
    """Anchor FPS and centre-seeded FPS over the same clouds in ONE loop.

    The GMMReg forward needs two independent FPS passes per cloud: random/
    zero-start anchors (lib/utils.py:190) and the centre-seeded clustering
    init (lib/utils.py:183-188). The 128-step chain's cost is per-op issue
    overhead, not arithmetic, so running both as one 2B-row loop costs the
    same as one pass. Returns (anchor_ids (B,npoint), center_ids (B,npoint)).
    """
    B, N, _ = xyz.shape
    big = jnp.concatenate([xyz, xyz], axis=0)               # (2B, N, 3)

    dist_anchor = jnp.full((B, N), 1e10, dtype=xyz.dtype)
    if key is not None:
        start_anchor = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    else:
        start_anchor = jnp.zeros((B,), dtype=jnp.int32)

    centroid = xyz.mean(axis=1, keepdims=True)
    dist_center = jnp.minimum(((xyz - centroid) ** 2).sum(-1),
                              jnp.full((B, N), 1e10, dtype=xyz.dtype))
    start_center = jnp.argmax(dist_center, axis=-1).astype(jnp.int32)

    ids = _fps_loop(big, npoint,
                    jnp.concatenate([dist_anchor, dist_center], axis=0),
                    jnp.concatenate([start_anchor, start_center], axis=0))
    return ids[:B], ids[B:]
