"""Batched, jittable point-to-point ICP refinement — fully on device.

Replaces the reference's test-time Open3D refinement
(lib/o3dutils.py:172-214: per-item Python loop, GPU->CPU->GPU round trip,
C++ KD-tree ICP with `distance_threshold = 2 * voxel_size`). At N<=1024 the
nearest-neighbour search is a (B, N, M) distance matmul + argmin — MXU
friendly — so the whole batch refines in one jitted call.

Open3D's convergence criterion (relative fitness/rmse, max 30 iters) becomes a
fixed iteration count with masked correspondences; parity is validated on
RRE/RTE recall, not per-pair transforms (see SURVEY.md §7 hard-part 7).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ogmm_tpu.core import se3
from ogmm_tpu.core.procrustes import rigid_transform
from ogmm_tpu.ops.common import square_distance


@partial(jax.jit, static_argnames=("max_iter", "method", "use_pallas"))
def icp_point_to_point(src: jnp.ndarray, tgt: jnp.ndarray,
                       init_pose: jnp.ndarray,
                       threshold: float,
                       max_iter: int = 30,
                       method: str = "horn_pi",
                       use_pallas: bool | None = None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Refine an initial rigid transform by fixed-iteration point-to-point ICP.

    Args:
      src: (B, N, 3) source points.
      tgt: (B, M, 3) target points.
      init_pose: (B, 4, 4) or (B, 3, 4) initial transform (maps src -> tgt).
      threshold: correspondence distance gate (Open3D's
        `max_correspondence_distance`; reference uses 2*voxel_size,
        lib/o3dutils.py:175).
      max_iter: fixed trip count (Open3D default ICP max_iteration=30).
      method: Procrustes backend per iteration; 'horn_pi' (shifted power
        iteration) is ~20% faster than the eigh solve over 30 trips at
        equivalent refinement accuracy (RRE within 0.01 deg on chip).

    Returns: (rot (B,3,3), trans (B,3)) refined transform.
    """
    thresh_sq = threshold * threshold
    rot0 = init_pose[..., :3, :3]
    t0 = init_pose[..., :3, 3]
    if use_pallas is None:
        from ogmm_tpu.ops.dispatch import use_pallas as _auto
        # VMEM bound: the 1-NN kernel holds a (tile, M) f32 block
        use_pallas = tgt.shape[1] <= 8192 and _auto()

    def body(carry, _):
        rot, t = carry
        moved = jnp.matmul(src, jnp.swapaxes(rot, -1, -2),
                           precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
        if use_pallas:
            # fused min/argmin — the (B, N, M) matrix never hits HBM
            from ogmm_tpu.ops.pallas_knn import nn1_pallas
            nn_d, nn_i = nn1_pallas(moved, tgt)
        else:
            d = square_distance(moved, tgt)              # (B, N, M)
            nn_d = jnp.min(d, axis=-1)
            nn_i = jnp.argmin(d, axis=-1).astype(jnp.int32)  # (B, N)
        corr = jnp.take_along_axis(tgt, nn_i[..., None], axis=1)  # (B, N, 3)
        w = (nn_d < thresh_sq).astype(src.dtype)         # inlier gate
        # guard: if no inliers, keep previous transform via weight-all fallback
        any_in = w.sum(axis=-1) > 0                      # (B,)
        w = jnp.where(any_in[:, None], w, jnp.ones_like(w))
        rot_new, t_new = rigid_transform(src, corr, w, method=method)
        t_new = t_new[..., 0]
        rot = jnp.where(any_in[:, None, None], rot_new, rot)
        t = jnp.where(any_in[:, None], t_new, t)
        return (rot, t), None

    (rot, t), _ = jax.lax.scan(body, (rot0, t0), None, length=max_iter)
    return rot, t


def refine_registration(src, tgt, rot, trans, voxel_size: float,
                        max_iter: int = 30):
    """Drop-in equivalent of reference `reg_solver` (lib/o3dutils.py:192-214).

    src/tgt: (B, N, 3); rot (B,3,3); trans (B,3) or (B,3,1).
    Returns refined (rot (B,3,3), trans (B,3)).
    """
    init = se3.integrate(rot, trans.reshape(rot.shape[0], 3, 1))
    return icp_point_to_point(src, tgt, init, threshold=2.0 * voxel_size,
                              max_iter=max_iter)
