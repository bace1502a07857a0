"""SE(3) rigid-transform algebra, TPU-native (pure jax.numpy, jit/vmap-safe).

Functional parity with the reference's torch/numpy SE(3) families
(reference: lib/se3.py:14-117 for compose/invert/apply, lib/se3.py:120-253 for
quaternion/matrix conversions) but written once, batched, and branch-free so
every function works under jit on fixed shapes.

Conventions:
  - A pose is a (..., 3, 4) or (..., 4, 4) matrix [R | t].
  - Points are (..., N, 3), channel-last (TPU lane-friendly).
  - Quaternions are (w, x, y, z), positive-w canonical form
    (matches transforms3d.quaternions.mat2quat used at reference lib/se3.py:224-229).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# This platform's default matmul precision is reduced (bf16-class) even for
# fp32 inputs; geometry algebra must be exact fp32, so every matmul in this
# module pins Precision.HIGHEST. These are (..., 3, 3)-sized — cost is nil.
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def decompose(trans: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split (..., 3/4, 4) SE(3) matrix into R (..., 3, 3) and t (..., 3, 1).

    Reference: lib/se3.py:14-26 (`decompose_trans`).
    """
    return trans[..., :3, :3], trans[..., :3, 3:4]


def integrate(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build (..., 4, 4) SE(3) matrix from R (..., 3, 3) and t (..., 3) or (..., 3, 1).

    Reference: lib/se3.py:29-52 (`integrate_trans`).
    """
    if t.shape[-1] != 1 or t.ndim == rot.ndim - 1:
        t = t.reshape(*rot.shape[:-2], 3, 1)
    top = jnp.concatenate([rot, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def inverse(g: jnp.ndarray) -> jnp.ndarray:
    """Inverse of an SE(3) transform, (..., 3/4, 4) -> (..., 3, 4).

    Reference: lib/se3.py:59-71 (`torch_inverse`).
    """
    rot = g[..., :3, :3]
    t = g[..., :3, 3:4]
    irot = jnp.swapaxes(rot, -1, -2)
    return jnp.concatenate([irot, _mm(-irot, t)], axis=-1)


def concatenate(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose two SE(3) transforms a∘b as (..., 3, 4) matrices.

    Reference: lib/se3.py:74-93 (`torch_concatenate`).
    """
    ra, ta = a[..., :3, :3], a[..., :3, 3:4]
    rb, tb = b[..., :3, :3], b[..., :3, 3:4]
    return jnp.concatenate([_mm(ra, rb), _mm(ra, tb) + ta], axis=-1)


def transform(g: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3) g (..., 3/4, 4) to points (..., N, 3) -> (..., N, 3).

    Reference: lib/se3.py:96-117 (`torch_transform`), datasets/datautils.py:425-439.
    """
    rot = g[..., :3, :3]
    t = g[..., :3, 3]
    return _mm(pts, jnp.swapaxes(rot, -1, -2)) + t[..., None, :]


def rotate(rot: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply SO(3) rotation (..., 3, 3) to points (..., N, 3)."""
    return _mm(pts, jnp.swapaxes(rot, -1, -2))


def quat2mat(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) [w,x,y,z] -> rotation matrix (..., 3, 3).

    Reference: lib/metric.py:155-164 (`quat2mat`; note that version is x,y,z,w —
    we standardise on w-first to match np_mat2quat's transforms3d output,
    lib/se3.py:224-229).
    """
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-12), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    m = jnp.stack([
        1.0 - (yy + zz), xy - wz, xz + wy,
        xy + wz, 1.0 - (xx + zz), yz - wx,
        xz - wy, yz + wx, 1.0 - (xx + yy),
    ], axis=-1)
    return m.reshape(*quat.shape[:-1], 3, 3)


def mat2quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) [w,x,y,z], w >= 0.

    Branch-free Shepperd-style extraction: computes all four candidate
    quaternions and selects the best-conditioned one with jnp.where, so it is
    jit/vmap-safe (the reference loops per item and eigendecomposes,
    lib/se3.py:120-148).
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot (1 + diag combo) is largest.
    # candidate 0: pivot on trace
    s0 = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # candidate 1: pivot on m00
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # candidate 2: pivot on m11
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # candidate 3: pivot on m22
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(qs, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical positive-w (reference lib/se3.py:141-144 flips sign likewise)
    return jnp.where(q[..., :1] < 0, -q, q)


def mat2pose7(g: jnp.ndarray) -> jnp.ndarray:
    """SE(3) (..., 3/4, 4) -> 7-vector [qw,qx,qy,qz, tx,ty,tz].

    Reference: lib/se3.py:224-229 (`np_mat2quat`).
    """
    return jnp.concatenate([mat2quat(g[..., :3, :3]), g[..., :3, 3]], axis=-1)


def pose72mat(pose: jnp.ndarray) -> jnp.ndarray:
    """7-vector [qw,qx,qy,qz, tx,ty,tz] -> (..., 3, 4).

    Reference: lib/se3.py:232-253 (`np_quat2mat`).
    """
    rot = quat2mat(pose[..., :4])
    return jnp.concatenate([rot, pose[..., 4:, None]], axis=-1)


def mat2euler_zyx_deg(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> intrinsic z-y-x Euler angles in degrees.

    Matches scipy Rotation.as_euler('zyx', degrees=True) away from gimbal lock
    (the reference converts via scipy per item at lib/metric.py:167-172;
    eval rotations are <=45 deg so the lock region is never hit).

    scipy's lowercase 'zyx' is the *extrinsic* convention:
    R = Rx(x) @ Ry(y) @ Rz(z), angles returned in order [z, y, x].
    Returns (..., 3) angles [z, y, x].
    """
    eps = 1e-7
    r02 = jnp.clip(rot[..., 0, 2], -1.0 + eps, 1.0 - eps)
    y = jnp.arcsin(r02)
    z = jnp.arctan2(-rot[..., 0, 1], rot[..., 0, 0])
    x = jnp.arctan2(-rot[..., 1, 2], rot[..., 2, 2])
    return jnp.stack([z, y, x], axis=-1) * (180.0 / jnp.pi)


def identity_pose(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Identity (..., 4, 4) transform."""
    eye = jnp.eye(4, dtype=dtype)
    return jnp.broadcast_to(eye, (*batch_shape, 4, 4))
