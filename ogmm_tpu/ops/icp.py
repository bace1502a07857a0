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
from ogmm_tpu.ops import dispatch
from ogmm_tpu.ops.common import gather_neighbors, knn, nn1


def _maybe_grid(tgt: jnp.ndarray, threshold: float,
                use_grid: bool | None, use_pallas: bool | None,
                grid_cap: int):
    """Resolve the grid-1-NN route; returns a Grid or None.

    The grid route is OPT-IN ONLY (use_grid=True): the r3 on-chip A/B at
    N=M=35,000 measured the streamed-1-NN refine at 394.8 ms/30 trips vs
    8.5-10.3 s for the grid at cap 8/16 (scripts/bench_grid_icp.py), and
    the cap-32 build FAULTED the TPU worker — the gather-heavy candidate
    probing is VPU-bound on TPU while the "brute-force" distance blocks the
    grid avoids are exactly what the MXU does at speed-of-light. The grid
    remains available for genuinely sparse regimes (M >> 100k, tiny
    threshold) where the O(N*M) sweep cannot be paid, with an explicit
    use_grid=True and a measured A/B. An explicit use_pallas always forces
    the dense/streamed kernel it names (the ops/common.py:nn1 contract).

    When the grid is built, cap saturation can be surfaced rather than
    silently degrading: a cell holding more than `grid_cap` points keeps
    only its first `grid_cap` members (grid_nn.py candidate window), so the
    true within-threshold neighbour of some query can be dropped and the
    inlier gate sees a farther point (or none). Rare on real scans at
    cell=threshold, but worth checking in debugging runs — enable the
    trace-time warning with `dispatch.set_debug_callbacks(True)` (off by
    default: the jax.debug.print it traces is a host callback, a hidden
    sync on TPU and unsupported over callback-less PJRT transports).
    """
    if use_grid is None:
        use_grid = False                  # opt-in only (r3 A/B: see above)
    if use_grid and use_pallas is not None:
        raise ValueError("use_grid=True conflicts with an explicit "
                         "use_pallas NN path — pass one or the other")
    if not use_grid:
        return None
    from ogmm_tpu.ops.grid_nn import build_grid
    grid = build_grid(tgt, cell=threshold)         # once; trips reuse it
    if dispatch.debug_callbacks():
        # trace-time gated: a debug.print is a host callback — a hidden
        # sync on TPU and UNIMPLEMENTED over callback-less PJRT transports
        sat = jnp.max(grid.max_occupancy)
        jax.lax.cond(
            sat > grid_cap,
            lambda s: jax.debug.print(
                "ogmm_tpu ICP grid: densest cell holds {s} points > "
                f"grid_cap={grid_cap}; within-threshold neighbours may be "
                "dropped — raise grid_cap or pass use_grid=False", s=s),
            lambda s: None, sat)
    return grid


@partial(jax.jit, static_argnames=("threshold", "max_iter", "method",
                                   "use_pallas", "use_grid", "grid_cap",
                                   "axis_name"))
def icp_point_to_point(src: jnp.ndarray, tgt: jnp.ndarray,
                       init_pose: jnp.ndarray,
                       threshold: float,
                       max_iter: int = 30,
                       method: str = "horn_pi",
                       use_pallas: bool | None = None,
                       use_grid: bool | None = None,
                       grid_cap: int = 32,
                       axis_name: str | None = None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Refine an initial rigid transform by fixed-iteration point-to-point ICP.

    Args:
      src: (B, N, 3) source points.
      tgt: (B, M, 3) target points.
      init_pose: (B, 4, 4) or (B, 3, 4) initial transform (maps src -> tgt).
      threshold: correspondence distance gate (Open3D's
        `max_correspondence_distance`; reference uses 2*voxel_size,
        lib/o3dutils.py:175). Static: it sizes the grid cells below.
      max_iter: fixed trip count (Open3D default ICP max_iteration=30).
      method: Procrustes backend per iteration; 'horn_pi' (shifted power
        iteration) is ~20% faster than the eigh solve over 30 trips at
        equivalent refinement accuracy (RRE within 0.01 deg on chip).
      use_grid: route the per-trip 1-NN through a uniform grid built once
        from the static target (ops/grid_nn.py) — exact under the inlier
        gate (every point within `threshold` is a candidate; everything
        farther is gated to weight 0 on both paths). OPT-IN ONLY: the
        streamed 1-NN beat it ~20x on chip at N=M=35k (see _maybe_grid);
        reach for it only in sparse M>>100k regimes, with an A/B.
      grid_cap: candidate-window size per stencil cell (see grid_nn.py).
      axis_name: src rows are point-sharded over that mesh axis
        (parallel/sp.py; tgt stays replicated) — each trip's 1-NN runs on
        the local rows and the Procrustes moments / inlier counts psum.

    Returns: (rot (B,3,3), trans (B,3)) refined transform.
    """
    thresh_sq = threshold * threshold
    rot0 = init_pose[..., :3, :3]
    t0 = init_pose[..., :3, 3]
    grid = _maybe_grid(tgt, threshold, use_grid, use_pallas, grid_cap)
    use_grid = grid is not None
    if use_grid:
        from ogmm_tpu.ops.grid_nn import nn1_radius

    # Spatial large-M auto route: Morton-sort both clouds ONCE and run the
    # whole loop in sorted coordinates (ICP is permutation-equivariant:
    # correspondences are gathered per trip and only (R, t) leaves, so no
    # index map-back exists to pay for). Per trip, query-tile AABBs of the
    # moved source (a rigid motion preserves Morton locality) against the
    # static target tiles bound each (tile, tile) block; the streamed 1-NN
    # culls blocks past min(worst running best, threshold^2) — the inlier
    # gate discards anything beyond threshold anyway, so far blocks skip
    # immediately and per-trip work collapses to the near-diagonal band.
    # Engages only under auto dispatch (use_pallas None keeps the
    # forced-path contract; explicit kernels measure what they name).
    spatial = (not use_grid and use_pallas is None and tgt.shape[1] > 4096
               and dispatch.use_pallas())
    if spatial:
        from ogmm_tpu.ops.pallas_stream import (_morton3, _pair_tile_bounds,
                                                nn1_stream)
        s_ord = jnp.argsort(_morton3(src), axis=-1)
        src = jnp.take_along_axis(src, s_ord[..., None], axis=1)
        t_ord = jnp.argsort(_morton3(tgt), axis=-1)
        tgt = jnp.take_along_axis(tgt, t_ord[..., None], axis=1)
        _SP_TN, _SP_TM = 256, 2048

    # NB: a whole-loop fused kernel exists (ops/pallas_icp.py, interpreter
    # parity in tests/test_icp.py) but measured 13.0 ms vs 5.6 ms for this
    # scan at the bench shape — the Horn power iteration's 900 tiny 4x4
    # matvecs per cloud are Mosaic-hostile (each burns a full padded vreg
    # op). Kept opt-in for large-M futures; this scan is the default.

    def body(carry, _):
        rot, t = carry
        moved = jnp.matmul(src, jnp.swapaxes(rot, -1, -2),
                           precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
        if use_grid:
            nn_d, nn_i = nn1_radius(moved, grid, cell=threshold,
                                    cap=grid_cap)
        elif spatial:
            lb = _pair_tile_bounds(moved, tgt, _SP_TN, _SP_TM)
            nn_d, nn_i = nn1_stream(moved, tgt, tile_n=_SP_TN,
                                    tile_m=_SP_TM, cull_lb=lb,
                                    max_dist_sq=thresh_sq)
        else:
            # prefer_dense: over 30 scan trips XLA's fused (B, N, M) path
            # wins at M <= 1024 (5.7 vs 9.5 ms at the bench shape — per-trip
            # kernel glue costs more than the HBM matrix); larger M routes
            # to the fused / M-streamed 1-NN kernels (ops/common.py:nn1)
            nn_d, nn_i = nn1(moved, tgt, prefer_dense=True,
                             use_pallas=use_pallas)
        corr = jnp.take_along_axis(tgt, nn_i[..., None], axis=1)  # (B, N, 3)
        w = (nn_d < thresh_sq).astype(src.dtype)         # inlier gate
        # guard: if no inliers, keep previous transform via weight-all fallback
        n_in = w.sum(axis=-1)                            # (B,)
        if axis_name is not None:
            n_in = jax.lax.psum(n_in, axis_name)
        any_in = n_in > 0
        w = jnp.where(any_in[:, None], w, jnp.ones_like(w))
        rot_new, t_new = rigid_transform(src, corr, w, method=method,
                                         axis_name=axis_name)
        t_new = t_new[..., 0]
        rot = jnp.where(any_in[:, None, None], rot_new, rot)
        t = jnp.where(any_in[:, None], t_new, t)
        return (rot, t), None

    (rot, t), _ = jax.lax.scan(body, (rot0, t0), None, length=max_iter)
    return rot, t


def _rodrigues(omega: jnp.ndarray) -> jnp.ndarray:
    """Batched exp map so(3) -> SO(3), small-angle safe. omega: (B, 3)."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)      # (B, 1)
    safe = jnp.maximum(theta, 1e-12)
    k = omega / safe
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack([
        jnp.stack([zero, -kz, ky], -1),
        jnp.stack([kz, zero, -kx], -1),
        jnp.stack([-ky, kx, zero], -1),
    ], -2)                                                      # (B, 3, 3)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    R = eye + s * K + (1.0 - c) * jnp.matmul(
        K, K, precision=jax.lax.Precision.HIGHEST)
    # below the small-angle floor the first-order map is exact to fp32
    return jnp.where(theta[..., None] > 1e-8, R, eye + K * theta[..., None])


@partial(jax.jit, static_argnames=("k",))
def estimate_normals_knn(points: jnp.ndarray, k: int = 16) -> jnp.ndarray:
    """Per-point unit normals: smallest-eigenvector PCA of the k-NN
    neighbourhood, on device (the reference runs Open3D's C++ estimator on
    the host, lib/o3dutils.py:178-181). Sign is arbitrary — point-to-plane
    residuals are sign-invariant under the normal equations."""
    idx = knn(points, points, k)                                # (B, N, k)
    nbrs = gather_neighbors(points, idx)                        # (B, N, k, 3)
    centered = nbrs - nbrs.mean(axis=2, keepdims=True)          # (B, N, k, 3)
    cov = jnp.einsum('bnkc,bnkd->bncd', centered, centered,
                     precision=jax.lax.Precision.HIGHEST)
    _, vecs = jnp.linalg.eigh(cov)                              # ascending
    return vecs[..., 0]                                         # (B, N, 3)


@partial(jax.jit, static_argnames=("threshold", "max_iter", "normal_k",
                                   "use_pallas", "use_grid", "grid_cap",
                                   "axis_name"))
def icp_point_to_plane(src: jnp.ndarray, tgt: jnp.ndarray,
                       init_pose: jnp.ndarray,
                       threshold: float,
                       max_iter: int = 30,
                       tgt_normals: jnp.ndarray | None = None,
                       normal_k: int = 16,
                       use_pallas: bool | None = None,
                       use_grid: bool | None = None,
                       grid_cap: int = 32,
                       axis_name: str | None = None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Point-to-plane ICP (reference lib/o3dutils.py:176-185, the pl=True
    branch of refine_registration) — batched Gauss-Newton, fully on device.

    Each iteration linearizes the plane residual n·(R s + t − q) in a small
    twist [ω; δt], accumulates the 6×6 normal equations over gated inlier
    correspondences (one einsum — MXU friendly), solves, and applies the
    exact Rodrigues update. Normals come from `tgt_normals` or an on-device
    k-NN PCA estimate.

    Returns: (rot (B,3,3), trans (B,3)).
    """
    thresh_sq = threshold * threshold
    rot0 = init_pose[..., :3, :3]
    t0 = init_pose[..., :3, 3]
    if tgt_normals is None:
        tgt_normals = estimate_normals_knn(tgt, k=normal_k)
    grid = _maybe_grid(tgt, threshold, use_grid, use_pallas, grid_cap)
    use_grid = grid is not None
    if use_grid:
        from ogmm_tpu.ops.grid_nn import nn1_radius

    # spatial large-M auto route — same design as icp_point_to_point
    # (normals ride the target permutation)
    spatial = (not use_grid and use_pallas is None and tgt.shape[1] > 4096
               and dispatch.use_pallas())
    if spatial:
        from ogmm_tpu.ops.pallas_stream import (_morton3, _pair_tile_bounds,
                                                nn1_stream)
        s_ord = jnp.argsort(_morton3(src), axis=-1)
        src = jnp.take_along_axis(src, s_ord[..., None], axis=1)
        t_ord = jnp.argsort(_morton3(tgt), axis=-1)
        tgt = jnp.take_along_axis(tgt, t_ord[..., None], axis=1)
        tgt_normals = jnp.take_along_axis(tgt_normals, t_ord[..., None],
                                          axis=1)
        _SP_TN, _SP_TM = 256, 2048

    def body(carry, _):
        rot, t = carry
        moved = jnp.matmul(src, jnp.swapaxes(rot, -1, -2),
                           precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
        if use_grid:
            nn_d, nn_i = nn1_radius(moved, grid, cell=threshold,
                                    cap=grid_cap)
        elif spatial:
            lb = _pair_tile_bounds(moved, tgt, _SP_TN, _SP_TM)
            nn_d, nn_i = nn1_stream(moved, tgt, tile_n=_SP_TN,
                                    tile_m=_SP_TM, cull_lb=lb,
                                    max_dist_sq=thresh_sq)
        else:
            # same crossover as icp_point_to_point (ops/common.py:nn1)
            nn_d, nn_i = nn1(moved, tgt, prefer_dense=True,
                             use_pallas=use_pallas)
        q = jnp.take_along_axis(tgt, nn_i[..., None], axis=1)       # (B,N,3)
        n = jnp.take_along_axis(tgt_normals, nn_i[..., None], axis=1)
        w = (nn_d < thresh_sq).astype(src.dtype)
        n_in = w.sum(axis=-1)
        if axis_name is not None:
            n_in = jax.lax.psum(n_in, axis_name)
        any_in = n_in > 0
        w = jnp.where(any_in[:, None], w, jnp.ones_like(w))

        # rows A = [moved × n, n] (B, N, 6); residual b = -n·(moved - q)
        a = jnp.concatenate([jnp.cross(moved, n), n], axis=-1)
        b = -jnp.einsum('bnc,bnc->bn', n, moved - q,
                        precision=jax.lax.Precision.HIGHEST)
        aw = a * w[..., None]
        H = jnp.einsum('bni,bnj->bij', aw, a,
                       precision=jax.lax.Precision.HIGHEST)         # (B,6,6)
        g = jnp.einsum('bni,bn->bi', aw, b,
                       precision=jax.lax.Precision.HIGHEST)         # (B,6)
        if axis_name is not None:
            H, g = jax.lax.psum((H, g), axis_name)
        H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
        x = jnp.linalg.solve(H, g[..., None])[..., 0]               # (B,6)
        dR = _rodrigues(x[:, :3])
        rot_new = jnp.matmul(dR, rot, precision=jax.lax.Precision.HIGHEST)
        t_new = jnp.einsum('bij,bj->bi', dR, t,
                           precision=jax.lax.Precision.HIGHEST) + x[:, 3:]
        rot = jnp.where(any_in[:, None, None], rot_new, rot)
        t = jnp.where(any_in[:, None], t_new, t)
        return (rot, t), None

    (rot, t), _ = jax.lax.scan(body, (rot0, t0), None, length=max_iter)
    return rot, t


def refine_registration(src, tgt, rot, trans, voxel_size: float,
                        max_iter: int = 30, pl: bool = False):
    """Drop-in equivalent of reference `reg_solver` (lib/o3dutils.py:192-214),
    incl. the point-to-plane option (`pl=True`, lib/o3dutils.py:176-185).

    src/tgt: (B, N, 3); rot (B,3,3); trans (B,3) or (B,3,1).
    Returns refined (rot (B,3,3), trans (B,3)).
    """
    init = se3.integrate(rot, trans.reshape(rot.shape[0], 3, 1))
    if pl:
        return icp_point_to_plane(src, tgt, init, threshold=2.0 * voxel_size,
                                  max_iter=max_iter)
    return icp_point_to_point(src, tgt, init, threshold=2.0 * voxel_size,
                              max_iter=max_iter)
