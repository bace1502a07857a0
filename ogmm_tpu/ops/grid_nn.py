"""Device-side uniform-grid fixed-radius 1-NN for large-M ICP.

ICP gates every correspondence at `nn_d < threshold^2`
(ops/icp.py:70,155 — Open3D's `max_correspondence_distance` semantics,
reference lib/o3dutils.py:175), so the nearest neighbour is only ever
CONSUMED when it lies within `threshold`. That makes a grid lookup with
cell size >= threshold exact-by-construction: any point within `threshold`
of a query sits in one of the query's 27 neighbouring cells, and a query
whose 27 cells hold nothing within `threshold` would have been gated to
weight 0 anyway (we report +inf, same effect).

Why it exists: at the indoor operating point (M ~ 35,000) each of the 30
ICP trips pays a full M-streamed dense 1-NN (~12 ms/trip on v5e,
profiles/r3/PROFILE.md) even though after the network initialisation the
clouds are already within a few cm — almost all of the (N, M) distance work
is provably irrelevant. The grid is built ONCE per ICP call from the static
target cloud and reused by every trip; per trip the moved source only pays
27 binary searches + a (N, 27*cap) candidate gather — O(N * occupancy)
instead of O(N * M).

This is the device-side analogue of the host-side C++ grid hash that
replaces Open3D's KD-tree in the data pipeline (native/host_ops.cc); both
follow the same clip-is-monotone argument for boundary cells.

Design notes (all fixed-shape, jit-clean):
  * cell ids encode clipped integer coords as (cx<<20)|(cy<<10)|cz — a
    monotone (lexicographic) int32 key, valid for clouds up to 1024 cells
    per axis (extent / threshold <= 1024; indoor scenes are ~5 m at
    threshold 0.07). Clipping is monotone, so two points within one cell
    pitch stay adjacent after clipping — exactness survives the clip.
  * the target is sorted by cell id once; each cell's members are a
    contiguous run found by two vectorised binary searches. Runs are read
    through a static window of `cap` slots; cells holding more than `cap`
    points contribute their first `cap` in sorted order. `build_grid`
    returns the true max occupancy so callers can check cap (the ICP
    consumer is robust to rare drops — any same-cell candidate is within
    ~1.7x threshold — but the diagnostic keeps it honest).
  * exact ties: the dense path's argmin picks the lowest ORIGINAL index;
    here candidates carry their original ids and the argmin runs over the
    candidate window, so tie choice can differ (both points are genuinely
    equidistant; ICP consumes only the gathered coordinates).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_BITS = 10                      # cells per axis <= 1024
_CMAX = (1 << _BITS) - 1


class Grid(NamedTuple):
    """Static per-call acceleration structure over the target cloud."""
    pts_sorted: jnp.ndarray     # (B, M, 3) f32, sorted by cell id
    ids_sorted: jnp.ndarray     # (B, M) int32 original indices
    cid_sorted: jnp.ndarray     # (B, M) int32 cell ids, ascending
    origin: jnp.ndarray         # (B, 3) f32 grid origin (target min corner)
    max_occupancy: jnp.ndarray  # (B,) int32 densest cell (cap diagnostic)


def _cells(points: jnp.ndarray, origin: jnp.ndarray, cell: float
           ) -> jnp.ndarray:
    """(B, P, 3) -> (B, P, 3) int32 clipped cell coordinates."""
    c = jnp.floor((points - origin[:, None, :]) / cell).astype(jnp.int32)
    return jnp.clip(c, 0, _CMAX)


def _encode(c: jnp.ndarray) -> jnp.ndarray:
    return (c[..., 0] << (2 * _BITS)) | (c[..., 1] << _BITS) | c[..., 2]


@partial(jax.jit, static_argnames=("cell",))
def build_grid(tgt: jnp.ndarray, cell: float) -> Grid:
    """Sort the target cloud into `cell`-sized buckets. tgt: (B, M, 3)."""
    tgt = tgt.astype(jnp.float32)
    origin = tgt.min(axis=1)                                  # (B, 3)
    cid = _encode(_cells(tgt, origin, cell))                  # (B, M)
    order = jnp.argsort(cid, axis=-1).astype(jnp.int32)
    cid_sorted = jnp.take_along_axis(cid, order, axis=-1)
    pts_sorted = jnp.take_along_axis(tgt, order[..., None], axis=1)
    # densest cell: runs of equal cid in the sorted array
    def occ(row):
        starts = jnp.searchsorted(row, row, side='left')
        ends = jnp.searchsorted(row, row, side='right')
        return jnp.max(ends - starts).astype(jnp.int32)
    return Grid(pts_sorted, order, cid_sorted, origin, jax.vmap(occ)(cid_sorted))


@partial(jax.jit, static_argnames=("cell", "cap"))
def nn1_radius(query: jnp.ndarray, grid: Grid, cell: float,
               cap: int = 32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest target within `cell` of each query, via the 27-cell stencil.

    query: (B, N, 3). Returns (d2 (B, N) f32, idx (B, N) int32 ORIGINAL
    target indices). Queries with no target inside `cell` get d2 = +inf and
    idx = 0 — the ICP inlier gate (d2 < threshold^2) zeroes them exactly as
    the dense path would.
    """
    B, N, _ = query.shape
    qc = _cells(query.astype(jnp.float32), grid.origin, cell)  # (B, N, 3)

    # 27 neighbour cell keys per query (out-of-range neighbours clip onto
    # the boundary cell — a superset of the exact stencil, see module doc)
    off = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3),
                                 indexing='ij'), -1).reshape(27, 3)
    nc = jnp.clip(qc[:, :, None, :] + off[None, None], 0, _CMAX)
    keys = _encode(nc)                                         # (B, N, 27)

    def runs(cid_row, key_row):
        s = jnp.searchsorted(cid_row, key_row, side='left')
        e = jnp.searchsorted(cid_row, key_row, side='right')
        return s, e
    start, end = jax.vmap(runs)(grid.cid_sorted,
                                keys.reshape(B, -1))           # (B, N*27)
    start = start.reshape(B, N, 27).astype(jnp.int32)
    end = end.reshape(B, N, 27).astype(jnp.int32)

    # static candidate window per cell
    slot = jnp.arange(cap, dtype=jnp.int32)                    # (cap,)
    cand = start[..., None] + slot                             # (B, N, 27, cap)
    valid = cand < end[..., None]
    M = grid.pts_sorted.shape[1]
    cand = jnp.minimum(cand, M - 1).reshape(B, N * 27 * cap)
    cpts = jnp.take_along_axis(grid.pts_sorted, cand[..., None],
                               axis=1).reshape(B, N, 27 * cap, 3)
    cids = jnp.take_along_axis(grid.ids_sorted, cand,
                               axis=1).reshape(B, N, 27 * cap)

    d2 = jnp.sum((query[:, :, None, :].astype(jnp.float32) - cpts) ** 2,
                 axis=-1)                                      # (B, N, 27*cap)
    d2 = jnp.maximum(d2, 1e-12)          # match square_distance's clamp
    d2 = jnp.where(valid.reshape(B, N, 27 * cap), d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)
    return (jnp.take_along_axis(d2, best[..., None], axis=-1)[..., 0],
            jnp.take_along_axis(cids, best[..., None], axis=-1)[..., 0])
