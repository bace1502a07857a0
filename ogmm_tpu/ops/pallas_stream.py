"""Target-axis-streamed kernels for the indoor large-N regime (N ~ 35,000).

The fixed-shape kernels in ops/pallas_knn.py hold a full (tile_n, M) distance
block with the whole (M, 3) target resident in VMEM — fine at the ModelNet
geometry (M = 717), impossible at the indoor operating point
(reference configs/cfgs.py:77 n_points=50000, datasets/realdata.py:114-119
crop/FPS to ~35,000 points into the SAME network at eval batch 1): a
(128, 35000) f32 block alone is ~17.9 MB > 16 MB VMEM, and the jnp fallback
would materialise a 4.9 GB (N, M) matrix in HBM.

This module streams the TARGET axis instead: grid (B, n_tiles, m_tiles) with
the m axis innermost-sequential, carrying running reductions in VMEM scratch
that persists across m-tiles of the same query tile —

  * nn1_stream:     running (min, argmin) carry            -> 1-NN
  * knn_stream:     running sorted top-k carry, merged with
                    each block's top-k by masked argmin-extraction
  * wproject_stream: flash-attention-style online softmax
                    (running max / running sum / rescaled accumulator) for
                    the overlap head's softmax-weighted score projection
                    (models/gmmreg.py:74-89) — the (N, M) similarity matrix
                    never exists anywhere

plus `*_chunked` jnp fallbacks (lax.map over query chunks) that bound HBM at
(B, chunk, M) for non-TPU backends and serve as the numerical reference for
the interpreter-mode parity tests (tests/test_pallas_stream.py).

Mosaic rules observed (CLAUDE.md): iota is integer dtype; no dynamic
lane-dim stores (masked selects); padded tail tiles masked with where-selects
on every operand feeding a reduction; float compares in f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _dist_block(q, t, valid_cols):
    """Masked squared-distance block (TN, TM), fp32 HIGHEST, invalid -> +inf.

    Matches ops/common.py:square_distance (1e-12 clamp) so streamed results
    are bit-comparable with the dense path.
    """
    inner = jax.lax.dot_general(q, t, (((1,), (1,)), ((), ())),
                                precision=_HI,
                                preferred_element_type=jnp.float32)
    d2 = (jnp.sum(q * q, axis=-1, keepdims=True)
          + jnp.sum(t * t, axis=-1)[None, :] - 2.0 * inner)
    d2 = jnp.maximum(d2, 1e-12)
    return jnp.where(valid_cols, d2, jnp.inf)


# --------------------------------------------------------------------------
# 1-NN: running (min, argmin)
# --------------------------------------------------------------------------

def _nn1_stream_kernel(src_ref, tgt_ref, *rest,
                       tile_m: int, n_valid_m: int, tile_n: int = 0,
                       n_valid_n: int = 0, n_m: int = 0, cull: bool = False,
                       max_dist_sq: float | None = None):
    if cull:
        lb_ref, d_ref, i_ref, bd, bi = rest
    else:
        d_ref, i_ref, bd, bi = rest
    mi = pl.program_id(2)

    @pl.when(mi == 0)
    def _init():
        bd[...] = jnp.full(bd.shape, jnp.inf, jnp.float32)
        bi[...] = jnp.zeros(bi.shape, jnp.int32)

    q = src_ref[0]                                        # (TN, C)
    t = tgt_ref[0]                                        # (TM, C)
    TN, TM = q.shape[0], t.shape[0]

    if cull:
        # AABB block cull, 1-NN flavour (see _knn_stream_kernel): the
        # worst-over-valid-rows running best distance bounds what a block
        # must beat; when the caller only consumes neighbours within
        # max_dist_sq (the ICP inlier gate), the bound is clamped there —
        # blocks farther than the gate cull IMMEDIATELY, carry state
        # regardless (rows whose true 1-NN lies beyond the gate may then
        # report inf / an arbitrary index, which the gate zero-weights).
        rowg = (jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0)
                + pl.program_id(1) * tile_n)
        worst = jnp.max(jnp.where(rowg < n_valid_n, bd[...], -jnp.inf))
        if max_dist_sq is not None:
            worst = jnp.minimum(worst, jnp.float32(max_dist_sq))
        lbrow = lb_ref[0]                                  # (1, T_n * n_m)
        lbcol = jax.lax.broadcasted_iota(jnp.int32, lbrow.shape, 1)
        lb = jnp.sum(jnp.where(
            lbcol == pl.program_id(1) * n_m + mi, lbrow, 0.0))
        visit = lb <= worst * (1.0 + 1e-6) + 1e-6
    else:
        visit = True

    @pl.when(visit)
    def _visit():
        col = jax.lax.broadcasted_iota(jnp.int32, (TN, TM), 1) + mi * tile_m
        d2 = _dist_block(q, t, col < n_valid_m)

        bmin = jnp.min(d2, axis=1, keepdims=True)         # (TN, 1)
        barg = (jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None]
                + mi * tile_m)
        # strict < keeps the earlier tile's index on exact ties — identical
        # to a global argmin (first minimum wins)
        better = bmin < bd[...]
        bd[...] = jnp.where(better, bmin, bd[...])
        bi[...] = jnp.where(better, barg, bi[...])

    @pl.when(mi == pl.num_programs(2) - 1)
    def _flush():
        d_ref[0] = bd[...]
        i_ref[0] = bi[...]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret",
                                             "max_dist_sq"))
def nn1_stream(src: jnp.ndarray, tgt: jnp.ndarray,
               tile_n: int = 256, tile_m: int = 2048,
               interpret: bool = False,
               cull_lb: jnp.ndarray | None = None,
               max_dist_sq: float | None = None):
    """(B,N,C) x (B,M,C) -> (min_sqdist (B,N), idx (B,N)), M streamed.

    Drop-in for ops/pallas_knn.py:nn1_pallas at any M — VMEM holds only a
    (tile_n, tile_m) block plus a (tile_n, 1) carry.

    `cull_lb` ((B, T_n, T_m) f32, optional): AABB lower bounds per tile
    pair; blocks bounded above the worst running best distance skip
    entirely. `max_dist_sq` (with cull_lb) additionally clamps that bound
    to the caller's consumption gate: ONLY sound when every consumer
    discards neighbours at squared distance >= max_dist_sq (the ICP inlier
    gate) — rows whose true 1-NN lies beyond it may report an arbitrary
    index and d2=inf.
    """
    B, N, C = src.shape
    M = tgt.shape[1]
    tile_n = min(tile_n, N)
    tile_m = min(tile_m, M)
    n_m = pl.cdiv(M, tile_m)
    cull = cull_lb is not None
    grid = (B, pl.cdiv(N, tile_n), n_m)
    kern = functools.partial(_nn1_stream_kernel, tile_m=tile_m, n_valid_m=M,
                             tile_n=tile_n, n_valid_n=N, n_m=n_m, cull=cull,
                             max_dist_sq=max_dist_sq if cull else None)
    in_specs = [pl.BlockSpec((1, tile_n, C), lambda b, i, m: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_m, C), lambda b, i, m: (b, m, 0),
                             memory_space=pltpu.VMEM)]
    args = (src.astype(jnp.float32), tgt.astype(jnp.float32))
    if cull:
        assert cull_lb.shape == (B, grid[1], n_m), (cull_lb.shape, grid)
        flat = cull_lb.astype(jnp.float32).reshape(B, 1, grid[1] * n_m)
        in_specs.append(pl.BlockSpec((1, 1, grid[1] * n_m),
                                     lambda b, i, m: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args += (flat,)
    d, i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, tile_n, 1), lambda b, i, m: (b, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile_n, 1), lambda b, i, m: (b, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, 1), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((tile_n, 1), jnp.float32),
                        pltpu.VMEM((tile_n, 1), jnp.int32)],
        interpret=interpret,
    )(*args)
    return d[..., 0], i[..., 0]


def _nn1t_kernel(src_ref, tgt_ref, xsq_ref, d_ref, i_ref, bd, bi,
                 *, tile_m: int, n_valid_m: int):
    """Transposed-layout 1-NN: xyz blocks are (3, tile) — channels on the
    SUBLANE axis, points on lanes — so the DMA'd tiles are 8 x tile instead
    of tile x 128 (the channel-last layout pads 3 -> 128 lanes: ~16x the
    traffic). argmin uses r = |t|^2 - 2<q,t> (row-constant |q|^2 dropped);
    the true min distance is reconstructed at flush from the prefetched
    x_sq row block."""
    mi = pl.program_id(2)

    @pl.when(mi == 0)
    def _init():
        bd[...] = jnp.full(bd.shape, jnp.inf, jnp.float32)
        bi[...] = jnp.zeros(bi.shape, jnp.int32)

    q = src_ref[0]                                        # (3, TN)
    t = tgt_ref[0]                                        # (3, TM)
    TN, TM = q.shape[1], t.shape[1]
    inner = jax.lax.dot_general(q, t, (((0,), (0,)), ((), ())),
                                precision=_HI,
                                preferred_element_type=jnp.float32)  # (TN, TM)
    t_sq = jnp.sum(t * t, axis=0, keepdims=True)          # (1, TM)
    r = t_sq - 2.0 * inner
    col = jax.lax.broadcasted_iota(jnp.int32, (TN, TM), 1) + mi * tile_m
    r = jnp.where(col < n_valid_m, r, jnp.inf)

    bmin = jnp.min(r, axis=1, keepdims=True)
    barg = jnp.argmin(r, axis=1).astype(jnp.int32)[:, None] + mi * tile_m
    better = bmin < bd[...]
    bd[...] = jnp.where(better, bmin, bd[...])
    bi[...] = jnp.where(better, barg, bi[...])

    @pl.when(mi == pl.num_programs(2) - 1)
    def _flush():
        d_ref[0] = jnp.maximum(bd[...] + xsq_ref[0], 1e-12)
        i_ref[0] = bi[...]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def nn1_stream_t(src: jnp.ndarray, tgt: jnp.ndarray,
                 tile_n: int = 512, tile_m: int = 4096,
                 interpret: bool = False):
    """Drop-in for nn1_stream with the transposed tile layout (see
    _nn1t_kernel): (B,N,C) x (B,M,C) -> (min_sqdist (B,N), idx (B,N)).
    Identical semantics (1e-12 clamp, first-min ties)."""
    B, N, C = src.shape
    M = tgt.shape[1]
    tile_n = min(tile_n, N)
    tile_m = min(tile_m, M)
    s3 = jnp.swapaxes(src.astype(jnp.float32), 1, 2)      # (B, 3, N)
    t3 = jnp.swapaxes(tgt.astype(jnp.float32), 1, 2)
    x_sq = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    grid = (B, pl.cdiv(N, tile_n), pl.cdiv(M, tile_m))
    kern = functools.partial(_nn1t_kernel, tile_m=tile_m, n_valid_m=M)
    d, i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, C, tile_n), lambda b, i, m: (b, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C, tile_m), lambda b, i, m: (b, 0, m),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_n, 1), lambda b, i, m: (b, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, tile_n, 1), lambda b, i, m: (b, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile_n, 1), lambda b, i, m: (b, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, 1), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((tile_n, 1), jnp.float32),
                        pltpu.VMEM((tile_n, 1), jnp.int32)],
        interpret=interpret,
    )(s3, t3, x_sq)
    return d[..., 0], i[..., 0]


# --------------------------------------------------------------------------
# kNN: running sorted top-k carry
# --------------------------------------------------------------------------

def _diag_first(i, m, *, n_m: int, tile_n: int, tile_m: int,
                stretch: int = 1):
    """Bijective m-tile visiting order centered on the diagonal: for query
    tile i, visit target tiles start, start+1, start-1, start+2, ... (mod
    n_m) where start contains column i*tile_n*stretch. Pure integer
    arithmetic — usable both in BlockSpec index_maps and on program_id
    scalars.

    `stretch`: rank scale between query rows and target rows. 1 for the
    self graph (query row r IS target row r). When the queries are a
    sorted random SUBSET of the sorted target (the point-sharded self
    graph: a shard owns N/n_dev of the cloud's rows), local sorted rank r
    sits at global sorted rank ~ r * n_dev on average, so stretch = n_dev
    re-centres the diagonal. Purely a visiting-order heuristic — results
    are identical for any value (see knn_stream's diag_order contract)."""
    start = (i * tile_n * stretch) // tile_m
    off = ((m + 1) // 2) * (1 - 2 * (m % 2))
    return (start + off) % n_m


def _knn_stream_kernel(src_ref, tgt_ref, *rest,
                       k: int, tile_n: int, tile_m: int, n_valid_m: int,
                       n_m: int, unroll: bool, diag_order: bool,
                       n_valid_n: int = 0, cull: bool = False,
                       dyn: bool = False, stretch: int = 1):
    if cull:
        lb_ref, out_ref, *scratch = rest
    else:
        out_ref, *scratch = rest
    if dyn:
        cd, ci, ds = scratch
    else:
        cd, ci = scratch
    mi = pl.program_id(2)
    phys = (_diag_first(pl.program_id(1), mi, n_m=n_m, tile_n=tile_n,
                        tile_m=tile_m, stretch=stretch)
            if diag_order else mi)

    @pl.when(mi == 0)
    def _init():
        cd[...] = jnp.full(cd.shape, jnp.inf, jnp.float32)
        ci[...] = jnp.zeros(ci.shape, jnp.int32)

    q = src_ref[0]                                        # (TN, C)
    t = tgt_ref[0]                                        # (TM, C)
    TN, TM = q.shape[0], t.shape[0]
    # global row ids of this query tile; computed at kernel top level —
    # pl.program_id may not be bound inside pl.when/loop sub-jaxprs
    rowg = (jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0)
            + pl.program_id(1) * tile_n)                  # (TN, 1)

    if cull:
        # block cull: lb_ref[i, phys] is an AABB lower bound on every
        # squared distance this block can produce (computed XLA-side from
        # the Morton-sorted tiles, see knn_self_spatial). If it exceeds the
        # worst current k-th bound over the tile's VALID rows (pad rows of
        # the tail tile carry garbage queries and must not poison the max),
        # the whole block — distance matmul included — provably cannot
        # change any carry. The small relative+absolute margin keeps the
        # prune sound under f32 rounding of the computed d2 (the AABB bound
        # is exact-math; computed distances can round slightly below it).
        kth = cd[...][:, k - 1:k]                          # (TN, 1)
        worst = jnp.max(jnp.where(rowg < n_valid_n, kth, -jnp.inf))
        # lb_ref holds the whole flattened (T_n * n_m) bound table (a few
        # KB, VMEM-resident once — a (1, 1, n_m) per-tile block would break
        # Mosaic's (8, 128)-divisible-or-equal block rule on the T_n axis);
        # select entry [i, phys] with one masked lane reduce.
        lbrow = lb_ref[0]                                  # (1, T_n * n_m)
        lbcol = jax.lax.broadcasted_iota(jnp.int32, lbrow.shape, 1)
        lb = jnp.sum(jnp.where(
            lbcol == pl.program_id(1) * n_m + phys, lbrow, 0.0))
        visit = lb <= worst * (1.0 + 1e-6) + 1e-6
    else:
        visit = True

    col = jax.lax.broadcasted_iota(jnp.int32, (TN, TM), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (TN, k), 1)

    def _run_select(improves, d2):
      @pl.when(improves)
      def _select():
        if dyn:
            # Dynamic-trip selection: only candidates at-or-below the row's
            # current k-th bound can enter the merged top-k (<= because an
            # exact tie can still win the lexicographic merge on a lower
            # global index), so the extract loop needs only as many trips
            # as the busiest VALID row has such candidates — on coherent
            # clouds that is 0-3 for most visited blocks, vs k static
            # passes. The masked block lives in VMEM scratch, NOT loop
            # state (a fori_loop that carries a (TN, TM) block makes
            # Mosaic rematerialise it every pass — CLAUDE.md r3).
            kth = cd[...][:, k - 1:k]                     # (TN, 1)
            dm = jnp.where(d2 <= kth, d2, jnp.inf)
            live = (dm < jnp.inf) & (rowg < n_valid_n)
            cnt = jnp.sum(jnp.where(live, 1, 0), axis=1)  # (TN,)
            trips = jnp.minimum(jnp.int32(k), jnp.max(cnt))
            ds[...] = dm

            def dbody(j, carry):
                bk_d, bk_i = carry
                cur = ds[...]
                amd = jnp.min(cur, axis=1)                # (TN,)
                am = jnp.argmin(cur, axis=1).astype(jnp.int32)
                hit = col == am[:, None]
                bk_d = jnp.where(colk == j, amd[:, None], bk_d)
                bk_i = jnp.where(colk == j, (am + phys * tile_m)[:, None],
                                 bk_i)
                ds[...] = jnp.where(hit, jnp.inf, cur)
                return bk_d, bk_i

            # exhausted rows emit (inf, col-0 index) fakes and unfilled
            # slots stay (inf, BIG) — both lose the distance-first merge
            # to any finite carry entry, and after the first block (which
            # always runs unmasked at kth = inf with TM >= k candidates)
            # the carry is all-finite, so fakes can never reach out_ref.
            bk_d, bk_i = jax.lax.fori_loop(
                0, trips, dbody,
                (jnp.full((TN, k), jnp.inf, jnp.float32),
                 jnp.full((TN, k), 2 ** 30, jnp.int32)))
        else:
            # block top-k by k argmin-extract passes over the (TN, TM) block
            def bbody(j, carry):
                d2, bk_d, bk_i = carry
                amd = jnp.min(d2, axis=1)                     # (TN,)
                am = jnp.argmin(d2, axis=1).astype(jnp.int32)
                hit = col == am[:, None]
                bk_d = jnp.where(colk == j, amd[:, None], bk_d)
                bk_i = jnp.where(colk == j,
                                 (am + phys * tile_m)[:, None], bk_i)
                return jnp.where(hit, jnp.inf, d2), bk_d, bk_i

            carry = (d2, jnp.zeros((TN, k), jnp.float32),
                     jnp.zeros((TN, k), jnp.int32))
            if unroll:
                for j in range(k):
                    carry = bbody(j, carry)
                _, bk_d, bk_i = carry
            else:
                _, bk_d, bk_i = jax.lax.fori_loop(0, k, bbody, carry)

        # merge the sorted carry with the sorted block list: k
        # argmin-extract passes over (TN, 2k), LEXICOGRAPHIC on
        # (distance, global index) so exact ties break to the lowest index
        # under ANY m-tile visiting order (diag_order visits tiles out of
        # ascending-m order). The equality mask compares COPIED bits (md
        # entries are verbatim d2/carry copies), not recomputed floats —
        # safe per the excess-precision rule. Both inputs being sorted
        # keeps the result sorted by induction.
        md = jnp.concatenate([cd[...], bk_d], axis=1)     # (TN, 2k)
        mi_idx = jnp.concatenate([ci[...], bk_i], axis=1)
        BIG = jnp.int32(2 ** 30)

        def mbody(j, carry):
            md, nd, ni = carry
            amd = jnp.min(md, axis=1)                     # (TN,)
            tie = md == amd[:, None]
            picked = jnp.min(jnp.where(tie, mi_idx, BIG), axis=1)
            hit = tie & (mi_idx == picked[:, None])
            nd = jnp.where(colk == j, amd[:, None], nd)
            ni = jnp.where(colk == j, picked[:, None], ni)
            return jnp.where(hit, jnp.inf, md), nd, ni

        _, nd, ni = jax.lax.fori_loop(
            0, k, mbody, (md, jnp.zeros((TN, k), jnp.float32),
                          jnp.zeros((TN, k), jnp.int32)))
        cd[...] = nd
        ci[...] = ni

    @pl.when(visit)
    def _visit():
        d2 = _dist_block(q, t, col + phys * tile_m < n_valid_m)

        # tile skip: if no row's block minimum beats-or-ties its current
        # k-th best, the ~4k selection sweeps below cannot change the carry
        # — one row-min sweep decides. Exact (a skipped tile provably
        # contributes nothing); on spatially coherent clouds most far-apart
        # tiles skip. The gate must be <= , not < : an equal-distance
        # candidate can still win the lexicographic (distance, index) merge
        # below with a lower global index, and under diag_order the
        # lower-index tile may be visited LATER — a strict gate would prune
        # it and make exact-tie results depend on the visiting order.
        row_min = jnp.min(d2, axis=1, keepdims=True)      # (TN, 1)
        improves = jnp.any(row_min <= cd[...][:, k - 1:k])
        _run_select(improves, d2)

    @pl.when(mi == pl.num_programs(2) - 1)
    def _flush():
        out_ref[0] = ci[...]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "tile_m",
                                             "interpret", "unroll",
                                             "diag_order", "dyn_select",
                                             "diag_stretch"))
def knn_stream(src: jnp.ndarray, tgt: jnp.ndarray, k: int,
               tile_n: int = 256, tile_m: int = 4096,
               interpret: bool = False, unroll: bool = True,
               diag_order: bool = False,
               cull_lb: jnp.ndarray | None = None,
               dyn_select: bool = False,
               diag_stretch: int = 1) -> jnp.ndarray:
    """(B,N,C) x (B,M,C) -> int32 (B,N,k) ascending distance, M streamed.

    `cull_lb` (optional, (B, n_n_tiles, n_m_tiles) f32): per tile-pair
    lower bounds on the squared distance — blocks whose bound exceeds the
    query tile's worst running k-th distance are skipped entirely,
    distance matmul included (exact under the in-kernel safety margin; see
    _knn_stream_kernel). Producers: knn_self_spatial's Morton-tile AABBs.

    Semantics match ops/common.py:knn (lax.top_k over clamped distances:
    ascending distance, exact ties broken by the lower index). Requires
    tile_m >= k and M >= k.

    Defaults are the chip A/B winners at N=M=35k, k=20
    (scripts/kernel_ab_stream.py, v5e r3): 69.5 ms/cloud at
    (256, 4096, unroll=True) vs 168 ms at the first-cut
    (256, 2048, rolled) — the rolled fori_loop carries the (TN, TM) block
    as loop state and Mosaic rematerialises it every pass, and wide
    lane-dim tiles beat tall sublane tiles (tn1024/tm512 was 441 ms).

    `diag_order=True` visits m-tiles nearest the diagonal first so the
    per-tile skip gate (no row improves its k-th best -> skip the ~4k
    selection sweeps) engages early — effective when query and target index
    order are spatially correlated (see knn_self_spatial). Results are
    identical either way: the merge is lexicographic on (distance, index)
    and the skip gate passes exact ties (<=), so tie-breaks cannot depend
    on the tile visiting order.

    `dyn_select=True` replaces the static k argmin-extract passes per
    visited block with a dynamic-trip loop bounded by the number of
    candidates that actually beat-or-tie their row's current k-th best —
    most visited blocks late in the stream contribute 0-3 candidates, so
    selection work collapses on coherent clouds (see _knn_stream_kernel).
    Exact: the mask can only drop candidates that provably cannot enter
    the merged top-k. Costs a (tile_n, tile_m) f32 VMEM scratch.
    """
    B, N, C = src.shape
    M = tgt.shape[1]
    tile_n = min(tile_n, N)
    tile_m = min(tile_m, M)
    assert tile_m >= k and M >= k, (tile_m, M, k)
    n_m = pl.cdiv(M, tile_m)
    cull = cull_lb is not None
    grid = (B, pl.cdiv(N, tile_n), n_m)
    kern = functools.partial(_knn_stream_kernel, k=k, tile_n=tile_n,
                             tile_m=tile_m, n_valid_m=M, n_m=n_m,
                             unroll=unroll, diag_order=diag_order,
                             n_valid_n=N, cull=cull, dyn=dyn_select,
                             stretch=diag_stretch)
    if diag_order:
        tgt_map = lambda b, i, m: (
            b, _diag_first(i, m, n_m=n_m, tile_n=tile_n, tile_m=tile_m,
                           stretch=diag_stretch), 0)
    else:
        tgt_map = lambda b, i, m: (b, m, 0)
    in_specs = [pl.BlockSpec((1, tile_n, C), lambda b, i, m: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_m, C), tgt_map,
                             memory_space=pltpu.VMEM)]
    args = (src.astype(jnp.float32), tgt.astype(jnp.float32))
    if cull:
        assert cull_lb.shape == (B, grid[1], n_m), (cull_lb.shape, grid)
        flat = cull_lb.astype(jnp.float32).reshape(B, 1, grid[1] * n_m)
        in_specs.append(pl.BlockSpec((1, 1, grid[1] * n_m),
                                     lambda b, i, m: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args += (flat,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_n, k), lambda b, i, m: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        scratch_shapes=(
            [pltpu.VMEM((tile_n, k), jnp.float32),
             pltpu.VMEM((tile_n, k), jnp.int32)]
            + ([pltpu.VMEM((tile_n, tile_m), jnp.float32)]
               if dyn_select else [])),
        interpret=interpret,
    )(*args)


def _tile_boxes(xs: jnp.ndarray, tile: int):
    """(B, N, 3) sorted cloud -> per-tile AABBs ((B, T, 3) mins, maxs)."""
    B, N, _ = xs.shape
    T = -(-N // tile)
    pad = T * tile - N
    lo = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)),
                 constant_values=jnp.inf).reshape(B, T, tile, 3).min(axis=2)
    hi = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)),
                 constant_values=-jnp.inf).reshape(B, T, tile, 3).max(axis=2)
    return lo, hi


def _tile_pair_bounds(xs: jnp.ndarray, tile_n: int,
                      tile_m: int) -> jnp.ndarray:
    """(B, N, 3) sorted -> (B, T_n, T_m) squared AABB-separation bounds.

    Exact-math lower bound on any squared distance between a point of
    n-tile i and a point of m-tile j — per-axis box gap, squared-summed —
    MINUS a float-safety tolerance, so the result lower-bounds the
    COMPUTED d2 of _dist_block too. The kernel's |q|^2+|t|^2-2q.t form
    cancels catastrophically at small separations: its absolute error
    scales with the squared coordinate magnitude (~couple of f32 ulps of
    2*max|x|^2), not with the distance. 1e-5 * (1 + 2 max|x|^2) is ~15x
    the worst bound; clusters a cull could actually skip sit orders of
    magnitude above it, so pruning power is untouched. Pad tiles (empty
    range) come out with +/-inf boxes -> clamp any non-finite bound to 0
    (never culls; the kernel's column-validity mask handles pad columns
    and pad ROWS only ever shrink `worst`).
    """
    return _pair_tile_bounds(xs, xs, tile_n, tile_m)


def _pair_tile_bounds(qs: jnp.ndarray, ts: jnp.ndarray, tile_n: int,
                      tile_m: int) -> jnp.ndarray:
    """Cross-cloud flavour of _tile_pair_bounds: (B, T_n, T_m) bounds
    between tiles of a sorted query cloud and a sorted target cloud."""
    nlo, nhi = _tile_boxes(qs, tile_n)                  # (B, T_n, 3)
    mlo, mhi = _tile_boxes(ts, tile_m)                  # (B, T_m, 3)
    gap = jnp.maximum(0.0, jnp.maximum(
        nlo[:, :, None, :] - mhi[:, None, :, :],
        mlo[:, None, :, :] - nhi[:, :, None, :]))       # (B, T_n, T_m, 3)
    lb = jnp.sum(gap * gap, axis=-1)
    tol = 1e-5 * (1.0 + jnp.max(jnp.sum(qs * qs, axis=-1), axis=1)
                  + jnp.max(jnp.sum(ts * ts, axis=-1), axis=1))
    lb = jnp.maximum(0.0, lb - tol[:, None, None])
    return jnp.where(jnp.isfinite(lb), lb, 0.0)


def _morton3(x: jnp.ndarray, box=None) -> jnp.ndarray:
    """(B, N, 3) -> (B, N) uint32 Morton (Z-order) codes, 10 bits/axis.

    Normalises per cloud to the bounding box (`box=(mn, mx)` overrides it —
    two clouds sorted against one shared box get COMPARABLE ranks, which is
    what knn_cross_spatial's rank-stretched diagonal needs); the interleave
    is the standard bit-spread. Used only to SORT points — any spatially
    smooth code works, correctness never depends on it.
    """
    if box is not None:
        mn, mx = box
    else:
        mn = x.min(axis=1, keepdims=True)
        mx = x.max(axis=1, keepdims=True)
    q = ((x - mn) / jnp.maximum(mx - mn, 1e-9) * 1023.0)
    q = jnp.clip(q, 0.0, 1023.0).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (spread(q[..., 0]) | (spread(q[..., 1]) << 1)
            | (spread(q[..., 2]) << 2))


def _knn_self_sorted(x: jnp.ndarray, k: int, tile_n: int, tile_m: int,
                     interpret: bool, dyn_select: bool):
    """Shared core of knn_self_spatial / knn_self_vspace: Morton-sort the
    cloud, build the AABB cull table, stream the self-kNN in sorted space.
    Returns (xs sorted cloud, idx_s sorted-space graph over xs, order) where
    order[b, r] is the ORIGINAL id of sorted row r."""
    B, N, _ = x.shape
    order = jnp.argsort(_morton3(x), axis=-1).astype(jnp.int32)   # (B, N)
    xs = jnp.take_along_axis(x, order[..., None], axis=1)
    # Per-tile AABBs of the sorted cloud -> exact-math lower bounds on the
    # squared distance any (n_tile, m_tile) block can produce. Morton
    # sorting makes tiles spatially compact, so most off-diagonal bounds
    # are large and the kernel culls those blocks before the distance
    # matmul (see _knn_stream_kernel).
    lb = _tile_pair_bounds(xs, min(tile_n, N), min(tile_m, N))
    idx_s = knn_stream(xs, xs, k, tile_n=tile_n, tile_m=tile_m,
                       interpret=interpret, diag_order=True,
                       cull_lb=lb, dyn_select=dyn_select)         # sorted ids
    return xs, idx_s, order


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "tile_m",
                                             "interpret", "dyn_select"))
def knn_self_vspace(x: jnp.ndarray, k: int,
                    tile_n: int = 64, tile_m: int = 4096,
                    interpret: bool = False,
                    dyn_select: bool = False):
    """Self-graph kNN that STAYS in Morton-sorted space: (B, N, 3) ->
    (xs (B,N,3), idx_s int32 (B,N,k), inv int32 (B,N)).

    knn_self_spatial maps the sorted-space result back to original point
    order — an s32 (B*N*k) scalar gather through the Morton permutation
    that was the second-largest op of the whole indoor eval forward
    (14.1 ms/fwd at N=35k, profiles/r3 2026_08_19 trace) even though no
    model consumer needs original-space ids: DGCNN's edge features and the
    PositionEncoding angles both only gather COORDINATES through the
    graph. This variant returns the graph in sorted space together with
    the sorted cloud: consumers gather coordinates from `xs` with `idx_s`,
    compute their per-point outputs in sorted row order, and un-sort the
    final FEATURES once with `inv` (`out_orig = take_along_axis(out_s,
    inv[..., None], axis=1)`) — one wide-row gather of the (B, N, C)
    result instead of per-edge id remapping.

    Same neighbour sets, per-row ascending distance, and tie rule as
    knn_self_spatial (row r of idx_s describes original point
    order[b, r]; idx_s values index rows of xs).
    """
    xs, idx_s, order = _knn_self_sorted(x, k, tile_n, tile_m, interpret,
                                        dyn_select)
    inv = jnp.argsort(order, axis=-1).astype(jnp.int32)
    return xs, idx_s, inv


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "tile_m",
                                             "interpret", "dyn_select"))
def knn_self_spatial(x: jnp.ndarray, k: int,
                     tile_n: int = 64, tile_m: int = 4096,
                     interpret: bool = False,
                     dyn_select: bool = False) -> jnp.ndarray:
    """Self-graph kNN with a Morton pre-sort: (B, N, 3) -> (B, N, k).

    Sorting the cloud along a Z-order curve makes index locality track
    spatial locality, so knn_stream's diagonal-first visiting order finds
    each row's true k nearest in the first few tiles; the per-tile skip
    gate then cancels the selection sweeps for later tiles, and the AABB
    cull (cull_lb, exact-math tile-pair bounds) skips far blocks before
    even their distance matmul — on spatially coherent scans most of the
    O(N^2) block work never runs. Indices are
    mapped back to the ORIGINAL point order; per-row neighbour order stays
    ascending-distance. Exact-tie index choice can differ from lax.top_k
    (ties resolve by sorted position, not original index) — all model
    consumers max-pool over k, so this is unobservable there.

    Tile default (64, 4096) is the r3 on-chip A/B winner at N=35k, k=20
    WITH the AABB cull (scripts/kernel_ab_stream.py: 36.7/54.4 ms/cloud
    surface/gauss; pre-cull best was 40.1/52.6 at tn128 — finer query
    tiles tighten each tile's `worst` bound so more blocks cull, which
    outweighs the extra per-block overhead). Cull-era Mosaic envelope
    note: tn256/tm4096 and tn128/tm8192 crash the Mosaic pipeline with
    the cull input attached (remote-compile 500) — stay at tile_m 4096
    and tile_n <= 128 until re-validated.
    """
    B, N, _ = x.shape
    xs, idx_s, order = _knn_self_sorted(x, k, tile_n, tile_m, interpret,
                                        dyn_select)
    # sorted-space neighbour ids -> original ids
    orig = jnp.take_along_axis(order, idx_s.reshape(B, -1),
                               axis=1).reshape(B, N, k)
    # row r of idx_s describes original point order[b, r]: scatter rows back
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(orig, inv[..., None], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "tile_m",
                                             "interpret", "dyn_select"))
def knn_cross_spatial(q: jnp.ndarray, t: jnp.ndarray, k: int,
                      tile_n: int = 64, tile_m: int = 4096,
                      interpret: bool = False,
                      dyn_select: bool = False) -> jnp.ndarray:
    """Cross-cloud kNN with Morton sorting on BOTH sides:
    (B, L, 3) queries x (B, M, 3) targets -> (B, L, k).

    The point-sharded self graph (parallel/sp.py) is this op's home: each
    shard queries its LOCAL rows against the FULL replicated cloud, so the
    `src is tgt` route of knn_self_spatial never fires and round 3 left the
    sp path paying full uncull streams (VERDICT r3 weak #2). Sorting the
    local queries by Morton code (against the JOINT bounding box, so ranks
    are comparable across clouds) makes query tiles spatially compact;
    sorting the target the same way makes the AABB tile-pair bounds tight.
    The remaining question is the VISITING order: a shard's rows are a
    uniform random sample of the cloud, so local sorted rank r sits at
    global sorted rank ~ r * (M / L) — a STATIC stretch factor re-centres
    knn_stream's diagonal-first order without any scalar prefetch
    (`_diag_first(stretch=...)`). The cull keeps exactness regardless;
    stretch only decides how early the skip gate and cull engage.

    Returns indices into t's ORIGINAL row order, rows in q's original
    order, ascending distance. Exact neighbour sets; tie index choice may
    differ from lax.top_k (ties resolve by sorted position) — same
    contract as knn_self_spatial.
    """
    B, L, _ = q.shape
    M = t.shape[1]
    mn = jnp.minimum(q.min(axis=1, keepdims=True),
                     t.min(axis=1, keepdims=True))
    mx = jnp.maximum(q.max(axis=1, keepdims=True),
                     t.max(axis=1, keepdims=True))
    qord = jnp.argsort(_morton3(q, box=(mn, mx)), axis=-1).astype(jnp.int32)
    tord = jnp.argsort(_morton3(t, box=(mn, mx)), axis=-1).astype(jnp.int32)
    qs = jnp.take_along_axis(q, qord[..., None], axis=1)
    ts = jnp.take_along_axis(t, tord[..., None], axis=1)
    lb = _pair_tile_bounds(qs, ts, min(tile_n, L), min(tile_m, M))
    stretch = max(1, round(M / L))
    idx_s = knn_stream(qs, ts, k, tile_n=tile_n, tile_m=tile_m,
                       interpret=interpret, diag_order=True,
                       diag_stretch=stretch, cull_lb=lb,
                       dyn_select=dyn_select)
    # sorted-target ids -> original target ids; then unsort the query rows
    orig = jnp.take_along_axis(tord, idx_s.reshape(B, -1),
                               axis=1).reshape(B, L, k)
    qinv = jnp.argsort(qord, axis=-1)
    return jnp.take_along_axis(orig, qinv[..., None], axis=1)


# --------------------------------------------------------------------------
# Overlap-head softmax-weighted projection: online softmax (flash-style)
# --------------------------------------------------------------------------

def _wproject_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_s, l_s, acc_s,
                     *, tile_m: int, n_valid_m: int):
    mi = pl.program_id(2)

    @pl.when(mi == 0)
    def _init():
        m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    q = q_ref[0]                                          # (TN, D)
    kk = k_ref[0]                                         # (TM, D)
    TN, TM = q.shape[0], kk.shape[0]
    s = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (TN, TM)
    col = jax.lax.broadcasted_iota(jnp.int32, (TN, TM), 1) + mi * tile_m
    valid = col < n_valid_m
    s = jnp.where(valid, s, -jnp.inf)

    m_prev = m_s[...]                                     # (TN, 1)
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)                      # first tile: exp(-inf - m) = 0
    p = jnp.exp(s - m_next)                               # masked cols -> 0
    l_s[...] = alpha * l_s[...] + jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0]                                          # (TM, 1) f32
    # where-select, not multiply: padded tail rows of v read garbage (NaN)
    # and p * NaN would poison the whole row even where p == 0
    contrib = jnp.where(valid, p * v[:, 0][None, :], 0.0)
    acc_s[...] = acc_s[...] * alpha + jnp.sum(contrib, axis=1, keepdims=True)
    m_s[...] = m_next

    @pl.when(mi == pl.num_programs(2) - 1)
    def _flush():
        # l > 0 always: every query row sees >= 1 valid column overall
        o_ref[0] = acc_s[...] / l_s[...]
        lse_ref[0] = m_s[...] + jnp.log(l_s[...])


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def wproject_stream_lse(q_feats: jnp.ndarray, k_feats: jnp.ndarray,
                        values: jnp.ndarray,
                        tile_n: int = 256, tile_m: int = 1024,
                        interpret: bool = False):
    """Like wproject_stream but also returns the per-row logsumexp (B, N, 1)
    of the similarity logits — the residual the flash-style backward needs
    to recompute the softmax blockwise (p = exp(s - lse))."""
    B, N, D = q_feats.shape
    M = k_feats.shape[1]
    assert values.shape == (B, M, 1), values.shape
    tile_n = min(tile_n, N)
    tile_m = min(tile_m, M)
    grid = (B, pl.cdiv(N, tile_n), pl.cdiv(M, tile_m))
    kern = functools.partial(_wproject_kernel, tile_m=tile_m, n_valid_m=M)
    out, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_n, D), lambda b, i, m: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_m, D), lambda b, i, m: (b, m, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_m, 1), lambda b, i, m: (b, m, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, tile_n, 1), lambda b, i, m: (b, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile_n, 1), lambda b, i, m: (b, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((tile_n, 1), jnp.float32),
                        pltpu.VMEM((tile_n, 1), jnp.float32),
                        pltpu.VMEM((tile_n, 1), jnp.float32)],
        interpret=interpret,
    )(q_feats, k_feats, values.astype(jnp.float32))
    return out, lse


def wproject_stream(q_feats: jnp.ndarray, k_feats: jnp.ndarray,
                    values: jnp.ndarray,
                    tile_n: int = 256, tile_m: int = 1024,
                    interpret: bool = False) -> jnp.ndarray:
    """softmax(q @ k^T, axis=-1) @ v without the (N, M) matrix. v dim == 1.

    q (B,N,D), k (B,M,D), values (B,M,1) -> (B,N,1) f32. The overlap head's
    similarity-weighted score projection (models/gmmreg.py:74-89): callers
    pass l2-normalised features so q @ k^T is the cosine similarity; the
    second direction of the head is the same call with roles swapped
    (see nn/gmmreg.py). Softmax statistics are f32; the feature matmul runs
    in the input dtype with f32 accumulation — identical MXU numerics to the
    dense einsum path.

    Differentiable: the VJP recomputes the softmax blockwise from the saved
    logsumexp (flash-attention-style backward, `_wproject_bwd`) — no (N, M)
    residual is ever stored, so the overlap head TRAINS at indoor scale.
    """
    return _wproject(q_feats, k_feats, values, tile_n, tile_m, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _wproject(q_feats, k_feats, values, tile_n, tile_m, interpret):
    return wproject_stream_lse(q_feats, k_feats, values,
                               tile_n=tile_n, tile_m=tile_m,
                               interpret=interpret)[0]


def _wproject_fwd(q_feats, k_feats, values, tile_n, tile_m, interpret):
    out, lse = wproject_stream_lse(q_feats, k_feats, values,
                                   tile_n=tile_n, tile_m=tile_m,
                                   interpret=interpret)
    return out, (q_feats, k_feats, values, out, lse)


def _wproject_bwd(tile_n, tile_m, interpret, res, g):
    """Flash-style backward: p = exp(s - lse) recomputed per query chunk.

    With o_i = sum_m p_im v_m and upstream g_i:
      s_bar_im = p_im g_i (v_m - o_i)
      q_bar = s_bar @ k ; k_bar = s_bar^T @ q ; v_bar = p^T g
    Peak memory is (B, chunk, M) — jnp/XLA (runs on any backend), so the
    whole train step stays differentiable without a hand-written backward
    kernel.
    """
    q, k, v, out, lse = res
    B, N, D = q.shape
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    chunk = min(N, max(256, 2 ** 24 // max(k.shape[1], 1)))
    qs, nc = _chunk_rows(q32, chunk)                        # (nc, B, c, D)
    lses, _ = _chunk_rows(lse, chunk)
    outs, _ = _chunk_rows(out, chunk)
    # tail padding: _chunk_rows edge-pads (duplicating the last real row),
    # which would double-count padded rows into k_bar/v_bar — zero-pad the
    # upstream gradient instead so padded rows contribute exactly nothing
    g32 = jnp.pad(g.astype(jnp.float32),
                  ((0, 0), (0, nc * chunk - N), (0, 0)))
    gs = jnp.moveaxis(g32.reshape(B, nc, chunk, 1), 1, 0)
    vrow = v32[..., 0]                                      # (B, M)

    M = k.shape[1]

    # k_bar/v_bar partials are (B, M, D)/(B, M, 1) PER CHUNK — a lax.map
    # would stack nc of them before the sum (nc=74, B=4, M=35k, D=512 is a
    # 21 GB intermediate: the indoor B=4 train step OOM'd exactly there,
    # r3d). Accumulate them in a lax.scan carry instead; only the cheap
    # (nc, B, chunk, D) q_bar chunks are stacked.
    def one(carry, args):
        kacc, vacc = carry
        qc, lc, oc, gc = args
        s = jnp.einsum('bnd,bmd->bnm', qc, k32,
                       preferred_element_type=jnp.float32)
        p = jnp.exp(s - lc)                                 # (B, c, M)
        sbar = p * gc * (vrow[:, None, :] - oc)             # (B, c, M)
        qbar = jnp.einsum('bnm,bmd->bnd', sbar, k32)
        kbar = jnp.einsum('bnm,bnd->bmd', sbar, qc)
        vbar = jnp.einsum('bnm,bnd->bmd', p, gc)            # (B, M, 1)
        return (kacc + kbar, vacc + vbar), qbar

    (kbar, vbar), qbars = jax.lax.scan(
        one, (jnp.zeros((B, M, D), jnp.float32),
              jnp.zeros((B, M, 1), jnp.float32)), (qs, lses, outs, gs))
    qbar = jnp.moveaxis(qbars, 0, 1).reshape(B, -1, D)[:, :N]
    return (qbar.astype(q.dtype),
            kbar.astype(k.dtype),
            vbar.astype(v.dtype))


_wproject.defvjp(_wproject_fwd, _wproject_bwd)


# --------------------------------------------------------------------------
# Chunked jnp fallbacks — HBM bounded at (B, chunk, M); CPU path + the
# numerical reference for the kernels above
# --------------------------------------------------------------------------

def _chunk_rows(x: jnp.ndarray, chunk: int):
    """(B, N, C) -> (nc, B, chunk, C) with edge padding (values ignored by
    callers: padded rows produce outputs that are sliced away)."""
    B, N, C = x.shape
    nc = -(-N // chunk)
    pad = nc * chunk - N
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode='edge')
    return jnp.moveaxis(x.reshape(B, nc, chunk, C), 1, 0), nc


@functools.partial(jax.jit, static_argnames=("chunk",))
def nn1_chunked(src: jnp.ndarray, tgt: jnp.ndarray, chunk: int = 1024):
    """1-NN via lax.map over query chunks: peak extra HBM = B*chunk*M f32."""
    from ogmm_tpu.ops.common import square_distance
    B, N, _ = src.shape
    chunks, _ = _chunk_rows(src.astype(jnp.float32), chunk)

    def one(qc):
        d = square_distance(qc, tgt)                      # (B, chunk, M)
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)

    d, i = jax.lax.map(one, chunks)                       # (nc, B, chunk)
    d = jnp.moveaxis(d, 0, 1).reshape(B, -1)[:, :N]
    i = jnp.moveaxis(i, 0, 1).reshape(B, -1)[:, :N]
    return d, i


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_chunked(src: jnp.ndarray, tgt: jnp.ndarray, k: int,
                chunk: int = 1024) -> jnp.ndarray:
    """kNN via lax.map over query chunks + lax.top_k over the full M axis."""
    from ogmm_tpu.ops.common import square_distance
    B, N, _ = src.shape
    chunks, _ = _chunk_rows(src.astype(jnp.float32), chunk)

    def one(qc):
        d = square_distance(qc, tgt)
        return jax.lax.top_k(-d, k)[1].astype(jnp.int32)

    idx = jax.lax.map(one, chunks)                        # (nc, B, chunk, k)
    return jnp.moveaxis(idx, 0, 1).reshape(B, -1, k)[:, :N]


@functools.partial(jax.jit, static_argnames=("chunk",))
def wproject_chunked(q_feats: jnp.ndarray, k_feats: jnp.ndarray,
                     values: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """softmax(q @ k^T) @ v via lax.map over query chunks."""
    B, N, _ = q_feats.shape
    chunks, _ = _chunk_rows(q_feats, chunk)
    values = values.astype(jnp.float32)

    def one(qc):
        s = jnp.einsum('bnd,bmd->bnm', qc, k_feats,
                       preferred_element_type=jnp.float32)
        return jnp.einsum('bnm,bmd->bnd', jax.nn.softmax(s, axis=-1), values)

    out = jax.lax.map(one, chunks)                        # (nc, B, chunk, 1)
    return jnp.moveaxis(out, 0, 1).reshape(B, -1, 1)[:, :N]
