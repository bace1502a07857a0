"""Batched point-cloud primitives (channel-last, fixed-shape, jit-safe).

Replaces reference lib/utils.py:12-66 (square_distance / knn /
get_graph_feature) and lib/utils.py:111-127, 222-230. All shapes are static so
XLA tiles the N x N distance matmuls onto the MXU; gathers are
jnp.take_along_axis (vectorised one-hot-free gathers on TPU).

Layout: points/features are (B, N, C) with channels last — C rides the
128-lane dimension. The reference uses (B, C, N); our nn layer adapts at its
boundary only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Dispatch envelopes (see `nn1`/`knn` routing below):
#  * whole-M-resident Pallas kernels (ops/pallas_knn.py) hold a
#    (tile_n, M) f32 distance block plus an i32 iota in VMEM — validated on
#    chip to M=4096 (~4 MB); beyond that the M-streamed kernels
#    (ops/pallas_stream.py) carry running reductions in scratch instead.
#  * the dense jnp path materialises B*N*M f32 in HBM; beyond _DENSE_ELEMS
#    elements the chunked lax.map fallbacks bound peak HBM at (B, chunk, M).
_PALLAS_FULL_M = 4096
_DENSE_ELEMS = 2 ** 26          # 64 Mi elements = 256 MB f32


def nn1(src: jnp.ndarray, tgt: jnp.ndarray,
        prefer_dense: bool = False,
        use_pallas: bool | None = None):
    """Nearest neighbour: (B,N,C) x (B,M,C) -> (min_sqdist (B,N), idx (B,N)).

    The single dispatch point for every 1-NN consumer (ICP, chamfer/pcab
    metrics, Welsch loss, get_local_corrs) — TPU picks the fused Pallas
    kernel (whole-M-resident at M <= 4096, M-streamed above), other backends
    the dense matrix at B*N*M <= 64Mi elements and the chunked lax.map
    fallback beyond.

    `prefer_dense=True` keeps the XLA dense path up to M=1024 even on TPU —
    the measured winner for callers that loop the op inside one program
    (ICP's 30 trips: 30 kernel dispatches of glue cost more than the HBM
    matrix at M=717, see ops/icp.py).
    """
    B, N, _ = src.shape
    M = tgt.shape[1]
    forced = use_pallas is not None
    if use_pallas is None:
        from ogmm_tpu.ops.dispatch import use_pallas as _auto
        use_pallas = _auto()
    if use_pallas:
        # prefer_dense is a heuristic and must not override an EXPLICIT
        # use_pallas=True (kernel parity checks / A/Bs force the kernel)
        if prefer_dense and not forced and M <= 1024:
            pass                                     # dense XLA below
        elif M <= _PALLAS_FULL_M:
            from ogmm_tpu.ops.pallas_knn import nn1_pallas
            return nn1_pallas(src, tgt)
        else:
            from ogmm_tpu.ops.pallas_stream import nn1_stream
            return nn1_stream(src, tgt)
    if B * N * M > _DENSE_ELEMS:
        from ogmm_tpu.ops.pallas_stream import nn1_chunked
        return nn1_chunked(src, tgt)
    d = square_distance(src, tgt)
    return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)


def nn1_both(src: jnp.ndarray, tgt: jnp.ndarray,
             use_pallas: bool | None = None):
    """Bidirectional 1-NN min distances for chamfer-style reductions:
    (B,N,C) x (B,M,C) -> (d_src (B,N), d_tgt (B,M)), each the squared
    distance to the nearest point of the OTHER cloud.

    On the dense jnp path (non-TPU backends at B*N*M <= 64Mi — every CPU
    train/eval step's metrics ride through here) the (B, N, M) matrix is
    built ONCE and reduced over both axes; two directed nn1 calls would
    build it twice (transposed arguments defeat CSE). Kernel and chunked
    paths keep their running-carry form and pay two directed sweeps —
    they never materialise the matrix at all.
    """
    B, N, _ = src.shape
    M = tgt.shape[1]
    resolved = use_pallas
    if resolved is None:
        from ogmm_tpu.ops.dispatch import use_pallas as _auto
        resolved = _auto()
    if not resolved and B * N * M <= _DENSE_ELEMS:
        d = square_distance(src, tgt)
        return jnp.min(d, axis=-1), jnp.min(d, axis=-2)
    return nn1(src, tgt, use_pallas=use_pallas)[0], \
        nn1(tgt, src, use_pallas=use_pallas)[0]


def square_distance(src: jnp.ndarray, dst: jnp.ndarray,
                    normalize: bool = False) -> jnp.ndarray:
    """Pairwise squared euclidean distance (B, N, C) x (B, M, C) -> (B, N, M).

    Reference: lib/utils.py:12-34. `normalize=True` assumes unit-norm inputs
    and returns 2 - 2 <x, y> (lib/utils.py:29-30).

    Geometry matmuls run at Precision.HIGHEST: on TPU the default matmul path
    feeds the MXU bf16 operands, and ~1e-2 distance error can flip kNN graph
    topology / ICP correspondences. These (B, N, M<=1024, C=3) contractions are
    tiny, so full fp32 costs nothing measurable.
    """
    inner = jnp.einsum('bnc,bmc->bnm', src, dst,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if normalize:
        return 2.0 - 2.0 * inner
    d = (src ** 2).sum(-1)[..., :, None] + (dst ** 2).sum(-1)[..., None, :] - 2.0 * inner
    return jnp.maximum(d, 1e-12)


def knn(src: jnp.ndarray, tgt: jnp.ndarray, k: int,
        normalize: bool = False,
        use_pallas: bool | None = None) -> jnp.ndarray:
    """Indices of the k nearest neighbours of each src point among tgt.

    (B, N, C) x (B, M, C) -> int32 (B, N, k), sorted by ascending distance.
    Reference: lib/utils.py:37-44.

    On TPU the euclidean path runs as a tiled Pallas kernel that never
    materialises the (B, N, M) distance matrix in HBM — whole-M-resident at
    M <= 4096 (ops/pallas_knn.py), M-streamed with a running top-k carry
    above (ops/pallas_stream.py, the indoor N~35k regime). Non-TPU backends
    use the dense matrix while it fits (B*N*M <= 64Mi elements) and a
    chunked lax.map beyond. `use_pallas=None` auto-selects by backend.
    """
    B, N, _ = src.shape
    M = tgt.shape[1]
    if use_pallas is None:
        from ogmm_tpu.ops.dispatch import use_pallas as _auto
        use_pallas = (not normalize) and _auto()
    if use_pallas and not normalize:
        if M <= _PALLAS_FULL_M:
            from ogmm_tpu.ops.pallas_knn import knn_pallas
            return knn_pallas(src, tgt, k)
        if src is tgt and src.shape[-1] == 3:
            # large self-graph: Morton pre-sort + diagonal-first streaming
            # lets the per-tile skip gate cancel most selection sweeps on
            # spatially coherent clouds (exact k-NN set; tie index choice
            # may differ from top_k — consumers max over k)
            from ogmm_tpu.ops.pallas_stream import knn_self_spatial
            return knn_self_spatial(src, k)
        if src.shape[-1] == 3 and tgt.shape[-1] == 3:
            # large cross-shaped xyz query (the point-sharded self graph:
            # local rows x full replicated cloud) — Morton-sort both sides
            # against a joint box and cull with rank-stretched diagonal
            # visiting (same exact-set contract as knn_self_spatial)
            from ogmm_tpu.ops.pallas_stream import knn_cross_spatial
            return knn_cross_spatial(src, tgt, k)
        from ogmm_tpu.ops.pallas_stream import knn_stream
        return knn_stream(src, tgt, k)
    if not normalize and B * N * M > _DENSE_ELEMS:
        from ogmm_tpu.ops.pallas_stream import knn_chunked
        return knn_chunked(src, tgt, k)
    dist = square_distance(src, tgt, normalize)
    _, idx = jax.lax.top_k(-dist, k)  # top_k is sorted descending => ascending distance
    return idx


def knn_self_vspace(x: jnp.ndarray, k: int,
                    use_pallas: bool | None = None):
    """Self-kNN graph in the cheapest index space: (B, N, 3) ->
    (xs, idx (B, N, k) int32, inv).

    `inv is None` means the graph is in ORIGINAL point order and `xs is x`
    (small/medium N, or a non-TPU backend — the spaces coincide). Otherwise
    the graph lives in Morton-sorted space: `idx` indexes rows of the
    sorted cloud `xs`, row r of `idx` describes sorted row r of `xs`, and
    per-point outputs computed in that order map back to original order
    with one row gather, `take_along_axis(out_s, inv[..., None], axis=1)`.

    Consumers that only gather coordinates through the graph (DGCNN edge
    features, PositionEncoding angles — the whole large-N model path) use
    this instead of `knn(x, x, k)` to skip knn_self_spatial's
    sorted->original id remap, the second-largest op of the indoor eval
    forward (14.1 ms/fwd at N=35k, profiles/r3 2026_08_19 trace). The
    neighbour sets/order/tie rule match `knn` up to the documented
    knn_self_spatial tie contract.
    """
    _, N, C = x.shape
    if use_pallas is None:
        from ogmm_tpu.ops.dispatch import use_pallas as _auto
        use_pallas = _auto()
    if use_pallas and N > _PALLAS_FULL_M and C == 3:
        from ogmm_tpu.ops.pallas_stream import knn_self_vspace as _kv
        return _kv(x, k)
    return x, knn(x, x, k, use_pallas=use_pallas), None


def posenc_alpha(x: jnp.ndarray, nbr: jnp.ndarray,
                 centroid: jnp.ndarray | None = None) -> jnp.ndarray:
    """PositionEncoding angle features from PRE-GATHERED neighbours:
    cos(angle(p -> nbr_j, p -> centroid)) — x (B, N, 3), nbr (B, N, k, 3)
    -> (B, N, k) f32.

    Matches the angle branch of nn/attention.py:PositionEncoding
    (reference models/attn.py:59-75) bit-for-bit given the same gathered
    neighbour coordinates; callers that already hold the (B, N, k, 3)
    gather (the shared large-N graph path) use this to skip the second
    prefix gather. A coincident neighbour (the self point at j=0) yields
    p2lc = 0 -> alpha 0, same as every other alpha producer.
    """
    if centroid is None:
        centroid = x.mean(axis=1, keepdims=True)
    p2gc = l2_normalize(x - centroid)                      # (B, N, 3)
    p2lc = l2_normalize(nbr - x[:, :, None, :])            # (B, N, k, 3)
    return jnp.einsum('bnkc,bnc->bnk', p2lc, p2gc,
                      preferred_element_type=jnp.float32)
def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows: (B, N, C) indexed by int (B, S) -> (B, S, C).

    Reference: lib/utils.py:111-127.
    """
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def gather_neighbors(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbour features: (B, N, C) + int (B, N, k) -> (B, N, k, C)."""
    B, N, k = idx.shape
    flat = jnp.take_along_axis(points, idx.reshape(B, N * k)[..., None], axis=1)
    return flat.reshape(B, N, k, points.shape[-1])


def graph_feature(x: jnp.ndarray, k: int, idx: jnp.ndarray | None = None,
                  nbr_pts: jnp.ndarray | None = None) -> jnp.ndarray:
    """EdgeConv features: concat[neighbor - x, x] -> (B, N, k, 2C).

    Reference: lib/utils.py:47-66 (`get_graph_feature`), channel-first there
    ((B, 2C, N, k)); here channel-last so the following 1x1 convs are Dense
    layers on the lane dimension.

    `nbr_pts` optionally supplies the gather SOURCE for the neighbour rows
    (default: x itself). Point-sharded forwards (parallel/sp.py) pass the
    full replicated cloud here while x is the device-local query chunk and
    idx holds global indices into nbr_pts.
    """
    if idx is None:
        idx = knn(x, x, k)
    neigh = gather_neighbors(nbr_pts if nbr_pts is not None else x, idx)
    center = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh - center, center], axis=-1)


def cos_similarity(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity matrix (B, N, D) x (B, M, D) -> (B, N, M).

    Reference: lib/utils.py:222-226.
    """
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum('bnd,bmd->bnm', x, y, preferred_element_type=jnp.float32)


def cos_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """2 - 2 cos_sim. Reference: lib/utils.py:229-230."""
    return 2.0 - 2.0 * cos_similarity(x, y)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(p=2) equivalent (torch clamps the norm at 1e-12)."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def cdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Euclidean (not squared) distance matrix, torch.cdist equivalent."""
    return jnp.sqrt(square_distance(x, y))


# ---------------------------------------------------------------------------
# Point-sharded (sequence-parallel) collective helpers.
#
# Inside a shard_map whose mapped axis shards the POINT dimension
# (parallel/sp.py), per-point tensors live as (B, N/n_dev, C) device-local
# chunks with GLOBAL row indices still meaningful (shard i owns rows
# [i*chunk, (i+1)*chunk)). These helpers implement the two cross-shard
# primitives the forward needs: gather-rows-by-global-index and a global
# argmin combine. Both are O(B * S) collectives over tiny payloads (anchor
# counts S <= 128), so they ride ICI at negligible cost next to the
# per-point compute they coordinate.
# ---------------------------------------------------------------------------

def sp_local_info(local_n: int, axis_name: str):
    """(row offset of this shard, global point count) for a sharded axis."""
    start = jax.lax.axis_index(axis_name) * local_n
    n_dev = jax.lax.axis_size(axis_name)
    return start, local_n * n_dev


def index_points_sp(points: jnp.ndarray, idx: jnp.ndarray,
                    axis_name: str) -> jnp.ndarray:
    """`index_points` over a point-sharded array with global indices.

    points: (B, n_local, C) device-local rows of a global (B, N, C) array;
    idx: int (B, S) GLOBAL row indices (replicated). Each shard gathers the
    rows it owns (clipped local gather + ownership mask) and a psum
    assembles the replicated (B, S, C) result — one collective, no
    all-gather of the big per-point tensor.
    """
    n_local = points.shape[1]
    start, _ = sp_local_info(n_local, axis_name)
    local = idx - start                                  # (B, S)
    own = (local >= 0) & (local < n_local)
    got = index_points(points, jnp.clip(local, 0, n_local - 1))
    got = jnp.where(own[..., None], got, jnp.zeros_like(got))
    return jax.lax.psum(got, axis_name)


def nn1_sp(queries: jnp.ndarray, tgt_local: jnp.ndarray,
           axis_name: str) -> tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN of replicated queries against a point-sharded target.

    queries (B, S, C) replicated; tgt_local (B, n_local, C) this shard's
    rows. Local nn1 per shard, then an all-gather of the tiny (B, S)
    (distance, global index) pairs picks the global minimum. Returns
    (min_sqdist (B, S), global idx (B, S)), replicated.
    """
    n_local = tgt_local.shape[1]
    start, _ = sp_local_info(n_local, axis_name)
    d, i = nn1(queries, tgt_local)
    i = i + start
    d_all = jax.lax.all_gather(d, axis_name)             # (n_dev, B, S)
    i_all = jax.lax.all_gather(i, axis_name)
    sel = jnp.argmin(d_all, axis=0)                      # (B, S)
    d_min = jnp.take_along_axis(d_all, sel[None], axis=0)[0]
    i_min = jnp.take_along_axis(i_all, sel[None], axis=0)[0]
    return d_min, i_min
