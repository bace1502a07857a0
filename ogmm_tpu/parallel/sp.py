"""Sequence-parallel (point-sharded) serving for the large-N indoor regime.

The reference's only parallelism is DataParallel over the batch
(reference train.py:190-191); at its indoor operating point the eval batch
is 1 (configs/cfgs.py:100), so batch parallelism cannot reduce the latency
of a single ~35,000-point pair at all. This module adds the axis the
problem actually has: shard the POINT dimension over a `jax.sharding.Mesh`
and run one GMMReg eval forward (+ ICP) cooperatively across chips.

Design (TPU-first, shard_map + explicit collectives over ICI):

  * Per-point compute — DGCNN edge convs, position encoding, attention
    queries, conv heads, EM responsibilities, ICP correspondences — is
    embarrassingly parallel over points and stays shard-local.
  * xyz coordinates are tiny (35k x 3 f32 = 420 KB) and stay fully
    replicated: kNN graph targets, FPS anchor selection, clustering init
    and ICP targets read the replicated cloud, so neighbour gathers never
    cross shards.
  * What genuinely crosses shards is small and explicit: anchor-feature
    gathers (psum-assembled, ops/common.py:index_points_sp), InstanceNorm /
    EM / Sinkhorn-column / Procrustes moments (psum), the overlap head's
    key-side features (one all-gather of the l2-normalised (2B, N, D)
    block), and the 1-NN argmin combine (ops/common.py:nn1_sp).

Eval/serving only: BN batch statistics over a point shard are a different
training semantics than the reference's per-cloud stats, so the training
path keeps the data-parallel mesh (train/trainer.py).

Single-chip hardware note: this repo's chip budget is one TPU — the sp
path is validated for numerics against the unsharded forward on a virtual
CPU mesh (tests/test_sp.py) and compile-validated by the driver's
`dryrun_multichip`; the collectives are standard XLA psum/all_gather over
ICI and the payloads are measured in MB (see docstrings above), so the
expected multi-chip scaling is near-linear in the kNN-dominated regime
(profiles/r3/PROFILE.md: ~70% of the indoor forward is per-point kNN
selection, which shards perfectly).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ogmm_tpu.configs import Config


def sp_mesh(n_devices: Optional[int] = None, axis: str = "sp",
            devices=None) -> Mesh:
    """1-D mesh over the point-sharding axis (defaults to all devices)."""
    if devices is None:
        devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    assert len(devices) >= n, (n, len(devices))
    return Mesh(np.asarray(devices[:n]), (axis,))


def make_sp_eval(variables, cfg: Config, mesh: Mesh, axis: str = "sp",
                 is_test: bool = False):
    """Build a jitted point-sharded GMMReg eval forward.

    Returns `fn(src, tgt) -> (rot, trans, src_o, tgt_o, clu)` with the
    single-device contract (rot/trans/clu replicated, overlap scores
    assembled to the full (B, N)); src/tgt are the full (B, N, 3) clouds
    with N divisible by the mesh size. Outputs match the unsharded
    stacked-eval forward up to collective summation order
    (tests/test_sp.py pins the tolerance).
    """
    from ogmm_tpu.nn import GMMReg

    assert cfg.model.stack_eval, "sp serving runs the stacked eval path"
    assert axis in mesh.shape, (axis, mesh.shape)
    n_dev = mesh.shape[axis]
    model = GMMReg(cfg=cfg.model, sp_axis=axis)

    def local_fn(src_loc, tgt_loc, src_full, tgt_full):
        return model.apply(variables, src_loc, tgt_loc, train=False,
                           is_test=is_test,
                           full_src=src_full, full_tgt=tgt_full)

    smapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(), P()),
        out_specs=(P(), P(), P(None, axis), P(None, axis), P()),
        # rot/trans/clu ARE replicated (they leave through psums), but the
        # collectives run inside flax apply where vma inference cannot see
        # through; skip the static check rather than fake a broadcast
        check_vma=False)

    @jax.jit
    def fn(src, tgt):
        if src.shape[1] % n_dev != 0:
            raise ValueError(
                f"point count {src.shape[1]} must divide by the mesh size "
                f"{n_dev} (pad the clouds — the data pipeline's fixed "
                f"n_points crop already guarantees static shapes)")
        if tgt.shape[1] != src.shape[1]:
            # fail HERE with full shapes — inside shard_map the model's
            # N==M overlap-head assert would fire with confusing
            # shard-local sizes
            raise ValueError(
                f"sp eval needs src and tgt with the same point count "
                f"(the stacked eval path and the N==M overlap head "
                f"require it); got src N={src.shape[1]}, "
                f"tgt N={tgt.shape[1]}")
        return smapped(src, tgt, src, tgt)

    return fn


def sp_eval(variables, cfg: Config, src, tgt, mesh: Optional[Mesh] = None,
            axis: str = "sp", is_test: bool = False):
    """One-shot convenience wrapper around `make_sp_eval`."""
    if mesh is None:
        mesh = sp_mesh(axis=axis)
    return make_sp_eval(variables, cfg, mesh, axis=axis, is_test=is_test)(
        src, tgt)
