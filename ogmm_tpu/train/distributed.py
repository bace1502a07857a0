"""Multi-host initialisation — the DCN side of the distributed story.

The reference's entire distributed stack is single-process
`nn.DataParallel` (train.py:190-191, SURVEY.md §2.10). Here data
parallelism is a 1-D `jax.sharding.Mesh` whose gradient all-reduce XLA
compiles over ICI within a slice; spanning multiple hosts/slices only
requires `jax.distributed.initialize` before device queries — after which
`jax.devices()` returns the global device set and the same mesh/pjit code
shards across DCN automatically.

Call once at program start (train.py --multihost), before any jax device
use. On single-host runs it is a no-op.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger("ogmm_tpu")


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialise multi-host JAX if a multi-process environment is present.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or the
    TPU pod metadata jax.distributed discovers on Cloud TPU. Returns True
    if distributed mode was initialised.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    single_host = (coordinator_address is None and num_processes is None
                   and process_id is None
                   and "TPU_WORKER_HOSTNAMES" not in os.environ)
    if single_host:
        logger.info("single-host run; skipping jax.distributed.initialize")
        return False

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("jax.distributed initialised: process %d/%d, %d global devices",
                jax.process_index(), jax.process_count(),
                len(jax.devices()))
    return True


def shard_batch_for_process(batch, global_batch_size: int,
                            process_count: Optional[int] = None,
                            process_index: Optional[int] = None):
    """Slice a host-side batch to this process's shard (per-host data
    loading: each host feeds its own 1/process_count of the global batch).

    process_count/process_index default to the live jax values; they are
    explicit parameters so the slicing is unit-testable without a real
    multi-process run (tests/test_train.py simulates 2/4 processes).
    """
    import jax
    n = jax.process_count() if process_count is None else process_count
    if n == 1:
        return batch
    idx = jax.process_index() if process_index is None else process_index
    per = global_batch_size // n
    lo = idx * per
    return {k: v[lo:lo + per] for k, v in batch.items()}


def assemble_global_batch(batch, sharding,
                          process_count: Optional[int] = None,
                          process_index: Optional[int] = None):
    """Host batch -> globally-sharded device arrays, multi-host aware.

    Single process: a plain device_put onto the mesh sharding. Multi-host
    (jax.process_count() > 1): each process contributes only its own
    1/process_count row-slice of the global batch and the global array is
    assembled from process-local shards — the jax-native replacement for
    the reference's DataParallel scatter (train.py:190-191). The loaders
    stay deterministic across hosts (same seed -> same global batch), so
    slicing by process index partitions the batch exactly once.
    """
    import jax
    n = jax.process_count() if process_count is None else process_count
    if n == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    global_b = next(iter(batch.values())).shape[0]
    idx = jax.process_index() if process_index is None else process_index
    # Contract check: slicing by process index is only correct when the
    # sharding actually assigns this process the CONTIGUOUS row block
    # [idx*per, (idx+1)*per). make_array_from_process_local_data places
    # local_data into whatever rows this process's devices own — with a
    # device mesh whose ordering interleaves processes, shapes still match
    # and the batch would be silently permuted across hosts. Fail loudly
    # instead (a custom mesh needs loader slicing derived from
    # sharding.devices_indices_map, not process_index).
    sample = next(iter(batch.values()))
    imap = sharding.devices_indices_map((global_b,) + tuple(sample.shape[1:]))
    per = global_b // n
    owned = sorted(
        {r for d, ix in imap.items() if d.process_index == idx
         for r in range(*ix[0].indices(global_b))})
    expected = list(range(idx * per, (idx + 1) * per))
    if owned != expected:
        raise NotImplementedError(
            f"process {idx} owns rows {owned[:4]}..{owned[-1:]} under this "
            f"sharding, not the contiguous block {expected[0]}..{expected[-1]}"
            " assumed by per-host loader slicing; build the mesh with "
            "process-contiguous device order or slice the loader by "
            "sharding.devices_indices_map")
    local = shard_batch_for_process(batch, global_b, process_count=n,
                                    process_index=idx)
    import numpy as np
    return {
        k: jax.make_array_from_process_local_data(
            sharding, np.asarray(v), (global_b,) + tuple(v.shape[1:]))
        for k, v in local.items()
    }
