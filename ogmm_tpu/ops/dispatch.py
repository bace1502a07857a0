"""Pallas-kernel dispatch switch.

The Pallas TPU kernels (pallas_knn/pallas_em/pallas_dgcnn/...) only compile
for a TPU backend; every op keeps a jnp fallback. The auto rule — "use
Pallas iff the default backend isn't CPU" — breaks when a process has the
TPU plugin registered but runs on an explicit CPU mesh (the multi-chip
dry-run, `xla_force_host_platform_device_count` tests): tracing happens for
CPU devices while `jax.default_backend()` still says tpu.

So the switch is explicit and process-global: `set_pallas(False)` before
tracing CPU-mesh programs (dryrun_multichip does this; the trainer sets it
from its mesh's device platform). `None` restores backend autodetection.
"""
from __future__ import annotations

from contextlib import contextmanager

import jax

_FORCE: bool | None = None


def set_pallas(enabled: bool | None) -> None:
    """Force Pallas kernels on/off; None = auto by default backend."""
    global _FORCE
    _FORCE = enabled


def use_pallas() -> bool:
    """Resolved at trace time by the ops' auto paths."""
    if _FORCE is not None:
        return _FORCE
    return jax.default_backend() not in ("cpu",)


@contextmanager
def pallas_override(enabled: bool | None):
    global _FORCE
    prev = _FORCE
    _FORCE = enabled
    try:
        yield
    finally:
        _FORCE = prev


# --------------------------------------------------------------------------
# Host debug callbacks (jax.debug.print and friends)
#
# A debug.print traced into a jitted program becomes a host send/recv
# callback: a hidden device->host sync point on real TPU, and an outright
# UNIMPLEMENTED error on PJRT transports without callback support (the axon
# tunnel this repo benches through). Serving programs must therefore never
# embed one by default; diagnostic prints (e.g. the ICP grid-cap saturation
# warning, ops/icp.py:_maybe_grid) are gated here and resolved at trace
# time, off unless a debugging run opts in.
# --------------------------------------------------------------------------

_DEBUG_CB: bool = False


def set_debug_callbacks(enabled: bool) -> None:
    """Opt in/out of tracing jax.debug host callbacks into jitted programs."""
    global _DEBUG_CB
    _DEBUG_CB = enabled


def debug_callbacks() -> bool:
    """Resolved at trace time by ops that carry diagnostic prints."""
    return _DEBUG_CB


@contextmanager
def debug_callbacks_override(enabled: bool):
    global _DEBUG_CB
    prev = _DEBUG_CB
    _DEBUG_CB = enabled
    try:
        yield
    finally:
        _DEBUG_CB = prev
