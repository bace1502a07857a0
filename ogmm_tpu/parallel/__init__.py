"""Parallelism beyond the data-parallel trainer mesh.

`sp` — sequence-parallel (point-sharded) serving: one large-N registration
pair cooperatively computed across a device mesh (the axis the reference's
DataParallel cannot express at its own indoor batch-1 operating point).
"""
from ogmm_tpu.parallel.sp import make_sp_eval, sp_eval, sp_mesh

__all__ = ["make_sp_eval", "sp_eval", "sp_mesh"]
