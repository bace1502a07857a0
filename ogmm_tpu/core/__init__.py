from ogmm_tpu.core import se3
from ogmm_tpu.core.procrustes import rigid_transform, rigid_transform_3x4

__all__ = ["se3", "rigid_transform", "rigid_transform_3x4"]
