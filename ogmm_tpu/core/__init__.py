from ogmm_tpu.core import se3
from ogmm_tpu.core import metrics
from ogmm_tpu.core.procrustes import (horn_rotation, rigid_transform,
                                      rigid_transform_3x4)

__all__ = ["se3", "metrics", "horn_rotation", "rigid_transform",
           "rigid_transform_3x4"]
