from ogmm_tpu.data.loader import PrefetchLoader, data_loader
from ogmm_tpu.data.modelnet import (ModelNetCP, ModelNetDV, ModelNetGMR,
                                    ModelNetHdf, SyntheticPointClouds,
                                    get_transforms)
from ogmm_tpu.data.realdata import IclNuim, Scene7

__all__ = [
    "PrefetchLoader", "data_loader", "ModelNetCP", "ModelNetDV", "ModelNetGMR",
    "ModelNetHdf", "SyntheticPointClouds", "get_transforms", "IclNuim", "Scene7",
]
