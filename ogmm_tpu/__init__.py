"""ogmm_tpu — TPU-native overlap-guided GMM point-cloud registration.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of gfmei/ogmm
(OGMM, WACV 2023): DGCNN edge-conv features, anchor-conditioned transformer
overlap prediction, overlap-weighted Sinkhorn-EM GMM clustering, and a
weighted-Procrustes closed-form rigid solve — all fixed-shape, fully
on-device, sharded over a `jax.sharding.Mesh` for data parallelism.
"""

__version__ = "0.1.0"
