"""Typed configuration system with the reference's two presets.

Replaces the reference argparse presets (configs/cfgs.py:12-65 `mnet`,
configs/cfgs.py:68-125 `indoor`) with frozen dataclasses: every field keeps
the same name and default so configs translate 1:1, plus TPU-specific knobs
(mesh shape, dtype policy) the reference has no analogue for.

All fields that shape traced computations (n_points, emb_dims, n_clusters,
km_clusters, gnn_k, num_heads, batch_size, sinkhorn/EM iteration counts) are
static — changing them recompiles, matching XLA's fixed-shape model.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference configs/cfgs.py:27-46)."""
    emb_dims: int = 512
    n_clusters: int = 128       # GMM components for the registration solve
    km_clusters: int = 128      # FPS anchors conditioning attention
    num_heads: int = 4
    gnn_k: int = 20             # DGCNN edge-conv neighbourhood
    pos_k: int = 5              # PositionEncoding neighbourhood (models/gmmreg.py:58-59)
    em_iters: int = 10          # wkeans_plus EM trips (lib/utils.py:279)
    sinkhorn_iters: int = 10    # inner Sinkhorn trips (lib/utils.py:281)
    tau: float = 1.0            # clustering temperature (lib/utils.py:269)
    softmax_temp: float = 0.05  # GMMSVD softmax temperature (models/dgcnn.py:108)
    is_sk: bool = False         # GMMSVD Sinkhorn vs softmax matching (models/gmmreg.py:41)
    overlap_radius: float = 0.035  # ICP voxel size at test time (configs/cfgs.py:24)
    icp_iters: int = 30         # fixed-trip ICP refinement
    # TPU-specific: recompute FPS anchors at each of the three attention
    # stages (reference behaviour, lib/utils.py:257-266 called 6x/forward) or
    # compute once and reuse (anchors depend only on xyz — faster, default).
    recompute_anchors: bool = False
    # compute dtype for the network body (geometry stays fp32)
    dtype: str = "float32"
    # eval-mode siamese stacking: run src/tgt through the per-cloud stages
    # as one (2B, N, .) batch — identical math per sample, half the serial
    # FPS/EM trips. Training defaults to per-cloud (reference BN batch-stats
    # parity: the reference updates stats once per cloud); stack_train=True
    # opts into stacked training, whose BN stats cover both clouds at once —
    # a documented divergence (sync-BN-style, not reference-exact).
    stack_eval: bool = True
    stack_train: bool = False
    # differentiable fused DGCNN training path (ops/dgcnn_train.py): same
    # math/params/stats as the naive composition, hand-scheduled fwd/bwd
    # Pallas kernels. None = DGCNN's auto rule; True/False force it.
    dgcnn_fused_train: bool | None = None
    # large-N fused DGCNN eval stage chain over the shared pre-gathered
    # graph (ops/pallas_dgcnn.py:dgcnn_edges_pallas — the indoor regime
    # where the whole-cloud fused kernel can't fire). None/False = off;
    # True = opt-in (needs eval + a supplied graph). Chip parity is gated
    # (verify_r5c) but no measured timing win at the indoor shape yet —
    # the naive stage chain is only ~4 ms of the 124 ms forward
    # (profiles/r3 2026_08_19), so this stays out of the default path per
    # the measure-before-keeping rule.
    dgcnn_fused_edges: bool | None = None
    # large-N self-graph in Morton-sorted "v-space" (ops/common.py:
    # knn_self_vspace): the kNN graph stays in sorted row order, the edge/
    # angle coordinate gather runs once in that space, and only the final
    # per-point features are un-sorted — skipping the sorted->original id
    # remap (14.1 ms of the 124 ms indoor eval forward, profiles/r3
    # 2026_08_19 trace). None/True = on wherever the shared graph engages
    # (identical math; off-TPU it degenerates to the original-order path);
    # False = the round-4 original-order routing (A/B control).
    dgcnn_vspace: bool | None = None
    # overlap head: stream the (N, M) similarity softmax (flash-style online
    # softmax, ops/pallas_stream.py:wproject_stream) instead of materialising
    # it. None = auto by size (B*N*M > 64Mi elements — the indoor ~35k regime
    # where the dense matrix would be ~4.9 GB, models/gmmreg.py:74-89).
    overlap_stream: bool | None = None
    # rematerialise the attention blocks + conv heads in the backward pass
    # (nn.remat): the train step is HBM-bandwidth-bound at ~100% of the
    # roofline while the MXU idles at 26% MFU (profiles/r3/PROFILE.md), so
    # recomputing the tail's activations instead of storing them trades idle
    # FLOPs for the bytes that actually bound the step. Opt-in pending an
    # on-chip A/B (repo rule: measure before keeping).
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset / augmentation knobs (reference configs/cfgs.py:14-24)."""
    root: str = "/data"
    dataset: str = "modelnet"   # modelnet|modelnetdv|modelnetcp|7scene|icl_nuim|synthetic
    n_points: int = 717
    trans_mag: float = 0.5
    rot_mag: float = 45.0
    unseen: bool = True
    partial: Tuple[float, float] = (0.70, 0.70)
    noise_type: str = "crop"    # clean | jitter | crop
    overlap_radius: float = 0.035
    num_workers: int = 6
    # Scene7/IclNuim only: use the TRUE target overlap labels instead of the
    # reference quirk tgt_overlap = src_overlap (realdata.py:127/187). Honoured
    # by BOTH the host label pass and the trainer's device_overlap recompute
    # (ADVICE r4: the two paths used to disagree when combined).
    fix_tgt_overlap: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / loop (reference configs/cfgs.py:48-58, train.py:200-202)."""
    batch_size: int = 24
    test_batch_size: int = 24
    epochs: int = 450
    lr: float = 1e-4
    weight_decay: float = 1e-4
    lr_milestones: Tuple[int, ...] = (75, 150, 200)
    lr_gamma: float = 0.1
    seed: int = 1234            # actually honoured here (reference's is dead, cfgs.py:58)
    # composite loss weights (train.py:69-71)
    w_dcp: float = 10.0
    w_clu: float = 1.0
    w_overlap: float = 1.0
    w_welsch: float = 0.01
    mu: float = 10.0            # Welsch alpha (cfgs.py:41)
    n_keypoints: int = 512      # Welsch top-k (cfgs.py:44)
    save_every: int = 50        # periodic checkpoint (train.py:97-99)
    # run the full dcp_metrics suite (2 chamfer 1-NN sweeps + pcab) every
    # k-th train step, loss-only otherwise. The reference computes them on
    # CPU every step (train.py:80-89) and only the epoch summary consumes
    # them; 1 = reference-faithful per-step metrics, >1 trims the measured
    # ~22% train-step tail (profiles/r2/PROFILE.md). Eval is never thinned.
    metrics_every: int = 1
    # full test-split eval every k-th epoch (reference: every epoch,
    # train.py:227-239 — the default). The final epoch always evaluates.
    # On a 1-core host the eval data pipeline costs about as much wall time
    # as a train epoch; long accuracy runs set k=5-10.
    eval_every: int = 1
    model_path: str = "checkpoints"
    # Compute the GT overlap labels ON DEVICE inside the jitted train/eval
    # steps (losses.py:overlap_labels_device — identical definition to the
    # host KD-tree labels) instead of in the dataset. At the indoor point
    # (N=35k) the host labels cost more wall time per sample than the whole
    # device step on a 1-core host; the 7scene/icl factory skips its host
    # label pass when this is set. The reference realdata quirk
    # (tgt_overlap = src_overlap, realdata.py:127) is preserved.
    device_overlap: bool = False
    # radius for device_overlap labels — matches each dataset's host value
    # (Scene7 0.05, IclNuim 0.075; train.py sets it with --device_overlap)
    overlap_thresh: float = 0.05
    # TPU execution
    mesh_shape: Tuple[int, ...] = (-1,)   # 1-D data-parallel mesh; -1 = all devices
    mesh_axes: Tuple[str, ...] = ("dp",)
    donate_state: bool = True


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    model_name: str = "GMMReg"  # GMMReg | DeepGMR

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def config_to_dict(cfg: Config) -> dict:
    """JSON-serialisable dict of the full config (round-trips through
    `config_from_dict`; persisted beside every checkpoint)."""
    return dataclasses.asdict(cfg)


def config_from_dict(d: dict) -> Config:
    """Rebuild a Config from `config_to_dict` output (JSON turns the tuple
    fields into lists — cast back)."""
    def detuple(v):
        return tuple(v) if isinstance(v, list) else v

    def build(cls, sub):
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: detuple(v) for k, v in sub.items() if k in known})

    return Config(
        model=build(ModelConfig, d["model"]),
        data=build(DataConfig, d["data"]),
        train=build(TrainConfig, d["train"]),
        model_name=d.get("model_name", "GMMReg"),
    )


def mnet(**overrides) -> Config:
    """ModelNet-family preset — reference configs/cfgs.py:12-65."""
    cfg = Config()
    return cfg.replace(**overrides) if overrides else cfg


def serve(**overrides) -> Config:
    """Latency-lean serving preset: mnet with the accuracy-neutral dials.

    The r3 dial sweeps against the trained checkpoint (RESULTS.md,
    scripts/eval_em_sweep.py) found exactly one safe serving dial:
    em_iters 10 -> 6 costs 0.002 recall (noise) and ~1.5-2 ms of the
    15 ms eval forward. ICP trips are load-bearing (recall decays
    monotonically below 30) and stay at 30. Training/eval parity presets
    keep the reference's 10x10 — this preset is for deployment only.
    """
    cfg = Config(model=ModelConfig(em_iters=6, dtype="bfloat16"))
    return cfg.replace(**overrides) if overrides else cfg


def indoor(**overrides) -> Config:
    """7-Scenes / ICL-NUIM preset — reference configs/cfgs.py:68-125."""
    cfg = Config(
        model=ModelConfig(n_clusters=16, km_clusters=16, overlap_radius=0.0375),
        data=DataConfig(dataset="7scene", n_points=50000, unseen=False,
                        overlap_radius=0.0375),
        train=TrainConfig(batch_size=8, test_batch_size=1, epochs=250, lr=1e-3,
                          n_keypoints=256),
    )
    return cfg.replace(**overrides) if overrides else cfg
