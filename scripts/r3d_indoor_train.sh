#!/bin/bash
# Round-3d chip session: the first real TRAINING RUN at the indoor operating
# point — the Scene7 pipeline end-to-end (synthetic room fragments, zero
# egress: scripts/gen_indoor_fragments.py), n_points=50000 cropped to
# N=35,000 into GMMReg, K=16 clusters, streamed Pallas kernels.
#
# batch_size 4 (not the preset's 8): one v5e chip has 16 GB HBM and the
# training step's saved pre-BN edge tensors are ~0.72 GB/pair — B=8 is the
# 2-chip dp-mesh point, B=4 the single-chip one. Everything else is the
# indoor preset (lr 1e-3, MultiStep [75,150,200], n_keypoints 256).
#
# One chip job at a time; bounded by timeout; log to /tmp/r3d_train.log.
set -ex
cd "$(dirname "$0")/.."

[ -d /tmp/indoor_data/7scene/7-scenes-office ] || \
  python scripts/gen_indoor_fragments.py /tmp/indoor_data 20 8

timeout 7000 python train.py --preset indoor --dataset 7scene \
  --root /tmp/indoor_data --batch_size 4 --epochs 60 --eval_every 10 \
  --dtype bfloat16 \
  --model_path /tmp/ckpt_indoor_r3 \
  --export_weights artifacts/gmmreg_indoor_r3.npz

echo "R3D_DONE rc=$?"
