#!/usr/bin/env python
"""Measure the PyTorch reference's forward throughput (baseline side).

Runs /root/reference's GMMReg.forward (train-mode: no Open3D ICP) on the
torch build available in this image (CPU — the reference's CUDA path needs
an NVIDIA GPU this TPU host doesn't have). Missing optional deps
(open3d, transforms3d) are stubbed: they are only touched by the is_test
branch and quaternion helpers, neither of which runs in this benchmark.

Writes the measured number to BASELINE_MEASURED.json for bench.py to pick up.
"""
import json
import os
import sys
import time
import types

import numpy as np

# --- stub modules the forward path never touches ---------------------------
o3d_stub = types.ModuleType("open3d")
sys.modules.setdefault("open3d", o3d_stub)
t3d = types.ModuleType("transforms3d")
t3d_q = types.ModuleType("transforms3d.quaternions")
t3d_q.mat2quat = lambda m: np.array([1.0, 0, 0, 0])
t3d_q.quat2mat = lambda q: np.eye(3)
t3d.quaternions = t3d_q
sys.modules.setdefault("transforms3d", t3d)
sys.modules.setdefault("transforms3d.quaternions", t3d_q)

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

# fair baseline: give torch every core on this host (the image defaults the
# interop setting to 1 thread)
torch.set_num_threads(os.cpu_count() or 1)


def main():
    from models.gmmreg import GMMReg  # reference code

    class Args:
        gnn_k = 20
        km_clusters = 128
        num_heads = 4
        overlap_radius = 0.035

    B, N = 24, 717
    torch.manual_seed(0)
    model = GMMReg(512, 128, Args()).eval()
    src = torch.randn(B, 3, N) * 0.3
    tgt = torch.randn(B, 3, N) * 0.3

    with torch.no_grad():
        t0 = time.perf_counter()
        model(src, tgt)           # warmup
        warm = time.perf_counter() - t0
        reps = max(1, int(3.0 / max(warm, 0.1)))
        t0 = time.perf_counter()
        for _ in range(reps):
            model(src, tgt)
        dt = (time.perf_counter() - t0) / reps

    pps = B / dt
    out = {
        "metric": "gmmreg_fwd_pairs_per_sec",
        "value": pps,
        "unit": "pairs/s",
        "hardware": f"torch-{torch.__version__} CPU ({torch.get_num_threads()} threads)",
        "batch": B, "n_points": N,
        "ms_per_batch": dt * 1e3,
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
