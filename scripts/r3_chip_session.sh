#!/bin/bash
# Round-3 consolidated chip session (run AFTER the long training job frees
# the chip — never two chip jobs at once, CLAUDE.md). Batches every queued
# chip experiment into one serial run; each step bounded by timeout.
#
#   bash scripts/r3_chip_session.sh [part]   # part: kernels | sweeps | all
#
# Logs to stdout (redirect to /tmp/r3_chip.log).
set -u
PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."
PART="${1:-all}"

step() {
  echo "=== [$(date +%H:%M:%S)] $1 ==="
}

if [ "$PART" = "kernels" ] || [ "$PART" = "all" ]; then
  step "verify surface 1: library ICP drive on chip"
  timeout 600 $PY - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from scipy.spatial.transform import Rotation
from ogmm_tpu.core import se3
from ogmm_tpu.ops import icp_point_to_point
rs = np.random.RandomState(7); B, N = 8, 717
src = rs.randn(B, N, 3).astype(np.float32) * 0.3
rot = Rotation.from_rotvec(rs.uniform(-.6,.6,(B,3))).as_matrix().astype(np.float32)
t = rs.uniform(-.5,.5,(B,3)).astype(np.float32)
tgt = (src @ rot.transpose(0,2,1) + t[:,None,:])[:, rs.permutation(N)]
drot = Rotation.from_rotvec(rs.uniform(-.1,.1,(B,3))).as_matrix().astype(np.float32)
init = se3.integrate(jnp.asarray(drot@rot), jnp.asarray(t))
Ri, Ti = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init, 0.07, max_iter=30)
rre = np.degrees(np.arccos(np.clip((np.einsum('bii->b', np.asarray(Ri).transpose(0,2,1)@rot)-1)/2,-1,1)))
print("RRE after refine:", rre)
assert float(np.max(rre)) < 1.0, rre
EOF

  step "verify surface 4: kernel parity on chip"
  timeout 600 $PY - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from ogmm_tpu.ops.common import knn, index_points
from ogmm_tpu.ops.fps import farthest_point_sample
from ogmm_tpu.ops.gmm import _em_jnp
from ogmm_tpu.ops.pallas_em import sinkhorn_em
rs = np.random.RandomState(0); B, N, K = 4, 717, 128
x = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
assert bool(jnp.mean((knn(x, x, 20, use_pallas=True)
                      == knn(x, x, 20, use_pallas=False)).astype(jnp.float32)) > 0.999)
o = jnp.asarray(rs.rand(B, N).astype(np.float32)); o = o / o.sum(-1, keepdims=True)
n0 = index_points(x, farthest_point_sample(x, K, is_center=True, use_pallas=False))
g1, m1, _ = sinkhorn_em(x, o, n0, iters=1, sk_iters=10)
g2, m2, _ = _em_jnp(x, o, n0, 1, 1.0)
assert float(jnp.abs(m1 - m2).max()) < 1e-3
assert float(jnp.abs(g1 - g2).mean()) < 1e-4
print("kernel parity OK")
EOF

  step "streamed-kernel A/Bs (spatial self-kNN + transposed 1-NN)"
  timeout 3000 $PY scripts/kernel_ab_stream.py

  step "grid-vs-stream ICP A/B (N=35000, cap sweep)"
  timeout 3000 $PY scripts/bench_grid_icp.py 35000 4

  step "indoor bench (N=35000, eval fwd + ICP)"
  timeout 3000 $PY scripts/bench_indoor.py 35000 4

  step "indoor FULL train step (N=35000)"
  timeout 1200 $PY scripts/train_step_indoor.py 35000

  step "mnet train-step A/B (naive / fused / fused+remat / stacked)"
  timeout 3000 $PY scripts/bench_train_fused.py
fi

if [ "$PART" = "sweeps" ] || [ "$PART" = "all" ]; then
  CKPT="${CKPT:-/tmp/ckpt_r3b}"
  step "EM-trip accuracy sweep against $CKPT"
  timeout 3600 $PY scripts/eval_em_sweep.py "$CKPT"

  step "ICP-trip accuracy sweep against $CKPT"
  timeout 3600 $PY scripts/eval_icp_sweep.py "$CKPT"

  step "final headline bench"
  timeout 1800 $PY bench.py
fi

step "done"
