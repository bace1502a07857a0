#!/bin/bash
# Round-3h chip session: validate the sequence-parallel serving path on the
# real chip + re-confirm the tracked surfaces after the sp refactor
# (axis_name threading through sinkhorn/gmm/procrustes/icp/layers).
# ONE chip job at a time (CLAUDE.md tunnel rules); run with no other chip
# or CPU-heavy host job alive.
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3h_session.log}
{
  echo "=== r3h chip session $(date) ==="

  echo "--- [1/5] sp on-chip: parity + indoor shape ---"
  timeout 2400 python scripts/verify_sp_chip.py 35000

  echo "--- [2/5] library ICP drive (verify surface 1) ---"
  timeout 900 python - <<'EOF'
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
assert float(rre.max()) < 0.05, rre
print("library ICP drive OK")
EOF

  echo "--- [3/5] kernel parity (verify surface 4) ---"
  timeout 900 python - <<'EOF'
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

  echo "--- [4/5] tracked bench line ---"
  timeout 3600 python bench.py

  echo "--- [5/5] training CLI smoke (loss descent on chip) ---"
  timeout 1800 python train.py --dataset synthetic --epochs 1 --batch_size 8 \
    --steps_per_epoch 6 --model_path /tmp/ckpt_r3h 2>&1 | tail -12

  echo "=== r3h session done $(date) ==="
} > "$LOG" 2>&1
