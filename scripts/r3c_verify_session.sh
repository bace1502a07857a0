#!/bin/bash
# Round-3c: /verify surfaces + re-runs of the two steps that failed in the
# r3 chip session (host-callback fix in ops/icp.py) + the spatial-kNN tile
# follow-up. Serial — one chip job at a time (CLAUDE.md).
set -u
PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

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
print("surface 1 OK")
EOF

step "verify surface 1b: grid auto-route ICP (M>4096, callback-free trace) on chip"
timeout 900 $PY - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from scipy.spatial.transform import Rotation
from ogmm_tpu.core import se3
from ogmm_tpu.ops import icp_point_to_point
rs = np.random.RandomState(11); B, N = 2, 8192
src = rs.randn(B, N, 3).astype(np.float32) * 0.3
rot = Rotation.from_rotvec(rs.uniform(-.4,.4,(B,3))).as_matrix().astype(np.float32)
t = rs.uniform(-.3,.3,(B,3)).astype(np.float32)
tgt = (src @ rot.transpose(0,2,1) + t[:,None,:])[:, rs.permutation(N)]
drot = Rotation.from_rotvec(rs.uniform(-.05,.05,(B,3))).as_matrix().astype(np.float32)
init = se3.integrate(jnp.asarray(drot@rot), jnp.asarray(t))
Ri, Ti = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init, 0.07, max_iter=15)
rre = np.degrees(np.arccos(np.clip((np.einsum('bii->b', np.asarray(Ri).transpose(0,2,1)@rot)-1)/2,-1,1)))
print("grid-route RRE after refine:", rre)
assert float(np.max(rre)) < 1.0, rre
print("surface 1b OK (grid path traces + runs on chip without host callback)")
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

step "verify surface 2: training CLI smoke on chip (loss descent)"
timeout 1200 $PY train.py --dataset synthetic --epochs 2 --batch_size 8 \
  --steps_per_epoch 6 --model_path /tmp/ckpt_r3c_smoke 2>&1 | tail -8

step "spatial-kNN tile follow-up A/B"
timeout 3000 $PY scripts/kernel_ab_stream.py

step "grid-vs-stream ICP A/B (N=35000) — re-run with callback fix"
timeout 3000 $PY scripts/bench_grid_icp.py 35000 4

step "indoor bench (N=35000) — re-run with tn128 spatial default"
timeout 3000 $PY scripts/bench_indoor.py 35000 4

step "weights-only export of the r3b best checkpoint (CPU)"
timeout 900 $PY - <<'EOF'
import jax
jax.config.update('jax_platforms', 'cpu')
from ogmm_tpu.api import Registrar
reg = Registrar.from_checkpoint('/tmp/ckpt_r3b')
reg.export_weights('artifacts/gmmreg_synth4096_r3.npz')
import os
print("exported:", os.path.getsize('artifacts/gmmreg_synth4096_r3.npz')/1e6, "MB")
r2 = Registrar.from_weights('artifacts/gmmreg_synth4096_r3.npz')
print("reload OK, cfg root:", r2.cfg.data.root)
EOF

step "verify surface 3: multichip dryrun (8-dev CPU mesh)"
timeout 1800 env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  $PY -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

step "full CPU test suite"
timeout 1800 $PY -m pytest tests/ -q 2>&1 | tail -5

step "done"
