"""Round-3 verify session A: chip-compile + parity of the M-streamed kernels
plus the standing library-surface checks (.claude/skills/verify).

One process, one chip job (CLAUDE.md tunnel protocol). Everything asserts;
prints PASS lines as it goes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

assert jax.devices()[0].platform == "tpu", jax.devices()

# ---- surface 1: library ICP refine ---------------------------------------
from scipy.spatial.transform import Rotation
from ogmm_tpu.core import se3
from ogmm_tpu.ops import icp_point_to_point

rs = np.random.RandomState(7)
B, N = 8, 717
src = rs.randn(B, N, 3).astype(np.float32) * 0.3
rot = Rotation.from_rotvec(rs.uniform(-.6, .6, (B, 3))).as_matrix().astype(np.float32)
t = rs.uniform(-.5, .5, (B, 3)).astype(np.float32)
tgt = (src @ rot.transpose(0, 2, 1) + t[:, None, :])[:, rs.permutation(N)]
drot = Rotation.from_rotvec(rs.uniform(-.1, .1, (B, 3))).as_matrix().astype(np.float32)
init = se3.integrate(jnp.asarray(drot @ rot), jnp.asarray(t))
Ri, Ti = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), init, 0.07,
                            max_iter=30)
rre = np.degrees(np.arccos(np.clip(
    (np.einsum('bii->b', np.asarray(Ri).transpose(0, 2, 1) @ rot) - 1) / 2,
    -1, 1)))
assert float(rre.max()) < 0.5, rre
print("PASS icp refine, max RRE", float(rre.max()), flush=True)

# ---- surface 4: standing kernel parity -----------------------------------
from ogmm_tpu.ops.common import knn, index_points
from ogmm_tpu.ops.fps import farthest_point_sample
from ogmm_tpu.ops.gmm import _em_jnp
from ogmm_tpu.ops.pallas_em import sinkhorn_em

rs = np.random.RandomState(0)
B, N, K = 4, 717, 128
x = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
agree = jnp.mean((knn(x, x, 20, use_pallas=True)
                  == knn(x, x, 20, use_pallas=False)).astype(jnp.float32))
assert float(agree) > 0.999, float(agree)
o = jnp.asarray(rs.rand(B, N).astype(np.float32))
o = o / o.sum(-1, keepdims=True)
n0 = index_points(x, farthest_point_sample(x, K, is_center=True,
                                           use_pallas=False))
g1, m1, _ = sinkhorn_em(x, o, n0, iters=1, sk_iters=10)
g2, m2, _ = _em_jnp(x, o, n0, 1, 1.0)
assert float(jnp.abs(m1 - m2).max()) < 1e-3
assert float(jnp.abs(g1 - g2).mean()) < 1e-4
print("PASS standing kernel parity (knn/EM)", flush=True)

# ---- NEW: M-streamed kernels compiled on chip ----------------------------
from ogmm_tpu.ops.common import square_distance
from ogmm_tpu.ops.pallas_stream import knn_stream, nn1_stream, wproject_stream

rs = np.random.RandomState(3)
B, Nq, M = 2, 1024, 6000          # several 2048-tiles + ragged tail
sq = rs.randn(B, Nq, 3).astype(np.float32)
tg = rs.randn(B, M, 3).astype(np.float32)
tg[:, 5000] = tg[:, 17]           # cross-tile exact tie
sqj, tgj = jnp.asarray(sq), jnp.asarray(tg)

dm = square_distance(sqj, tgj)
ref_i = jnp.argmin(dm, axis=-1)
ref_d = jnp.min(dm, axis=-1)
d1, i1 = nn1_stream(sqj, tgj)
assert int(jnp.sum(i1 != ref_i)) == 0, int(jnp.sum(i1 != ref_i))
assert float(jnp.abs(d1 - ref_d).max()) < 1e-5
print("PASS nn1_stream on chip (M=6000)", flush=True)

ref_k = jax.lax.top_k(-dm, 20)[1]
k1 = knn_stream(sqj, tgj, 20)
frac = float(jnp.mean((k1 == ref_k).astype(jnp.float32)))
assert frac > 0.999, frac       # reduced-precision XLA ref can flip ties
print("PASS knn_stream on chip (M=6000), agree", frac, flush=True)

D = 512
qf = jnp.asarray(rs.randn(B, Nq, D).astype(np.float32))
kf = jnp.asarray(rs.randn(B, M, D).astype(np.float32))
vv = jnp.asarray(rs.randn(B, M, 1).astype(np.float32))
# DEFAULT precision on both sides: the model's dense einsum
# (nn/gmmreg.py overlap head) carries no precision override, so the MXU
# feeds bf16-rounded operands there exactly as in the kernel — parity is
# against the semantics the model actually has
sim = jnp.einsum('bnd,bmd->bnm', qf, kf,
                 preferred_element_type=jnp.float32)
ref_w = jnp.einsum('bnm,bmd->bnd', jax.nn.softmax(sim, axis=-1), vv)
w1 = wproject_stream(qf, kf, vv)
err = float(jnp.abs(w1 - ref_w).max())
assert err < 5e-3, err
print("PASS wproject_stream on chip (M=6000), max err", err, flush=True)

# ---- router: large-M eval fwd of GMMReg (indoor-style, mid size) ---------
import dataclasses
from ogmm_tpu.configs import indoor
from ogmm_tpu.nn import GMMReg

cfg = indoor().model                       # K=16, emb 512
cfg = dataclasses.replace(cfg, dtype="bfloat16", overlap_stream=True)
Bi, Ni = 1, 8192
si = jnp.asarray(rs.randn(Bi, Ni, 3).astype(np.float32) * 0.3)
ti = jnp.asarray(rs.randn(Bi, Ni, 3).astype(np.float32) * 0.3)
model = GMMReg(cfg=cfg)
variables = model.init({'params': jax.random.PRNGKey(0)}, si, ti, train=False)
out = jax.jit(lambda v, s, t: model.apply(v, s, t, train=False))(
    variables, si, ti)
rot_o = np.asarray(out[0])
assert np.all(np.isfinite(rot_o)), "non-finite rotation at N=8192"
assert np.all(np.isfinite(np.asarray(out[2]))), "non-finite overlap"
print("PASS GMMReg eval fwd N=8192 streamed overlap (finite outputs)",
      flush=True)
print("ALL PASS", flush=True)
