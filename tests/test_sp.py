"""Sequence-parallel (point-sharded) serving: parity vs the unsharded model.

Runs on the conftest's virtual 8-device CPU mesh. The sp forward
(parallel/sp.py) must reproduce the single-device stacked eval forward —
same graph topology, same EM trajectory, same transforms — with only
collective-summation-order float noise. That is the whole contract: a user
sharding one 35k-point pair over a pod slice gets the SAME answer the
single-chip path computes, faster.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ogmm_tpu.configs import mnet
from ogmm_tpu.nn import GMMReg
from ogmm_tpu.parallel import make_sp_eval, sp_mesh


def _tiny_cfg(**model_overrides):
    cfg = mnet()
    model = dataclasses.replace(
        cfg.model, emb_dims=64, n_clusters=16, km_clusters=16, num_heads=2,
        gnn_k=8, pos_k=4, em_iters=3, sinkhorn_iters=5, icp_iters=3,
        **model_overrides)
    return cfg.replace(model=model)


def _pair(rng, B=2, N=256):
    src = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    return src, tgt


def _init(cfg, src, tgt):
    model = GMMReg(cfg=cfg.model)
    return model, model.init({'params': jax.random.PRNGKey(0)}, src, tgt,
                             train=False)


@pytest.mark.parametrize("is_test", [False, True])
def test_sp_matches_unsharded(rng, is_test):
    cfg = _tiny_cfg()
    src, tgt = _pair(rng)
    model, variables = _init(cfg, src, tgt)
    ref = model.apply(variables, src, tgt, train=False, is_test=is_test)

    fn = make_sp_eval(variables, cfg, sp_mesh(8), is_test=is_test)
    out = fn(src, tgt)

    # collective reductions reorder float sums; the EM/ICP iterations can
    # amplify the roundoff but not the topology (graphs/anchors/argmins are
    # integer-exact: xyz is replicated)
    for name, a, b, tol in zip(
            ("rot", "trans", "src_o", "tgt_o", "clu"), ref, out,
            (5e-5, 5e-5, 1e-4, 1e-4, 1e-3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=tol, err_msg=name)


def test_sp_bf16_body(rng):
    """The serving dtype (bf16 body) runs sharded and stays close to the
    unsharded bf16 forward (identical dtype policy, so only collective
    order differs — the fp32 geometry keeps transforms tight)."""
    cfg = _tiny_cfg(dtype="bfloat16")
    src, tgt = _pair(rng)
    model, variables = _init(cfg, src, tgt)
    ref = model.apply(variables, src, tgt, train=False)
    out = make_sp_eval(variables, cfg, sp_mesh(8))(src, tgt)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(out[2]),
                               atol=2e-2)


def test_sp_mesh_sizes(rng):
    """Sharding must not depend on a particular device count."""
    cfg = _tiny_cfg()
    src, tgt = _pair(rng, B=1, N=192)
    model, variables = _init(cfg, src, tgt)
    ref = np.asarray(model.apply(variables, src, tgt, train=False)[0])
    for n in (2, 4):
        out = make_sp_eval(variables, cfg, sp_mesh(n))(src, tgt)
        np.testing.assert_allclose(ref, np.asarray(out[0]), atol=5e-5)


def test_sp_rejects_undivisible_points(rng):
    cfg = _tiny_cfg()
    src, tgt = _pair(rng, B=1, N=250)   # 250 % 8 != 0
    _, variables = _init(cfg, *_pair(rng, B=1, N=256))
    with pytest.raises(ValueError, match="divide"):
        make_sp_eval(variables, cfg, sp_mesh(8))(src, tgt)


def test_sp_rejects_training():
    cfg = _tiny_cfg()
    model = GMMReg(cfg=cfg.model, sp_axis="sp")
    src = jnp.zeros((1, 64, 3))
    with pytest.raises(AssertionError, match="eval/serving"):
        model.init({'params': jax.random.PRNGKey(0)}, src, src, train=True,
                   full_src=src, full_tgt=src)


def test_registrar_sharded_matches_call(rng):
    """The serving API's sharded forward returns what __call__ returns."""
    from ogmm_tpu.api import Registrar
    cfg = _tiny_cfg()
    src, tgt = _pair(rng, B=1, N=128)
    reg = Registrar(cfg, example_n=128)
    ref = reg(src, tgt, refine=False)
    out = reg.sharded(mesh=sp_mesh(4), refine=False)(src, tgt)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# --- collective primitives --------------------------------------------------

def _smap(f, mesh, in_specs, out_specs):
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def test_index_points_sp(rng):
    from jax.sharding import PartitionSpec as P
    from ogmm_tpu.ops.common import index_points, index_points_sp
    mesh = sp_mesh(8)
    pts = jnp.asarray(rng.randn(2, 64, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 64, size=(2, 7)).astype(np.int32))
    out = _smap(lambda p, i: index_points_sp(p, i, "sp"), mesh,
                (P(None, "sp"), P()), P())(pts, idx)
    np.testing.assert_array_equal(np.asarray(index_points(pts, idx)),
                                  np.asarray(out))


def test_nn1_sp(rng):
    from jax.sharding import PartitionSpec as P
    from ogmm_tpu.ops.common import nn1, nn1_sp
    mesh = sp_mesh(8)
    q = jnp.asarray(rng.randn(2, 9, 3).astype(np.float32))
    t = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    d_ref, i_ref = nn1(q, t)
    d, i = _smap(lambda q_, t_: nn1_sp(q_, t_, "sp"), mesh,
                 (P(), P(None, "sp")), (P(), P()))(q, t)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d), rtol=1e-6)


def test_instance_norm_sp(rng):
    from jax.sharding import PartitionSpec as P
    from ogmm_tpu.nn.layers import instance_norm
    mesh = sp_mesh(8)
    x = jnp.asarray(rng.randn(3, 64, 16).astype(np.float32))
    ref = instance_norm(x)
    out = _smap(lambda v: instance_norm(v, axis_name="sp"), mesh,
                (P(None, "sp"),), P(None, "sp"))(x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_instance_norm_sp_large_n_large_mean(rng):
    """Indoor-regime moments: N=35k rows with a large common-mode offset.

    The sharded path computes var two-pass (psum mean, then psum the
    centred sum of squares) precisely so large-mean activations do not
    cancel catastrophically — pin the parity at realistic magnitudes."""
    from jax.sharding import PartitionSpec as P
    from ogmm_tpu.nn.layers import instance_norm
    mesh = sp_mesh(8)
    x = (rng.randn(1, 35000, 8).astype(np.float32)
         + 100.0 * np.abs(rng.randn(1, 1, 8)).astype(np.float32))
    x = jnp.asarray(x[:, :34992])           # divisible by 8
    ref = instance_norm(x)
    out = _smap(lambda v: instance_norm(v, axis_name="sp"), mesh,
                (P(None, "sp"),), P(None, "sp"))(x)
    # two-pass sharded: 3e-5 measured (mean-summation order only); the
    # single-pass E[x^2]-E[x]^2 form is 0.8% WRONG on variance here —
    # this atol is what the test pins against regressing to it
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-4)


def test_wkeans_forced_pallas_with_axis_name_raises(rng):
    """An explicit use_pallas=True must not be silently overridden by the
    sharded path (repo convention — DGCNN's fused/sync-BN guard)."""
    from ogmm_tpu.ops.gmm import wkeans_plus
    xyz = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 32, 8).astype(np.float32))
    o = jnp.asarray(np.abs(rng.rand(1, 32)).astype(np.float32))
    nodes = xyz[:, :4]
    with pytest.raises(ValueError, match="use_pallas"):
        wkeans_plus(xyz, feats, o, 4, use_pallas=True, init_nodes=nodes,
                    axis_name="sp")


def test_sp_rejects_mismatched_tgt_points(rng):
    cfg = _tiny_cfg()
    src, _ = _pair(rng, B=1, N=256)
    _, tgt = _pair(rng, B=1, N=128)
    _, variables = _init(cfg, *_pair(rng, B=1, N=256))
    with pytest.raises(ValueError, match="same point count"):
        make_sp_eval(variables, cfg, sp_mesh(8))(src, tgt)


def test_sinkhorn_sharded_rows(rng):
    from jax.sharding import PartitionSpec as P
    from ogmm_tpu.ops.sinkhorn import sinkhorn
    mesh = sp_mesh(8)
    cost = jnp.asarray(np.abs(rng.randn(2, 64, 16)).astype(np.float32))
    p = jax.nn.softmax(jnp.asarray(rng.randn(2, 64).astype(np.float32)))
    g_ref, l_ref = sinkhorn(cost, p=p, max_iter=8)
    g, l = _smap(
        lambda c, pp: sinkhorn(c, p=pp, max_iter=8, axis_name="sp"), mesh,
        (P(None, "sp"), P(None, "sp")), (P(None, "sp"), P()))(cost, p)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g), atol=1e-5)
    np.testing.assert_allclose(float(l_ref), float(l), rtol=1e-5)


def test_rigid_transform_sharded(rng):
    from jax.sharding import PartitionSpec as P
    from ogmm_tpu.core.procrustes import rigid_transform
    mesh = sp_mesh(8)
    src = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    corr = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    w = jnp.asarray(np.abs(rng.rand(2, 64)).astype(np.float32))
    r_ref, t_ref = rigid_transform(src, corr, w)
    r, t = _smap(
        lambda s, c, ww: rigid_transform(s, c, ww, axis_name="sp"), mesh,
        (P(None, "sp"), P(None, "sp"), P(None, "sp")), (P(), P()))(
            src, corr, w)
    np.testing.assert_allclose(np.asarray(r_ref), np.asarray(r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_ref), np.asarray(t), atol=1e-5)
