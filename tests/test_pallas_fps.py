"""Pallas FPS kernel vs the jnp fori_loop reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from ogmm_tpu.ops.fps import farthest_point_sample
from ogmm_tpu.ops.pallas_fps import fps_pallas


def test_fps_pallas_center_matches_jnp(rng):
    xyz = jnp.asarray(rng.randn(3, 120, 3).astype(np.float32))
    ref = farthest_point_sample(xyz, 16, is_center=True, use_pallas=False)
    out = fps_pallas(xyz, 16, is_center=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fps_pallas_random_start_matches_jnp(rng):
    xyz = jnp.asarray(rng.randn(2, 90, 3).astype(np.float32))
    key = jax.random.PRNGKey(7)
    ref = farthest_point_sample(xyz, 12, is_center=False, key=key,
                                use_pallas=False)
    start = jax.random.randint(key, (2,), 0, 90, dtype=jnp.int32)
    out = fps_pallas(xyz, 12, is_center=False, start=start, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fps_pallas_indices_are_spread(rng):
    # FPS never repeats an index while npoint < N
    xyz = jnp.asarray(rng.randn(1, 200, 3).astype(np.float32))
    out = np.asarray(fps_pallas(xyz, 32, is_center=True, interpret=True))[0]
    assert len(np.unique(out)) == 32
