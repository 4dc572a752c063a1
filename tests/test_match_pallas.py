"""Pallas fused matcher: interpret-mode equality with the XLA formulation."""
import jax
import jax.numpy as jnp
import numpy as np

from mc_slam_tpu.frontend import match_pallas, matching
from mc_slam_tpu.frontend.orb import unpack_pm1


def test_kernel_matches_xla_path(rng):
    M, N = 2048, 512
    a = unpack_pm1(jnp.asarray(rng.integers(0, 2**32, (M, 8), dtype=np.uint32)))
    b = unpack_pm1(jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32)))
    a_uv = jnp.asarray(rng.uniform(0, 640, (M, 2)).astype(np.float32))
    b_uv = jnp.asarray(rng.uniform(0, 640, (N, 2)).astype(np.float32))
    a_lvl = jnp.asarray(rng.integers(0, 4, M), jnp.int32)
    b_lvl = jnp.asarray(rng.integers(0, 4, N), jnp.int32)
    a_v = jnp.asarray(rng.random(M) < 0.9)
    b_v = jnp.asarray(rng.random(N) < 0.9)
    radius = 60.0

    best, second, idx = match_pallas.hamming_top2_windowed(
        a, a_uv, a_lvl, a_v, b, b_uv, b_lvl, b_v, radius, interpret=True)

    dist = matching.hamming_matrix(a, b)
    gate = matching.window_mask(a_uv, b_uv, radius, a_lvl, b_lvl)
    gate = gate & a_v[:, None] & b_v[None, :]
    d = jnp.where(gate, dist, matching.BIG)
    best_ref = jnp.minimum(jnp.min(d, axis=1), match_pallas.BIG)
    idx_ref = jnp.argmin(d, axis=1)
    d2 = d.at[jnp.arange(M), idx_ref].set(matching.BIG)
    second_ref = jnp.minimum(jnp.min(d2, axis=1), match_pallas.BIG)

    np.testing.assert_array_equal(np.asarray(best), np.asarray(best_ref))
    has = np.asarray(best_ref) < match_pallas.BIG
    np.testing.assert_array_equal(np.asarray(idx)[has], np.asarray(idx_ref)[has])
    np.testing.assert_array_equal(np.asarray(second)[has],
                                  np.asarray(second_ref)[has])
