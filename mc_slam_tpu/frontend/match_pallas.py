"""Pallas TPU kernel: fused windowed Hamming top-2 matching.

The XLA path (matching.search_by_projection) materializes the (M, N) distance
matrix, the (M, N) window mask, and their combination in HBM — ~200 MB of
traffic for a 16k-point map against 1k features. This kernel fuses the int8
MXU dot, the window/level/validity gating, and the top-2 reduction in VMEM,
writing only (M,) outputs.

Layout: grid over M tiles; each program loads an (TM, 256) int8 query tile and
the full (N, 256) feature set (N <= 2048 fits VMEM comfortably), computes
dist = (256 - a.b)/2 on the MXU, applies the gates, and reduces best/second
/argbest along N.

Falls back to interpret mode off-TPU (tests compare it bit-for-bit against the
XLA formulation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 10_000  # plain int: jnp constants can't be captured inside pallas kernels


def _kernel(a_pm1, a_uv, a_lvl, a_valid, bT_pm1, b_uv, b_lvl, b_valid,
            radius, level_tol,
            best_ref, second_ref, idx_ref):
    # a tile: (TM, 256) int8; bT: (256, N) int8 pre-transposed into the
    # standard (m,k)@(k,n) form. precision must be DEFAULT explicitly: the
    # package sets jax_default_matmul_precision=highest for f32 estimation
    # math, and Mosaic rejects int8 matmuls at "highest" ("Bad lhs type").
    dot = jax.lax.dot_general(
        a_pm1[:], bT_pm1[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)                   # (TM, N)
    dist = (256 - dot) // 2

    du = jnp.abs(a_uv[:, 0:1] - b_uv[:, 0][None, :])           # (TM, N)
    dv = jnp.abs(a_uv[:, 1:2] - b_uv[:, 1][None, :])
    dl = jnp.abs(a_lvl[:, 0:1] - b_lvl[:, 0][None, :])
    r = radius[0, 0]
    lt = level_tol[0, 0]
    gate = (du < r) & (dv < r) & (dl <= lt)
    gate = gate & (a_valid[:, 0:1] > 0) & (b_valid[:, 0][None, :] > 0)
    d = jnp.where(gate, dist, BIG)

    # Mosaic lowers argmin only for f32 — use the encoded-key min instead:
    # key = d * NKEY + col; min(key) recovers (best, argbest) exactly since
    # distances tie-break toward the lowest column, matching jnp.argmin.
    n = d.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    nkey = 2048
    key = d * nkey + cols
    best_key = jnp.min(key, axis=1)
    best = best_key // nkey
    idx = best_key % nkey
    d2 = jnp.where(cols == idx[:, None], BIG, d)
    second = jnp.min(d2, axis=1)

    best_ref[:, 0] = best
    second_ref[:, 0] = second
    idx_ref[:, 0] = idx


@partial(jax.jit, static_argnames=("tile_m", "interpret"))
def hamming_top2_windowed(a_pm1, a_uv, a_lvl, a_valid,
                          b_pm1, b_uv, b_lvl, b_valid,
                          radius, level_tol=1.0, tile_m=512, interpret=False):
    """Fused windowed top-2 Hamming match.

    a_*: (M, ...) queries (map points: +/-1 int8 desc, predicted uv, level,
    validity); b_*: (N, ...) candidates (frame features). Returns
    (best (M,), second (M,), idx (M,)) int32 — BIG where nothing passed the gate.
    M must be a multiple of tile_m (pad with a_valid=0 rows).
    """
    M = a_pm1.shape[0]
    N = b_pm1.shape[0]
    assert M % tile_m == 0, (M, tile_m)
    f32 = jnp.float32
    args = (
        a_pm1,
        a_uv.astype(f32),
        a_lvl.astype(f32)[:, None],
        a_valid.astype(f32)[:, None],
        # barrier: stops XLA from feeding the custom call a lazily-transposed
        # (non-default-layout) operand, which Mosaic rejects as "Bad lhs type"
        jax.lax.optimization_barrier(b_pm1.T),
        b_uv.astype(f32),
        b_lvl.astype(f32)[:, None],
        b_valid.astype(f32)[:, None],
        jnp.full((1, 1), radius, f32),
        jnp.full((1, 1), level_tol, f32),
    )
    grid = (M // tile_m,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((M, 1), jnp.int32)] * 3,
        interpret=interpret,
    )(*args)
    best, second, idx = out
    return best[:, 0], second[:, 0], idx[:, 0]


def on_tpu():
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False
