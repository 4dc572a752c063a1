"""Batched linear triangulation (Initializer::Triangulate, src/Initializer.cpp
and LocalMapping::CreateNewMapPoints' DLT, src/LocalMapping.cpp:1241).

All functions operate on normalized (ideal, undistorted, K-removed) image
coordinates and world-from-camera poses, batched over leading dims.
"""
from __future__ import annotations

import jax.numpy as jnp


def triangulate_two_view(Rwc0, Pwc0, Rwc1, Pwc1, xn0, xn1):
    """DLT triangulation of point pairs seen in two cameras.

    Rwc*, Pwc*: world-from-camera rotations/centers; xn*: (..., 2) normalized coords.
    Returns (Xw (...,3), depth0, depth1).
    """
    # camera projection P = [Rcw | -Rcw @ C]
    Rcw0 = jnp.swapaxes(Rwc0, -1, -2)
    Rcw1 = jnp.swapaxes(Rwc1, -1, -2)
    t0 = -(Rcw0 @ Pwc0[..., None])[..., 0]
    t1 = -(Rcw1 @ Pwc1[..., None])[..., 0]
    P0 = jnp.concatenate([Rcw0, t0[..., None]], axis=-1)   # (...,3,4)
    P1 = jnp.concatenate([Rcw1, t1[..., None]], axis=-1)

    def rows(P, xn):
        r0 = xn[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r1 = xn[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r0, r1

    a0, a1 = rows(P0, xn0)
    a2, a3 = rows(P1, xn1)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)               # (...,4,4)
    # null vector via SVD
    _, _, Vt = jnp.linalg.svd(A)
    Xh = Vt[..., 3, :]
    w = Xh[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12 * jnp.ones_like(w), w)
    Xw = Xh[..., :3] / w_safe[..., None]
    d0 = (Rcw0 @ Xw[..., None])[..., 2, 0] + t0[..., 2]
    d1 = (Rcw1 @ Xw[..., None])[..., 2, 0] + t1[..., 2]
    return Xw, d0, d1


def parallax_cos(Pwc0, Pwc1, Xw):
    """Cosine of the ray angle at the triangulated point (CheckRT's parallax,
    src/Initializer.cpp)."""
    r0 = Xw - Pwc0
    r1 = Xw - Pwc1
    n0 = jnp.linalg.norm(r0, axis=-1)
    n1 = jnp.linalg.norm(r1, axis=-1)
    return jnp.sum(r0 * r1, axis=-1) / jnp.maximum(n0 * n1, 1e-12)
