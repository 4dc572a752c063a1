"""Batched RANSAC PnP for relocalization.

Replaces PnPsolver (src/PnPsolver.cpp, EPnP-in-RANSAC). TPU-native scheme:
all hypotheses at once — random 6-point minimal sets solved by the normalized
DLT (12-dim nullspace -> projection matrix -> polar-decomposed R, t), scored by
reprojection inliers over the full 2D-3D match set in one (B, N) pass; the best
hypothesis is refined by the caller with solver.ba.pose_only_visual (which
plays the role of the reference's internal EPnP Gauss-Newton refinement).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _dlt_pnp(Xw, xn, w=None):
    """P from >=6 points. Xw (B, M, 3), xn (B, M, 2) normalized coords,
    w optional (B, M) row weights (0 rows drop out of the LS problem).
    Returns (R (B,3,3) cam-from-world, t (B,3)) with unit-determinant R."""
    B, M, _ = Xw.shape
    o = jnp.zeros((B, M), Xw.dtype)
    l = jnp.ones((B, M), Xw.dtype)
    X, Y, Z = Xw[..., 0], Xw[..., 1], Xw[..., 2]
    u, v = xn[..., 0], xn[..., 1]
    r1 = jnp.stack([X, Y, Z, l, o, o, o, o, -u * X, -u * Y, -u * Z, -u], axis=-1)
    r2 = jnp.stack([o, o, o, o, X, Y, Z, l, -v * X, -v * Y, -v * Z, -v], axis=-1)
    if w is not None:
        r1 = r1 * w[..., None]
        r2 = r2 * w[..., None]
    A = jnp.concatenate([r1, r2], axis=-2)                   # (B, 2M, 12)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[..., 11, :].reshape(B, 3, 4)
    # P is up to a signed scale; normalize so det(P[:, :3]) > 0 and ||rows|| ~ 1,
    # then polar-decompose onto SO(3)
    Rr = P[..., :3]
    sgn = jnp.sign(jnp.linalg.det(Rr))
    sgn = jnp.where(sgn == 0, jnp.ones_like(sgn), sgn)
    U, S, Vt2 = jnp.linalg.svd(Rr * sgn[..., None, None])
    scale = jnp.maximum(jnp.mean(S, axis=-1), 1e-12)
    R = U @ Vt2
    t = sgn[..., None] * P[..., 3] / scale[..., None]
    return R, t


class PnPResult(NamedTuple):
    ok: jnp.ndarray       # () bool
    R_cw: jnp.ndarray     # (3,3)
    t_cw: jnp.ndarray     # (3,)
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("n_iters",))
def pnp_ransac(key, Xw, xn, w, focal, n_iters: int = 256, th_px: float = 5.991,
               min_inliers: int = 10):
    """Xw (N,3) world points, xn (N,2) normalized obs, w (N,) validity.

    th_px: squared-pixel inlier gate (chi2-style, scaled by focal internally).
    """
    N = Xw.shape[0]
    probs = w / jnp.maximum(jnp.sum(w), 1.0)
    idx = jax.random.categorical(
        key, jnp.log(jnp.maximum(probs, 1e-12))[None, :].repeat(n_iters * 6, 0)
    ).reshape(n_iters, 6)
    R, t = _dlt_pnp(Xw[idx], xn[idx])                        # (B,3,3), (B,3)

    def score(R, t):
        Xc = jnp.einsum('bij,nj->bni', R, Xw) + t[:, None, :]
        z = Xc[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9 * jnp.ones_like(z), z)
        proj = Xc[..., :2] / z_safe[..., None]
        e = jnp.sum((proj - xn[None]) ** 2, axis=-1) * (focal * focal)
        inl = (e < th_px) & (z > 0) & (w[None] > 0)
        return inl, jnp.sum(inl, axis=-1)

    # score all hypotheses on all points
    inl, n_inl = score(R, t)
    b = jnp.argmax(n_inl)

    # local optimization (LO-RANSAC): refit a weighted DLT on the best
    # hypothesis's FULL inlier set (rows of non-inliers zeroed -> they drop
    # out of the nullspace problem), rescore, and keep whichever is better.
    # The reference gets the same effect from EPnP's internal Gauss-Newton
    # refinement on the inlier set (PnPsolver.cpp compute_pose + RANSAC
    # refine); for near-threshold candidate sets this reliably lifts the
    # count past the acceptance bar where a minimal 6-point fit jitters.
    win = inl[b].astype(Xw.dtype)
    R2, t2 = _dlt_pnp(Xw[None], xn[None], win[None])
    inl2, n_inl2 = score(R2, t2)
    better = n_inl2[0] > n_inl[b]
    R_best = jnp.where(better, R2[0], R[b])
    t_best = jnp.where(better, t2[0], t[b])
    inl_best = jnp.where(better, inl2[0], inl[b])
    n_best = jnp.maximum(n_inl2[0], n_inl[b])
    ok = n_best >= min_inliers
    return PnPResult(ok=ok, R_cw=R_best, t_cw=t_best, inliers=inl_best,
                     n_inliers=n_best)
