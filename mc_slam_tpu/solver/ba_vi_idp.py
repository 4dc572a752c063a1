"""Anchored inverse-depth VI window BA — LocalBAPRVIDP parity.

The reference's flagship back-end optimizer (Optimizer::LocalBAPRVIDP,
src/Optimizer.cpp:32): landmarks are 1-D inverse depths anchored to the pixel
ray of their reference keyframe (VertexIDP + EdgePRIDP, 4-vertex edges:
idp/anchor-PR/observer-PR/extrinsic). Here the extrinsic stays fixed (as the
reference effectively does via its huge prior) and each observation carries two
15-D camera blocks (anchor + observer) plus a 1-D landmark block — the generic
Schur engine (lm.build_landmark_system with K=2, DP=1) handles the rest.

Versus the XYZ form (`ba_vi.vi_ba`), inverse depth parameterizes distant points
better and shrinks the landmark system 3x.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mc_slam_tpu import lie
from mc_slam_tpu.camera import Camera
from mc_slam_tpu.imu.navstate import NavState
from mc_slam_tpu.solver import factors, lm
from mc_slam_tpu.solver.ba import CHI2_MONO
from mc_slam_tpu.solver.ba_vi import (DC, IMUEdges, PriorFactor,
                                      _imu_edge_factors, _prior_factor,
                                      retract_states)


class IDPObs(NamedTuple):
    """Padded anchored-inverse-depth observation table."""
    anchor: jnp.ndarray     # (O,) int32 anchor keyframe (local index)
    obs_kf: jnp.ndarray     # (O,) int32 observing keyframe (local index)
    pt: jnp.ndarray         # (O,) int32 landmark index (into rho)
    uv0: jnp.ndarray        # (O, 2) anchor-frame ideal pixel of the landmark
    uv: jnp.ndarray         # (O, 2) observed ideal pixel
    inv_sigma2: jnp.ndarray  # (O,)
    valid: jnp.ndarray      # (O,)


def _embed15(J6, cols=slice(0, 6)):
    pad = jnp.zeros(J6.shape[:-1] + (9,), J6.dtype)
    return jnp.concatenate([J6, pad], axis=-1)


@partial(jax.jit, static_argnames=("iters", "rtol", "two_phase"))
def vi_ba_idp(ns0: NavState, rho0, obs: IDPObs, edges: IMUEdges, camera: Camera,
              ext: factors.Extrinsics, gw, free_cam, pt_mask, iters: int = 10,
              huber_delta2: float = CHI2_MONO, lam0: float = 1e-4,
              rtol: float = 0.0, prior: PriorFactor | None = None,
              two_phase: bool = True):
    """Windowed VI BA over NavStates + anchored inverse depths.

    ns0: (Nc,...) NavStates; rho0 (Np,) inverse depths; obs references local
    keyframe indices. prior: optional 15-d prior on one keyframe (same role as
    in vi_ba — e.g. the bias anchor of a chain-break window front).
    Returns (ns, rho, chi2 (O,), cost)."""
    Nc = ns0.P.shape[0]
    Np = rho0.shape[0]
    DP = 1

    def per_obs(ns, rho):
        return factors.reproj_idp(
            camera, ext, rho[obs.pt], obs.uv0,
            ns.P[obs.anchor], ns.R[obs.anchor],
            ns.P[obs.obs_kf], ns.R[obs.obs_kf], obs.uv)

    def retract(x, dx):
        ns, rho = x
        dxc, drho = dx
        # the reference clamps inverse depth at 1e-6 (VertexIDP, g2otypes.h:40)
        return retract_states(ns, dxc), jnp.maximum(rho + drho, 1e-6)

    def make_fns(valid):
        def linearize(x):
            """ONE residual/Jacobian pass -> (normal-equation blocks, robust
            cost). The fused LM driver reuses it for both the step and the
            accept/reject decision (lm.lm_optimize_fused)."""
            ns, rho = x
            with jax.named_scope("idp_reproj"):
                r, J_rho, J_pr0, J_pri, z = per_obs(ns, rho)
            chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
            w = obs.inv_sigma2 * lm.trunc_huber_weight(chi2, huber_delta2) \
                * valid * (z > 1e-6)
            rr = lm.trunc_huber_cost(chi2, huber_delta2)
            rr = jnp.where(z > 1e-6, rr, lm.trunc_plateau(huber_delta2))
            cost = jnp.sum(valid * rr)
            # 6-d PR blocks (V/bias columns are zero for reprojection);
            # embedded into the 15-d VI system after assembly
            o = lm.Observations(
                cam=jnp.stack([obs.anchor, obs.obs_kf], axis=-1),
                pt=obs.pt,
                Jc=jnp.stack([J_pr0, J_pri], axis=1),
                Jp=J_rho, r=r, w=w)
            with jax.named_scope("idp_build"):
                Hcc6, g6, Hpp, g_p, Wcp6, _ = lm.build_landmark_system(
                    o, free_cam, Nc, 6, Np, DP)
            H = jnp.zeros((Nc, DC, Nc, DC), r.dtype)
            g = jnp.zeros((Nc, DC), r.dtype)
            prv, bias = _imu_edge_factors(ns, edges, gw)
            cost = cost + jnp.sum(
                prv.w * jnp.einsum('er,ers,es->e', prv.r, prv.info, prv.r))
            cost = cost + jnp.sum(
                bias.w * jnp.einsum('er,ers,es->e', bias.r, bias.info, bias.r))
            H, g, _ = lm.accumulate_cam_factors(H, g, jnp.zeros((), r.dtype), prv, free_cam)
            H, g, _ = lm.accumulate_cam_factors(H, g, jnp.zeros((), r.dtype), bias, free_cam)
            if prior is not None:
                pf = _prior_factor(ns, prior)
                cost = cost + jnp.sum(
                    pf.w * jnp.einsum('er,ers,es->e', pf.r, pf.info, pf.r))
                H, g, _ = lm.accumulate_cam_factors(
                    H, g, jnp.zeros((), r.dtype), pf, free_cam)
            H = H.at[:, :6, :, :6].add(Hcc6)
            g = g.at[:, :6].add(g6)
            return (H, g, Hpp, g_p, Wcp6), cost

        def solve(lin, lam):
            H, g, Hpp, g_p, Wcp6 = lin
            with jax.named_scope("idp_schur"):
                dxc, dxp = lm.schur_solve_pr(H, g, Hpp, g_p, Wcp6, lam,
                                             free_cam, pt_mask)
            return dxc, dxp[:, 0]

        return linearize, solve

    def classify(x, valid0):
        ns, rho = x
        r, _, _, _, z = per_obs(ns, rho)
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        return valid0 * ((chi2 <= huber_delta2) & (z > 1e-6)).astype(valid0.dtype)

    # two-round protocol on the fused driver (lm_two_phase's structure with
    # lm_optimize_fused's one-pass iterations); rtol>0 = abortable-BA mode
    # (mbAbortBA): single round WITH early exit, matching lm_two_phase's
    # `not enable or rtol > 0` routing (ADVICE r4: previously the rtol branch
    # silently dropped the early exit too)
    if two_phase and rtol == 0.0:
        it1 = max(2, int(round(iters * 0.4)))
        it2 = max(2, iters - it1)
        lin1, sol1 = make_fns(obs.valid)
        x1, _, _ = lm.lm_optimize_fused((ns0, rho0), lin1, sol1, retract,
                                        it1, lam0=lam0)
        valid2 = classify(x1, obs.valid)
        lin2, sol2 = make_fns(valid2)
        (ns, rho), cost, _ = lm.lm_optimize_fused(x1, lin2, sol2, retract,
                                                  it2, lam0=lam0)
    else:
        lin1, sol1 = make_fns(obs.valid)
        (ns, rho), cost, _ = lm.lm_optimize_fused((ns0, rho0), lin1, sol1,
                                                  retract, iters, lam0=lam0,
                                                  rtol=rtol)
    ns = ns._replace(R=lie.so3_normalize_fast(ns.R))
    r, _, _, _, z = per_obs(ns, rho)
    chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    chi2 = jnp.where(z > 0, chi2, jnp.full_like(chi2, 1e9))
    return ns, rho, chi2, cost


def xyz_to_idp(pts_w, anchor_P, anchor_R, anchor_uv_ideal, cam: Camera,
               ext: factors.Extrinsics):
    """Convert world landmarks to anchored inverse depth w.r.t. their anchor
    keyframe camera: rho = 1/depth along the anchor ray."""
    RwbT = jnp.swapaxes(anchor_R, -1, -2)
    Pb = (RwbT @ (pts_w - anchor_P)[..., None])[..., 0]
    Pc = (ext.Rcb @ Pb[..., None])[..., 0] + ext.tcb
    return 1.0 / jnp.maximum(Pc[..., 2], 1e-6)


def idp_to_xyz(rho, uv0, anchor_P, anchor_R, cam: Camera, ext: factors.Extrinsics):
    """Anchored inverse depth back to world coordinates."""
    d = 1.0 / jnp.maximum(rho, 1e-6)
    xn = jnp.stack([(uv0[..., 0] - cam.cx) / cam.fx,
                    (uv0[..., 1] - cam.cy) / cam.fy], -1)
    Pc = jnp.concatenate([xn * d[..., None], d[..., None]], axis=-1)
    Rbc = jnp.swapaxes(ext.Rcb, -1, -2)
    Pb = (Rbc @ (Pc - ext.tcb)[..., None])[..., 0]
    return (anchor_R @ Pb[..., None])[..., 0] + anchor_P
