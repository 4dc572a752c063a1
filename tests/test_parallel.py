"""Distributed Schur BA: sharded solve must equal the single-device solve on an
8-virtual-device CPU mesh (the driver's dryrun environment)."""
import jax
import jax.numpy as jnp
import numpy as np

from mc_slam_tpu.parallel import dist_ba
from mc_slam_tpu.solver import lm


def make_problem(rng, Nc=6, DC=6, Np=64, DP=3, obs_per_pt=4):
    O = Np * obs_per_pt
    cam = rng.integers(0, Nc, size=O).astype(np.int32)
    pt = np.repeat(np.arange(Np), obs_per_pt).astype(np.int32)  # sorted by pt
    Jc = rng.normal(size=(O, 1, 2, DC)).astype(np.float32)
    Jp = rng.normal(size=(O, 2, DP)).astype(np.float32)
    r = rng.normal(size=(O, 2)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, size=O).astype(np.float32)
    obs = lm.Observations(cam=jnp.asarray(cam)[:, None], pt=jnp.asarray(pt),
                          Jc=jnp.asarray(Jc), Jp=jnp.asarray(Jp),
                          r=jnp.asarray(r), w=jnp.asarray(w))
    return obs


def test_dist_matches_single(rng):
    Nc, DC, Np, DP = 6, 6, 64, 3
    obs = make_problem(rng, Nc, DC, Np, DP)
    free = jnp.ones(Nc, jnp.float32).at[0].set(0.0)
    ptm = jnp.ones(Np, jnp.float32)
    lam = 1e-3
    # single-device reference
    Hcc, g_c, Hpp, g_p, Wcp, _ = lm.build_landmark_system(obs, free, Nc, DC, Np, DP)
    dxc_ref, dxp_ref = lm.schur_solve(Hcc, g_c, Hpp, g_p, Wcp, lam, free, ptm)

    mesh = dist_ba.make_mesh(8)
    assert mesh.devices.size == 8
    cam_H = jnp.zeros((Nc, DC, Nc, DC))
    cam_g = jnp.zeros((Nc, DC))
    dxc, dxp = dist_ba.dist_schur_solve(mesh, obs, cam_H, cam_g, free, ptm,
                                        lam, Nc, DC, Np, DP)
    np.testing.assert_allclose(np.asarray(dxc), np.asarray(dxc_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxp_ref), atol=2e-4)


def test_dist_with_cam_factors(rng):
    """Replicated camera-only factors (an IMU-chain analog) add into the
    reduced system identically."""
    Nc, DC, Np, DP = 4, 6, 32, 3
    obs = make_problem(rng, Nc, DC, Np, DP)
    free = jnp.ones(Nc, jnp.float32).at[0].set(0.0)
    ptm = jnp.ones(Np, jnp.float32)
    # random SPD camera factor block
    A = rng.normal(size=(Nc * DC, Nc * DC)).astype(np.float32)
    Hc = (A @ A.T / 100).reshape(Nc, DC, Nc, DC)
    gc = rng.normal(size=(Nc, DC)).astype(np.float32)
    lam = 1e-3
    Hcc, g_c, Hpp, g_p, Wcp, _ = lm.build_landmark_system(obs, free, Nc, DC, Np, DP)
    dxc_ref, dxp_ref = lm.schur_solve(Hcc + jnp.asarray(Hc), g_c + jnp.asarray(gc),
                                      Hpp, g_p, Wcp, lam, free, ptm)
    mesh = dist_ba.make_mesh(8)
    dxc, dxp = dist_ba.dist_schur_solve(mesh, obs, jnp.asarray(Hc),
                                        jnp.asarray(gc), free, ptm, lam,
                                        Nc, DC, Np, DP)
    np.testing.assert_allclose(np.asarray(dxc), np.asarray(dxc_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxp_ref), atol=3e-4)
