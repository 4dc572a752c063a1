"""Kidnapped-robot relocalization: track a sequence, blind the camera, resume
far from the dead-reckoned pose — BoW + PnP must re-acquire
(Tracking::Relocalization path, src/Tracking.cpp:2388)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_slam_tpu import lie
from mc_slam_tpu.camera import make_camera
from mc_slam_tpu.pipeline.system import SlamConfig, SlamSystem, OK, LOST

from render import DotWorld

CAM = make_camera(300.0, 300.0, 240.0, 180.0, width=480, height=360)


def pose(t):
    P = np.array([0.8 * np.sin(0.4 * t), 0.15 * np.sin(0.3 * t), 0.05 * t])
    R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.08 * np.sin(0.5 * t), 0.0],
                                           jnp.float32)))
    return P.astype(np.float32), R.astype(np.float32)


@pytest.mark.slow
def test_relocalization_after_kidnap(rng):
    world = DotWorld(rng)
    cfg = SlamConfig(max_kf=64, max_mp=2048, n_feat=384, n_levels=3,
                     min_init_matches=50)
    sys = SlamSystem(CAM, cfg)
    for i in range(30):
        t = i * 0.1
        P, R = pose(t)
        sys.track(world.render(R, P), t)
    assert sys.state == OK
    # kidnap: blind frames while "carrying" the camera back to t=0.4's pose
    for j in range(3):
        sys.track(np.full((360, 480), 40.0, np.float32), 3.0 + 0.1 * j)
    assert sys.state == LOST
    # drop the velocity/pose memory far from truth to force true relocalization
    sys.last_pose = (jnp.asarray([5.0, 5.0, -3.0]), jnp.eye(3))
    sys.velocity = (jnp.zeros(3), jnp.eye(3))
    P, R = pose(0.4)
    ok = sys.track(world.render(R, P), 3.4)
    assert ok and sys.state == OK, "relocalization failed"
    P_est = np.asarray(sys.last_pose[0])
    # the mono map lives at an arbitrary scale, so compare against the pose the
    # system itself estimated when it first visited t=0.4 (same map units)
    tr = sys.get_trajectory()
    P_then = next(np.asarray(p) for (tt, p, _) in tr if abs(tt - 0.4) < 1e-6)
    assert np.linalg.norm(P_est - P_then) < 0.05, (P_est, P_then)
