"""Pinhole camera with radial-tangential distortion, batched.

Covers the reference's camera handling: intrinsics/distortion parsed from settings
(src/Tracking.cpp:537-607), keypoint undistortion (src/Frame.cpp:651) and the
projection math used throughout matching and optimization.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Camera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    width: int
    height: int

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx], -1),
            jnp.stack([z, self.fy, self.cy], -1),
            jnp.stack([z, z, o], -1),
        ], -2)


def make_camera(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
                width=752, height=480, dtype=jnp.float32) -> Camera:
    a = lambda v: jnp.asarray(v, dtype)
    return Camera(a(fx), a(fy), a(cx), a(cy), a(k1), a(k2), a(p1), a(p2), a(k3),
                  int(width), int(height))


def euroc_camera(dtype=jnp.float32) -> Camera:
    """EuRoC cam0 intrinsics as in the reference config (config/euroc.yaml:54-62)."""
    return make_camera(458.654, 457.296, 367.215, 248.375,
                       k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05,
                       width=752, height=480, dtype=dtype)


def distort(cam: Camera, xn):
    """Apply radtan distortion to normalized coords xn: (..., 2) -> (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xy = x * y
    xd = x * radial + 2.0 * cam.p1 * xy + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * xy
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: Camera, xd, iters: int = 8):
    """Invert radtan by fixed-point iteration (OpenCV-style), fixed trip count."""
    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        xy = x * y
        dx = 2.0 * cam.p1 * xy + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * xy
        return jnp.stack([(xd[..., 0] - dx) / radial, (xd[..., 1] - dy) / radial], axis=-1)
    return jax.lax.fori_loop(0, iters, body, xd)


def pixel_to_normalized(cam: Camera, uv):
    return jnp.stack([(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1)


def normalized_to_pixel(cam: Camera, xn):
    return jnp.stack([xn[..., 0] * cam.fx + cam.cx, xn[..., 1] * cam.fy + cam.cy], axis=-1)


from functools import partial


@partial(jax.jit, static_argnames=("iters",))
def undistort_points(cam: Camera, uv, iters: int = 8):
    """Undistort raw pixel keypoints -> ideal pixel coords
    (Frame::UndistortKeyPoints). Jitted at the top level: the eager
    fori_loop in undistort_normalized otherwise re-traces AND recompiles on
    every call (its body closure is a fresh function object each time),
    leaking one executable per frame."""
    return normalized_to_pixel(cam, undistort_normalized(cam, pixel_to_normalized(cam, uv), iters))


def project(cam: Camera, Xc, distortion: bool = False):
    """Project camera-frame points (..., 3) -> pixel (..., 2). z<=0 is caller's problem
    (use the returned z for masking)."""
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9 * jnp.ones_like(z), z)
    xn = Xc[..., :2] / z_safe[..., None]
    if distortion:
        xn = distort(cam, xn)
    return normalized_to_pixel(cam, xn), z


def backproject(cam: Camera, uv, depth):
    """Ideal pixel + depth -> camera-frame 3D point."""
    xn = pixel_to_normalized(cam, uv)
    return jnp.concatenate([xn * depth[..., None], depth[..., None]], axis=-1)


def project_jacobian(cam: Camera, Xc):
    """d(pixel)/d(Xc): (..., 2, 3) for the ideal pinhole model (no distortion),
    as used by all reference reprojection edges (src/IMU/g2otypes.cpp:390-398)."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9 * jnp.ones_like(z), z)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    zr = jnp.zeros_like(x)
    row0 = jnp.stack([cam.fx * inv_z, zr, -cam.fx * x * inv_z2], axis=-1)
    row1 = jnp.stack([zr, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
