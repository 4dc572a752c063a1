"""Oriented BRIEF descriptors: IC-angle orientation + steered binary tests.

Replaces IC_Angle (src/ORBextractor.cpp:79) and computeOrbDescriptor (:111).
The 256 sampling pairs are a deterministic learned-free Gaussian pattern
generated at module load (NOT the OpenCV bit_pattern_31_ table — descriptors
here only ever match against descriptors from this same extractor, so a
fresh pattern with the same statistics is equivalent and keeps this
implementation fully from-scratch).

Descriptors are packed 256-bit words as (N, 8) uint32. An unpacked +/-1 int8
form (N, 256) is produced on demand for MXU Hamming matmuls (matching.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PATCH_R = 15          # orientation patch radius (31x31), as the reference
BRIEF_R = 13          # max test-point radius so rotated points stay in 31x31


def _make_pattern(seed=42, n=256, sigma=5.2, rmax=BRIEF_R):
    """(n, 4) int8 pattern [x1, y1, x2, y2], Gaussian-distributed, clipped."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, sigma, size=(n, 4))
    pts = np.clip(np.round(pts), -rmax, rmax)
    # avoid degenerate identical pairs
    same = (pts[:, 0] == pts[:, 2]) & (pts[:, 1] == pts[:, 3])
    pts[same, 2] = np.clip(pts[same, 2] + 1, -rmax, rmax)
    return pts.astype(np.float32)


PATTERN = jnp.asarray(_make_pattern())          # (256, 4)

# circular-patch row half-widths for IC angle (u_max table, ORBextractor.cc:58-76)
_UMAX = np.zeros(PATCH_R + 1, np.int32)
for _v in range(PATCH_R + 1):
    _UMAX[_v] = int(np.floor(np.sqrt(PATCH_R * PATCH_R - _v * _v) + 0.5))
UMAX = jnp.asarray(_UMAX)


def _gather_patches(img, xy, r):
    """Gather (K, 2r+1, 2r+1) patches centered at integer xy (K,2) [x,y]."""
    H, W = img.shape
    d = jnp.arange(-r, r + 1)
    yy = jnp.clip(xy[:, 1][:, None] + d[None, :], 0, H - 1)        # (K, 2r+1)
    xx = jnp.clip(xy[:, 0][:, None] + d[None, :], 0, W - 1)        # (K, 2r+1)
    return img[yy[:, :, None], xx[:, None, :]]                      # (K, 2r+1, 2r+1)


def ic_angle(img, xy):
    """Intensity-centroid orientation for keypoints xy (K,2) int. Returns (K,) rad.

    Circular patch of radius 15 (same shape as the reference's u_max table).
    """
    K = xy.shape[0]
    patches = _gather_patches(img, xy, PATCH_R)                     # (K, 31, 31)
    d = jnp.arange(-PATCH_R, PATCH_R + 1, dtype=img.dtype)
    # circular mask from the u_max table
    vv = jnp.abs(jnp.arange(-PATCH_R, PATCH_R + 1))
    umax_v = UMAX[vv]                                               # (31,) per-row half width
    mask = (jnp.abs(d)[None, :] <= umax_v[:, None]).astype(img.dtype)  # (31,31) [row=y]
    m10 = jnp.einsum('kij,j,ij->k', patches, d, mask)
    m01 = jnp.einsum('kij,i,ij->k', patches, d, mask)
    return jnp.arctan2(m01, m10)


def brief_descriptors(img_blur, xy, angle):
    """Steered BRIEF. img_blur: blurred level image; xy (K,2) int; angle (K,).

    Returns packed (K, 8) uint32 descriptors. Sampling is nearest-neighbor on
    rotated integer offsets (as the reference, src/ORBextractor.cpp:124-136).
    """
    H, W = img_blur.shape
    ca, sa = jnp.cos(angle), jnp.sin(angle)                         # (K,)
    px1, py1, px2, py2 = PATTERN[:, 0], PATTERN[:, 1], PATTERN[:, 2], PATTERN[:, 3]

    def rot(px, py):
        # rotated offsets, rounded to nearest int
        rx = jnp.round(ca[:, None] * px[None, :] - sa[:, None] * py[None, :]).astype(jnp.int32)
        ry = jnp.round(sa[:, None] * px[None, :] + ca[:, None] * py[None, :]).astype(jnp.int32)
        return rx, ry

    r1x, r1y = rot(px1, py1)
    r2x, r2y = rot(px2, py2)
    gx1 = jnp.clip(xy[:, 0:1] + r1x, 0, W - 1)
    gy1 = jnp.clip(xy[:, 1:2] + r1y, 0, H - 1)
    gx2 = jnp.clip(xy[:, 0:1] + r2x, 0, W - 1)
    gy2 = jnp.clip(xy[:, 1:2] + r2y, 0, H - 1)
    i1 = img_blur[gy1, gx1]                                         # (K, 256)
    i2 = img_blur[gy2, gx2]
    bits = (i1 < i2).astype(jnp.uint32)                             # (K, 256)
    # pack 256 bits -> 8 uint32 words
    shifts = (jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=-1)
    return words.astype(jnp.uint32)


def unpack_pm1(desc_packed):
    """(N, 8) uint32 -> (N, 256) int8 in {-1, +1} for MXU Hamming matmuls."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc_packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    b = bits.reshape(desc_packed.shape[0], 256).astype(jnp.int8)
    return b * 2 - 1
