"""Full ORB extraction: pyramid -> grid FAST -> orientation -> steered BRIEF.

Replaces ORBextractor::operator() (src/ORBextractor.cpp:1064-1130). Output is a
fixed-size padded keypoint table across all levels, with per-level feature
quotas proportional to inverse scale area (mnFeaturesPerLevel logic,
src/ORBextractor.cpp:211-231) and coordinates reported at level-0 resolution.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mc_slam_tpu.frontend import fast, orb, pyramid


class Features(NamedTuple):
    xy: jnp.ndarray        # (N, 2) float32 keypoint positions, level-0 pixels (raw/distorted)
    level: jnp.ndarray     # (N,) int32 pyramid level
    angle: jnp.ndarray     # (N,) float32 rad
    score: jnp.ndarray     # (N,) float32 FAST response
    desc: jnp.ndarray      # (N, 8) uint32 packed 256-bit descriptors
    desc_pm1: jnp.ndarray  # (N, 256) int8 {-1,+1} (for MXU matching)
    valid: jnp.ndarray     # (N,) bool


def per_level_quota(n_features, n_levels=8, scale=1.2):
    """Features per level ~ (1/scale)^i, normalized to sum to n_features."""
    inv = [(1.0 / scale) ** i for i in range(n_levels)]
    total = sum(inv)
    q = [int(round(n_features * v / total)) for v in inv]
    q[0] += n_features - sum(q)
    return q


@partial(jax.jit, static_argnames=("n_features", "n_levels", "cell"))
def extract(img, n_features=1024, n_levels=8, scale=1.2, th_hi=20.0, th_lo=7.0,
            cell=32) -> Features:
    """img: (H, W) float32 grayscale in [0,255]. Returns padded Features of
    exactly n_features rows (invalid rows masked)."""
    levels = pyramid.build_pyramid(img, n_levels, scale)
    quotas = per_level_quota(n_features, n_levels, scale)
    sf = pyramid.scale_factors(n_levels, scale)

    outs = []
    for li, (lvl_img, quota) in enumerate(zip(levels, quotas)):
        if quota == 0:
            continue
        xy, score, valid = fast.detect_grid(lvl_img, th_hi, th_lo, cell=cell,
                                            max_kp=quota, border=16)
        blur = pyramid.gaussian_blur(lvl_img)
        ang = orb.ic_angle(lvl_img, xy)
        desc = orb.brief_descriptors(blur, xy, ang)
        xy0 = xy.astype(jnp.float32) * sf[li]
        outs.append((xy0, jnp.full((quota,), li, jnp.int32), ang, score, desc,
                     valid))

    xy = jnp.concatenate([o[0] for o in outs])
    level = jnp.concatenate([o[1] for o in outs])
    angle = jnp.concatenate([o[2] for o in outs])
    score = jnp.concatenate([o[3] for o in outs])
    desc = jnp.concatenate([o[4] for o in outs])
    valid = jnp.concatenate([o[5] for o in outs])
    desc = jnp.where(valid[:, None], desc, 0)
    return Features(xy=xy, level=level, angle=angle, score=score, desc=desc,
                    desc_pm1=orb.unpack_pm1(desc), valid=valid)
