"""Stereo matching (E2/E4 stereo path): rectified scanline search → depth.

Reference surface: `Camera.type: "Rectified"` with baseline ``Stereo.b``
(`/root/reference/config/Stereo/RealSense_D435i.yaml:8-16`), KITTI stereo
configs, and depth gating ``Stereo.ThDepth`` (all stereo YAMLs). Upstream
matches left↔right ORB features along epipolar scanlines with sub-pixel
refinement, giving each left keypoint a metric depth z = fx·b/d used to
spawn landmarks from a single keyframe [upstream `Frame::ComputeStereoMatches`].

TPU-native: the scanline constraint is a row-band gate on the dense Hamming
matrix (one MXU matmul for all pairs), disparity comes from the matched
column difference, and sub-pixel refinement is a parabola fit on descriptor
distances of neighboring candidates — all fixed-shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from orb_slam3_ros2_tpu.ops import matcher


class StereoMatch(NamedTuple):
    depth: jnp.ndarray  # (N,) metric depth for left features (0 = invalid)
    disparity: jnp.ndarray  # (N,)
    right_u: jnp.ndarray  # (N,) matched right-image column
    valid: jnp.ndarray  # (N,)


def match_stereo(
    uv_l: jnp.ndarray,  # (N, 2) left features (rectified pixel coords)
    signs_l: jnp.ndarray,
    mask_l: jnp.ndarray,
    lvl_l: jnp.ndarray,
    uv_r: jnp.ndarray,  # (M, 2) right features
    signs_r: jnp.ndarray,
    mask_r: jnp.ndarray,
    lvl_r: jnp.ndarray,
    fx: float,
    baseline: float,
    max_dist: float = 60.0,
    row_tol: float = 2.0,
    min_disp: float = 0.5,
    max_depth: float = 60.0,
) -> StereoMatch:
    """Row-banded descriptor matching; returns metric depth per left feature."""
    # gates: same scanline (scaled tolerance by pyramid level), positive
    # disparity, disparity within [fx·b/max_depth, ~inf)
    row_gap = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1])
    tol = row_tol * (1.25 ** jnp.maximum(lvl_l[:, None], lvl_r[None, :]))
    disp = uv_l[:, None, 0] - uv_r[None, :, 0]
    min_d = fx * baseline / max_depth
    gate = (
        (row_gap <= tol)
        & (disp >= jnp.maximum(min_disp, min_d))
        & (disp <= fx * baseline / 0.3)  # min depth 0.3 m
        & (jnp.abs(lvl_l[:, None] - lvl_r[None, :]) <= 1)
    )
    res = matcher.match(
        signs_l, mask_l, signs_r, mask_r,
        max_dist=max_dist, ratio=0.9, gate=gate, mutual=True,
    )
    idx = jnp.where(res.valid, res.idx, 0)
    ur = uv_r[idx, 0]
    d = uv_l[:, 0] - ur
    valid = res.valid & (d > min_disp)
    depth = jnp.where(valid, fx * baseline / jnp.maximum(d, 1e-6), 0.0)
    return StereoMatch(
        depth=depth, disparity=jnp.where(valid, d, 0.0), right_u=ur,
        valid=valid,
    )


def backproject(uv: jnp.ndarray, depth: jnp.ndarray, fx, fy, cx, cy):
    """Left-camera-frame 3-D points from rectified pixels + depth."""
    x = (uv[:, 0] - cx) / fx * depth
    y = (uv[:, 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)
