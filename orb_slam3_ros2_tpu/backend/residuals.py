"""Reprojection residuals + closed-form Jacobians for GN/LM (E4/E6/E11).

Convention: poses are T_cw (camera-from-world), matching the reference's
`TrackMonocular` return (`/root/reference/src/imu_mono_realsense.cpp:334-339`
stores Tcw). Observations are *undistorted* pixel coordinates under the
ideal pinhole (fx, fy, cx, cy): distortion (radtan or KB8) is removed once at
extraction time via `models.cameras.unproject`, so the optimizer is
camera-model-free and its Jacobians are the cheap pinhole closed forms — the
same structure the reference engine uses (undistorted keypoints + pinhole
projection inside g2o edges [upstream]).

Tangent convention: left-multiplicative perturbation on T_cw,
``T_cw ← exp(ξ) ∘ T_cw`` with ξ = [ρ, φ]; hence for x_c = R x_w + t:
``∂x_c/∂ρ = I``, ``∂x_c/∂φ = -[x_c]×``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from orb_slam3_ros2_tpu.geom import lie

# chi-square 95% thresholds used by the reference for observation gating
# (2 DoF mono, 3 DoF stereo) [upstream Tracking/Optimizer constants].
CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class Projection(NamedTuple):
    r: jnp.ndarray  # (..., 2) residual (predicted - observed), pixels
    J_pose: jnp.ndarray  # (..., 2, 6) d r / d ξ
    J_point: jnp.ndarray  # (..., 2, 3) d r / d X_w
    depth: jnp.ndarray  # (...,) camera-frame depth (for cheirality masks)


def project_pinhole(fx, fy, cx, cy, x_cam: jnp.ndarray) -> jnp.ndarray:
    z = jnp.where(jnp.abs(x_cam[..., 2]) < 1e-8, 1e-8, x_cam[..., 2])
    return jnp.stack(
        [fx * x_cam[..., 0] / z + cx, fy * x_cam[..., 1] / z + cy], axis=-1
    )


def reproj_residual(
    R_cw: jnp.ndarray,  # (..., 3, 3)
    t_cw: jnp.ndarray,  # (..., 3)
    X_w: jnp.ndarray,  # (..., 3)
    uv_obs: jnp.ndarray,  # (..., 2)
    fx: float,
    fy: float,
    cx: float,
    cy: float,
) -> Projection:
    """Residual + Jacobians, broadcasting over leading dims."""
    x_c = lie.se3_apply(R_cw, t_cw, X_w)
    x, y = x_c[..., 0], x_c[..., 1]
    z = jnp.where(jnp.abs(x_c[..., 2]) < 1e-8, 1e-8, x_c[..., 2])
    iz = 1.0 / z
    iz2 = iz * iz

    r = jnp.stack([fx * x * iz + cx, fy * y * iz + cy], axis=-1) - uv_obs

    zeros = jnp.zeros_like(x)
    # J_proj = d(uv)/d(x_c): (..., 2, 3)
    Jp = jnp.stack(
        [
            jnp.stack([fx * iz, zeros, -fx * x * iz2], axis=-1),
            jnp.stack([zeros, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )
    # d x_c / d ξ = [ I | -hat(x_c) ]  -> J_pose = Jp @ that
    J_rho = Jp
    J_phi = -Jp @ lie.hat(x_c)
    J_pose = jnp.concatenate([J_rho, J_phi], axis=-1)
    # d x_c / d X_w = R  -> J_point = Jp @ R
    J_point = Jp @ R_cw
    return Projection(r=r, J_pose=J_pose, J_point=J_point, depth=x_c[..., 2])


def huber_weight(r2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for the Huber loss on squared error r2 = ||r||²/σ².

    w = 1 for |r| ≤ δ, δ/|r| beyond — multiplies both JᵀJ and Jᵀr.
    """
    rn = jnp.sqrt(jnp.maximum(r2, 1e-12))
    return jnp.where(rn <= delta, 1.0, delta / rn)


def level_inv_sigma2(level: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """Per-observation information weight 1/σ² = 1/scale^{2·level}.

    Matches the reference's per-level covariance scaling (keypoint position
    noise grows with pyramid scale) [upstream ORB-SLAM invariant].
    """
    return scale_factor ** (-2.0 * level.astype(jnp.float32))
