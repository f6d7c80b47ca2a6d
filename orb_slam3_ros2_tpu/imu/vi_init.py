"""Visual-inertial initialization (VIBA1 stage, E7).

Reference behavior: after a mono map exists, ORB-SLAM3 runs inertial-only
MAP optimization solving {scale, gravity direction, per-KF velocities, gyro
+ accel biases} with visual poses fixed, then upgrades the map and later
re-runs joint visual-inertial BA (VIBA2). The wrapper surfaces these stage
gates as `GetInertialBA1/GetInertialBA2`
(`/root/reference/src/imu_mono_realsense.cpp:485-495` [api]; stage semantics
`README.md:118-121`).

TPU-native: the whole problem is one flat parameter vector
θ = [log s, θ_g(2), v(K·3), bg(3), ba(3)] and one residual vector (all
preintegration intervals whitened by their preintegration covariance +
bias priors). GN with `jax.jacfwd` — the problem is tiny (tens of params),
so exact dense autodiff Jacobians beat hand-derivation and stay correct as
the residual evolves. Fixed iteration count under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.imu import preintegration as pre_mod

G0 = jnp.array([0.0, 0.0, -9.81])


class VIInitResult(NamedTuple):
    scale: jnp.ndarray  # ()
    R_wg: jnp.ndarray  # (3, 3) gravity-aligning rotation: g_w = R_wg @ (0,0,-9.81)
    v: jnp.ndarray  # (K, 3) body velocities (metric)
    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)
    cost: jnp.ndarray  # () final whitened cost


def _unpack(theta, K):
    log_s = theta[0]
    th_g = theta[1:3]
    v = theta[3 : 3 + 3 * K].reshape(K, 3)
    bg = theta[3 + 3 * K : 6 + 3 * K]
    ba = theta[6 + 3 * K : 9 + 3 * K]
    return log_s, th_g, v, bg, ba


def vi_init(
    pres: pre_mod.Preintegrated,  # stacked pytree, leading dim K-1 (intervals)
    R_wb: jnp.ndarray,  # (K, 3, 3) visual body rotations (world arbitrary)
    p_wb: jnp.ndarray,  # (K, 3) visual body positions (up to scale)
    prior_bg: float = 1e2,
    prior_ba: float = 1e1,
    n_iters: int = 25,
    fix_scale: bool = False,
) -> VIInitResult:
    """Inertial-only MAP estimation with visual poses fixed.

    `pres` is a Preintegrated pytree whose leaves carry a leading (K-1) dim
    (one interval per consecutive keyframe pair). For stereo/rectified input
    `fix_scale=True` pins log s = 0 (reference does the same [upstream]).
    """
    K = R_wb.shape[0]

    # whitening: W = chol(info)ᵀ so ||W r||² = rᵀ Σ⁻¹ r
    info = jax.vmap(pre_mod.information)(pres)
    Wmat = jnp.linalg.cholesky(
        0.5 * (info + jnp.swapaxes(info, -1, -2))
        + 1e-6 * jnp.eye(9)[None]
    )

    def residuals(theta):
        log_s, th_g, v, bg, ba = _unpack(theta, K)
        s = jnp.where(fix_scale, 1.0, jnp.exp(log_s))
        R_wg = lie.so3_exp(jnp.concatenate([th_g, jnp.zeros(1)]))
        g_w = R_wg @ G0

        def one(i):
            pre_i = jax.tree_util.tree_map(lambda x: x[i], pres)
            r = pre_mod.residual(
                pre_i,
                R_wb[i], s * p_wb[i], v[i],
                R_wb[i + 1], s * p_wb[i + 1], v[i + 1],
                bg, ba, scale=1.0, g_w=g_w,
            )
            return jnp.swapaxes(Wmat[i], 0, 1) @ r

        r_all = jax.vmap(one)(jnp.arange(K - 1)).reshape(-1)
        r_prior = jnp.concatenate(
            [jnp.sqrt(prior_bg) * bg, jnp.sqrt(prior_ba) * ba]
        )
        return jnp.concatenate([r_all, r_prior])

    theta0 = jnp.zeros(9 + 3 * K)

    def gn_step(theta, _):
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta)
        H = J.T @ J + 1e-6 * jnp.eye(theta.shape[0])
        b = J.T @ r
        dx = -jnp.linalg.solve(H, b)
        # simple step-halving safeguard: accept only if cost decreases
        def cost(th):
            rr = residuals(th)
            return jnp.sum(rr * rr)
        c0 = cost(theta)
        cands = jnp.stack([theta + dx, theta + 0.5 * dx, theta + 0.25 * dx])
        costs = jax.vmap(cost)(cands)
        best = jnp.argmin(costs)
        theta = jnp.where(costs[best] < c0, cands[best], theta)
        return theta, costs[best]

    theta, costs = jax.lax.scan(gn_step, theta0, None, length=n_iters)
    log_s, th_g, v, bg, ba = _unpack(theta, K)
    r = residuals(theta)
    return VIInitResult(
        scale=jnp.where(fix_scale, 1.0, jnp.exp(log_s)),
        R_wg=lie.so3_exp(jnp.concatenate([th_g, jnp.zeros(1)])),
        v=v,
        bg=bg,
        ba=ba,
        cost=jnp.sum(r * r),
    )
