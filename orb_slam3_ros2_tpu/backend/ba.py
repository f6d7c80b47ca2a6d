"""Bundle adjustment with Schur-complement reduction (E6/E11).

Replaces the reference's g2o-based `Optimizer::LocalBundleAdjustment` /
`GlobalBundleAdjustemnt` (LM over SE3 keyframe vertices + 3-D landmark
vertices with Huber-robust mono edges [upstream; the fork exposes its VIBA
progress through `GetInertialBA1/2`,
`/root/reference/src/imu_mono_realsense.cpp:485-495`]).

TPU-native design (SURVEY.md §7): the problem is a fixed-capacity dense
masked block — K poses × L landmarks with an observation mask — instead of a
pointer graph. One LM iteration is a chain of einsum contractions:

    Hcc (K,6,6), Hll (L,3,3), W (K,L,6,3), bc, bl
    S = Hcc − W Hll⁻¹ Wᵀ            (K,K,6,6 — the reduced camera system)
    S dxc = −(bc − W Hll⁻¹ bl)      (one dense 6K×6K solve)
    dxl = −Hll⁻¹ (bl + Wᵀ dxc)      (batched 3×3 back-substitution)

Every step is matmul-shaped (MXU) or batched tiny-linalg; landmark
elimination is exact. Gauge freedom is fixed by a large diagonal prior on
`fixed_mask` poses (the reference fixes its anchor keyframes the same way,
by marking vertices fixed). The same function distributes over a device mesh
by sharding K — see parallel/sharded_ba.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_ros2_tpu.backend import residuals as res
from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.ops import chol_small

# math.sqrt, NOT jnp: a module-level device computation would force a
# device->host readback at import time, which flips the remote-relay TPU
# client into synchronous per-op dispatch (~27 ms/call) for the rest of the
# process — measured 37 fps vs 10k+ fps on the tracking benchmark.
HUBER = math.sqrt(res.CHI2_MONO)
FIXED_PRIOR = 1e12  # diagonal prior that pins gauge-fixed poses


class BAProblem(NamedTuple):
    """Dense masked BA problem. K poses, L landmarks."""

    R: jnp.ndarray  # (K, 3, 3) T_cw rotations
    t: jnp.ndarray  # (K, 3)
    X: jnp.ndarray  # (L, 3) world points
    uv: jnp.ndarray  # (K, L, 2) undistorted pixel observations
    w: jnp.ndarray  # (K, L) information weight (inv_sigma2 * obs_mask); 0 = no obs
    fixed: jnp.ndarray  # (K,) bool — poses held constant (gauge anchors)
    point_valid: jnp.ndarray  # (L,) bool


class BAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    X: jnp.ndarray
    cost: jnp.ndarray  # robust cost after the last accepted step
    inlier_w: jnp.ndarray  # (K, L) final effective weights (post chi² gate)


def _robust_terms(p: BAProblem, fx, fy, cx, cy, w_active):
    """Residuals/Jacobians/weights for the current state."""
    proj = res.reproj_residual(
        p.R[:, None], p.t[:, None], p.X[None, :], p.uv, fx, fy, cx, cy
    )
    r2 = jnp.sum(proj.r**2, axis=-1) * w_active
    hw = res.huber_weight(r2, HUBER)
    ww = w_active * hw * (proj.depth > 0.05)
    cost = jnp.sum(
        jnp.where(
            r2 <= HUBER * HUBER,
            r2,
            2.0 * HUBER * jnp.sqrt(jnp.maximum(r2, 1e-12)) - HUBER * HUBER,
        )
        * (w_active > 0)
    )
    return proj, ww, cost


def _cost_only(p: BAProblem, fx, fy, cx, cy, w_active, R, t, X):
    q = p._replace(R=R, t=t, X=X)
    _, _, cost = _robust_terms(q, fx, fy, cx, cy, w_active)
    return cost


def ba_iteration(p: BAProblem, fx, fy, cx, cy, w_active, lam):
    """One damped GN (LM) step; returns proposed (R, t, X)."""
    proj, ww, _ = _robust_terms(p, fx, fy, cx, cy, w_active)
    Jc, Jx, r = proj.J_pose, proj.J_point, proj.r  # (K,L,2,6) (K,L,2,3) (K,L,2)

    Hcc = jnp.einsum("klai,kl,klaj->kij", Jc, ww, Jc)  # (K,6,6)
    Hll = jnp.einsum("klai,kl,klaj->lij", Jx, ww, Jx)  # (L,3,3)
    W = jnp.einsum("klai,kl,klaj->klij", Jc, ww, Jx)  # (K,L,6,3)
    bc = jnp.einsum("klai,kl,kla->ki", Jc, ww, r)  # (K,6)
    bl = jnp.einsum("klai,kl,kla->li", Jx, ww, r)  # (L,3)

    # damping + gauge prior + landmark regularization
    K = Hcc.shape[0]
    L = Hll.shape[0]
    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    fixed_prior = jnp.where(p.fixed, FIXED_PRIOR, 0.0)
    Hcc = Hcc + (lam * jnp.abs(jnp.einsum("kii->ki", Hcc))[:, :, None] * eye6) \
        + (fixed_prior[:, None, None] + 1e-9) * eye6
    Hll = Hll + lam * jnp.abs(jnp.einsum("lii->li", Hll))[:, :, None] * eye3 \
        + 1e-8 * eye3

    Hll_inv = chol_small.inv3x3_spd(Hll)  # closed form — no LU custom call

    # Schur complement of the landmark block
    WHinv = jnp.einsum("klab,lbc->klac", W, Hll_inv)  # (K,L,6,3)
    S_off = jnp.einsum("klac,mldc->kmad", WHinv, W)  # (K,K,6,6)
    S = -S_off
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc)
    rhs = bc - jnp.einsum("klac,lc->ka", WHinv, bl)  # (K,6)

    S_flat = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    dxc = -jnp.linalg.solve(S_flat, rhs.reshape(-1)).reshape(K, 6)

    dxl = -jnp.einsum(
        "lab,lb->la", Hll_inv, bl + jnp.einsum("klab,ka->lb", W, dxc)
    )
    dxl = dxl * p.point_valid[:, None]

    R_new, t_new = lie.se3_retract(p.R, p.t, dxc)
    R_new = lie.se3_normalize(R_new)
    X_new = p.X + dxl
    return R_new, t_new, X_new


def bundle_adjust(
    p: BAProblem,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    n_iters: int = 10,
    chi2_th: float = res.CHI2_MONO,
    reclassify_every: int = 5,
) -> BAResult:
    """Robust LM bundle adjustment over a fixed-size window.

    Static iteration count under `lax.scan`; chi² outlier gating is refreshed
    every `reclassify_every` iterations (mirrors the reference's two-stage
    local BA: optimize 5, drop outliers, optimize 10 [upstream]).
    """
    w_base = p.w

    def step(carry, it):
        R, t, X, lam, w_active = carry
        q = p._replace(R=R, t=t, X=X)

        # periodic chi² re-classification — never before the first iteration
        # (optimize on all observations first, then gate, like the reference)
        def refresh(w_act):
            proj = res.reproj_residual(
                R[:, None], t[:, None], X[None, :], p.uv, fx, fy, cx, cy
            )
            chi2 = jnp.sum(proj.r**2, axis=-1) * w_base
            keep = (chi2 <= chi2_th) & (proj.depth > 0.05) & (w_base > 0)
            return w_base * keep
        w_active = jax.lax.cond(
            (it > 0) & ((it % reclassify_every) == 0), refresh, lambda w: w,
            w_active,
        )

        _, _, cost0 = _robust_terms(q, fx, fy, cx, cy, w_active)
        R_new, t_new, X_new = ba_iteration(q, fx, fy, cx, cy, w_active, lam)
        cost1 = _cost_only(q, fx, fy, cx, cy, w_active, R_new, t_new, X_new)
        better = cost1 < cost0
        R = jnp.where(better, R_new, R)
        t = jnp.where(better, t_new, t)
        X = jnp.where(better, X_new, X)
        lam = jnp.where(better, lam * 0.3, lam * 5.0).clip(1e-9, 1e3)
        return (R, t, X, lam, w_active), cost1

    (R, t, X, lam, w_active), costs = jax.lax.scan(
        step, (p.R, p.t, p.X, jnp.asarray(1e-4, jnp.float32), w_base),
        jnp.arange(n_iters),
    )
    q = p._replace(R=R, t=t, X=X)
    _, _, cost = _robust_terms(q, fx, fy, cx, cy, w_active)
    return BAResult(R=R, t=t, X=X, cost=cost, inlier_w=w_active)
