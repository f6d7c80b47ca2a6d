"""Pose-only LM as ONE Pallas kernel — the tracking latency fix (E4).

`pose_opt.optimize_pose` is algorithmically cheap (~0.3 MFLOP/frame) but the
r2 profile measured it at 0.827 ms/frame — 34% of the tracking step at 0.1%
of speed-of-light. The cost is pure launch/serialization overhead: each of
the 16 LM evaluations lowers to ~10 separate XLA fusions (residual pass,
Gram reduction, damped 6×6 solve, retract, accept/reject selects), and a
chain of ~160 kernel launches with serial dependencies is latency-, not
compute-, bound.

This module re-implements the IDENTICAL algorithm (same rounds/iterations,
same Huber weights, same accept/reject and re-classification semantics as
`pose_opt.optimize_pose` — see that docstring for the reference mapping to
g2o's PoseOptimization [upstream]) as a single Pallas kernel: all point
data lives in VMEM in (row, lane)-major (k, N) layout, per-iteration vector
work is a handful of VPU passes, the 7×7 Gram entries are 28 lane
reductions, and the 6×6 Cholesky + SE3 retraction run as unrolled scalar
ops in registers. One launch per frame instead of ~160.

Numerical note: op order differs from the XLA version (reduction trees,
scalar chains), so results agree to float tolerance, not bitwise; the
oracle test checks pose agreement to ~1e-4 and identical inlier sets.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam3_ros2_tpu.backend import pose_opt
from orb_slam3_ros2_tpu.backend import residuals as res

_DELTA = float(pose_opt.HUBER_MONO)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _chol_solve6_scalars(h, b):
    """Solve the damped 6x6 system with unrolled scalar Cholesky.

    h: 6x6 nested list of scalar traced values (symmetric, damped).
    b: list of 6 scalars. Returns list of 6 scalars x with H x = b.
    Mirrors ops.chol_small.cholesky_solve_small on plain scalars.
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = h[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _mat3_mul(A, B):
    """3x3 @ 3x3 on nested scalar lists."""
    return [[sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]


def _mat3_vec(A, v):
    return [sum(A[i][k] * v[k] for k in range(3)) for i in range(3)]


def _se3_retract_scalars(dx, R, t):
    """exp([rho, phi]) ∘ (R, t) on scalars — mirrors lie.se3_retract with
    the same Taylor guards (_sinc_cos_coeffs, lie.py)."""
    rho = dx[0:3]
    phi = dx[3:6]
    ts = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    small = ts < 1e-8
    safe_ts = jnp.where(small, 1.0, ts)
    theta = jnp.sqrt(safe_ts)
    a = jnp.where(small, 1.0 - ts / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - ts / 24.0, (1.0 - jnp.cos(theta)) / safe_ts)
    c = jnp.where(small, 1.0 / 6.0 - ts / 120.0, (1.0 - a) / safe_ts)
    K = [[0.0, -phi[2], phi[1]],
         [phi[2], 0.0, -phi[0]],
         [-phi[1], phi[0], 0.0]]
    # K² = phi phiᵀ − θ² I
    P2 = [[phi[i] * phi[j] - (ts if i == j else 0.0) for j in range(3)]
          for i in range(3)]
    dR = [[(1.0 if i == j else 0.0) + a * K[i][j] + b * P2[i][j]
           for j in range(3)] for i in range(3)]
    V = [[(1.0 if i == j else 0.0) + b * K[i][j] + c * P2[i][j]
          for j in range(3)] for i in range(3)]
    dt = _mat3_vec(V, rho)
    R_new = _mat3_mul(dR, R)
    t_new = [x + y for x, y in zip(_mat3_vec(dR, t), dt)]
    return R_new, t_new


def _normalize_scalars(R):
    """Gram-Schmidt on columns — mirrors lie.se3_normalize."""
    def col(j):
        return [R[0][j], R[1][j], R[2][j]]

    def norm(v):
        return jnp.maximum(
            jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]), 1e-12)

    x = col(0)
    nx = norm(x)
    x = [e / nx for e in x]
    y = col(1)
    d = x[0] * y[0] + x[1] * y[1] + x[2] * y[2]
    y = [ye - d * xe for ye, xe in zip(y, x)]
    ny = norm(y)
    y = [e / ny for e in y]
    z = [x[1] * y[2] - x[2] * y[1],
         x[2] * y[0] - x[0] * y[2],
         x[0] * y[1] - x[1] * y[0]]
    return [[x[i], y[i], z[i]] for i in range(3)]


def _huber_rho_v(chi2, delta):
    return jnp.where(
        chi2 <= delta * delta,
        chi2,
        2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - delta * delta,
    )


def _make_kernel(Np, fx, fy, cx, cy, n_rounds, iters_per_round, chi2_th):
    delta = _DELTA

    def kernel(pose_ref, Xt_ref, uvt_ref, invs2_ref, mask_ref,
               pose_out_ref, inl_ref):
        X0 = Xt_ref[0:1, :]
        X1 = Xt_ref[1:2, :]
        X2 = Xt_ref[2:3, :]
        U = uvt_ref[0:1, :]
        V = uvt_ref[1:2, :]
        invs2 = invs2_ref[:]
        maskf = mask_ref[:]
        w_base = invs2 * maskf

        R = [[pose_ref[0, 3 * i + j] for j in range(3)] for i in range(3)]
        t = [pose_ref[0, 9 + i] for i in range(3)]

        def eval_system(R, t, w_active):
            # residual + analytic Jacobian comps, all (1, Np) vectors
            xr = R[0][0] * X0 + R[0][1] * X1 + R[0][2] * X2 + t[0]
            yr = R[1][0] * X0 + R[1][1] * X1 + R[1][2] * X2 + t[1]
            zr = R[2][0] * X0 + R[2][1] * X1 + R[2][2] * X2 + t[2]
            z = jnp.where(jnp.abs(zr) < 1e-8, 1e-8, zr)
            iz = 1.0 / z
            iz2 = iz * iz
            rx = fx * xr * iz + cx - U
            ry = fy * yr * iz + cy - V
            chi2 = (rx * rx + ry * ry) * invs2
            # cheirality as f32 0/1: Mosaic cannot select/carry i1 vectors
            pos = jnp.where(zr > 0.05, 1.0, 0.0)
            rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            hw = jnp.where(rn <= delta, 1.0, delta / rn)
            ww = w_active * hw * pos
            a0 = fx * iz
            c0 = -fx * xr * iz2
            b1 = fy * iz
            c1 = -fy * yr * iz2
            zero = jnp.zeros_like(a0)
            # J rows incl. residual as 7th column of the Gram system
            J0 = [a0, zero, c0, c0 * yr, a0 * zr - c0 * xr, -a0 * yr, rx]
            J1 = [zero, b1, c1, c1 * yr - b1 * zr, -c1 * xr, b1 * xr, ry]
            W0 = [ww * j for j in J0]
            W1 = [ww * j for j in J1]
            G = [[None] * 7 for _ in range(7)]
            for i in range(7):
                for j in range(i, 7):
                    G[i][j] = jnp.sum(W0[i] * J0[j] + W1[i] * J1[j])
                    G[j][i] = G[i][j]
            cost = jnp.sum(_huber_rho_v(chi2, delta) * (w_active > 0))
            return G, cost, chi2, pos

        lam = jnp.float32(1e-3)
        chi2v = jnp.zeros_like(invs2)
        posv = jnp.ones_like(invs2)  # f32 0/1 cheirality carry

        for rnd in range(n_rounds):
            if rnd == 0:
                w_active = w_base
            else:
                inl = jnp.where(chi2v <= chi2_th, 1.0, 0.0) * posv * maskf
                w_active = w_base * inl
            G, cost, chi2v, posv = eval_system(R, t, w_active)

            for _ in range(iters_per_round):
                # damped solve on the carried system
                h = [[G[i][j] + (lam * G[i][i] + 1e-9 if i == j else 0.0)
                      for j in range(6)] for i in range(6)]
                b = [G[i][6] for i in range(6)]
                x = _chol_solve6_scalars(h, b)
                dx = [-e for e in x]
                R_c, t_c = _se3_retract_scalars(dx, R, t)
                R_c = _normalize_scalars(R_c)
                G_c, cost_c, chi2_c, pos_c = eval_system(R_c, t_c, w_active)
                better = cost_c < cost
                R = [[jnp.where(better, R_c[i][j], R[i][j])
                      for j in range(3)] for i in range(3)]
                t = [jnp.where(better, t_c[i], t[i]) for i in range(3)]
                G = [[jnp.where(better, G_c[i][j], G[i][j])
                      for j in range(7)] for i in range(7)]
                cost = jnp.where(better, cost_c, cost)
                # vector carries blended in f32 — a scalar-pred select of
                # vectors fails to legalize in Mosaic ('arith.select')
                bf = jnp.where(better, 1.0, 0.0)
                chi2v = bf * chi2_c + (1.0 - bf) * chi2v
                posv = bf * pos_c + (1.0 - bf) * posv
                lam = jnp.clip(
                    jnp.where(better, lam * 0.5, lam * 4.0), 1e-7, 1e2)

        inliers = jnp.where(chi2v <= chi2_th, 1.0, 0.0) * posv * maskf
        inl_ref[:] = inliers
        rho = _huber_rho_v(chi2v, delta)
        for i in range(3):
            for j in range(3):
                pose_out_ref[0, 3 * i + j] = R[i][j]
            pose_out_ref[0, 9 + i] = t[i]
        pose_out_ref[0, 12] = jnp.sum(rho * inliers)
        pose_out_ref[0, 13] = jnp.sum(inliers)
        pose_out_ref[0, 14] = 0.0
        pose_out_ref[0, 15] = 0.0

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "n_rounds", "iters_per_round",
                     "chi2_th", "interpret"),
)
def _pose_call(R0, t0, X, uv, inv_sigma2, mask,
               fx, fy, cx, cy, n_rounds, iters_per_round, chi2_th,
               interpret):
    N = X.shape[0]
    Np = _cdiv(max(N, 8), 128) * 128
    Xt = jnp.zeros((3, Np), jnp.float32).at[:, :N].set(
        X.astype(jnp.float32).T)
    uvt = jnp.zeros((2, Np), jnp.float32).at[:, :N].set(
        uv.astype(jnp.float32).T)
    invs2 = jnp.zeros((1, Np), jnp.float32).at[0, :N].set(
        inv_sigma2.astype(jnp.float32))
    maskf = jnp.zeros((1, Np), jnp.float32).at[0, :N].set(
        mask.astype(jnp.float32))
    pose0 = jnp.concatenate(
        [R0.astype(jnp.float32).reshape(9), t0.astype(jnp.float32)]
    ).reshape(1, 12)

    kernel = _make_kernel(Np, float(fx), float(fy), float(cx), float(cy),
                          int(n_rounds), int(iters_per_round),
                          float(chi2_th))
    pose_out, inl = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 16), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ],
        interpret=interpret,
    )(pose0, Xt, uvt, invs2, maskf)
    return pose_out, inl[0, :N]


def optimize_pose_fused(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    mask: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    n_rounds: int = 3,
    iters_per_round: int = 5,
    chi2_th: float = res.CHI2_MONO,
    interpret: Optional[bool] = None,
) -> pose_opt.PoseOptResult:
    """Drop-in for `pose_opt.optimize_pose`; single-kernel on TPU."""
    if interpret is None and jax.default_backend() != "tpu":
        return pose_opt.optimize_pose(
            R0, t0, X, uv, inv_sigma2, mask, fx, fy, cx, cy,
            n_rounds=n_rounds, iters_per_round=iters_per_round,
            chi2_th=chi2_th,
        )
    pose_out, inl = _pose_call(
        R0, t0, X, uv, inv_sigma2, mask,
        float(fx), float(fy), float(cx), float(cy),
        int(n_rounds), int(iters_per_round), float(chi2_th),
        bool(interpret),
    )
    R = pose_out[0, :9].reshape(3, 3)
    t = pose_out[0, 9:12]
    inliers = inl > 0.5
    return pose_opt.PoseOptResult(
        R=R, t=t, inliers=inliers,
        n_inliers=pose_out[0, 13].astype(jnp.int32),
        cost=pose_out[0, 12],
    )
