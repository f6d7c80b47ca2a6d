"""Pose-only LM + Schur-complement BA vs groundtruth on synthetic scenes."""

import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.backend import ba as ba_mod
from orb_slam3_ros2_tpu.backend import pose_opt
from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.io import synthetic


def test_pose_opt_recovers_pose():
    sc = synthetic.make_scene(n_frames=2, n_points=200, noise_px=0.3, seed=0)
    k = 1
    # perturb groundtruth
    xi = jnp.asarray([0.05, -0.04, 0.06, 0.02, -0.015, 0.02], jnp.float32)
    R0, t0 = lie.se3_retract(jnp.asarray(sc.R_cw[k]), jnp.asarray(sc.t_cw[k]), xi)
    res = pose_opt.optimize_pose(
        R0, t0,
        jnp.asarray(sc.X, jnp.float32),
        jnp.asarray(sc.uv[k]),
        jnp.ones((sc.X.shape[0],), jnp.float32),
        jnp.asarray(sc.vis[k]),
        sc.fx, sc.fy, sc.cx, sc.cy,
    )
    t_err = np.linalg.norm(np.asarray(res.t) - sc.t_cw[k])
    R_err = np.linalg.norm(np.asarray(res.R) - sc.R_cw[k])
    assert t_err < 5e-3, t_err
    assert R_err < 1e-3, R_err
    assert int(res.n_inliers) > 150


def test_pose_opt_rejects_outliers():
    sc = synthetic.make_scene(
        n_frames=2, n_points=300, noise_px=0.3, outlier_frac=0.25, seed=1
    )
    k = 1
    xi = jnp.asarray([0.03, 0.02, -0.03, 0.01, 0.02, -0.01], jnp.float32)
    R0, t0 = lie.se3_retract(jnp.asarray(sc.R_cw[k]), jnp.asarray(sc.t_cw[k]), xi)
    res = pose_opt.optimize_pose(
        R0, t0,
        jnp.asarray(sc.X, jnp.float32),
        jnp.asarray(sc.uv[k]),
        jnp.ones((sc.X.shape[0],), jnp.float32),
        jnp.asarray(sc.vis[k]),
        sc.fx, sc.fy, sc.cx, sc.cy,
    )
    t_err = np.linalg.norm(np.asarray(res.t) - sc.t_cw[k])
    assert t_err < 2e-2, t_err


def _build_problem(sc, pose_noise=0.02, point_noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    K = sc.R_cw.shape[0]
    L = sc.X.shape[0]
    xi = jnp.asarray(
        rng.normal(0, pose_noise, (K, 6)).astype(np.float32)
    ).at[0].set(0.0).at[1].set(0.0)
    R0, t0 = lie.se3_retract(jnp.asarray(sc.R_cw), jnp.asarray(sc.t_cw), xi)
    X0 = jnp.asarray(
        sc.X + rng.normal(0, point_noise, sc.X.shape), jnp.float32
    )
    fixed = jnp.zeros((K,), bool).at[0].set(True).at[1].set(True)
    w = jnp.asarray(sc.vis, jnp.float32)
    return ba_mod.BAProblem(
        R=R0, t=t0, X=X0, uv=jnp.asarray(sc.uv), w=w, fixed=fixed,
        point_valid=jnp.ones((L,), bool),
    )


def test_ba_reduces_error():
    sc = synthetic.make_scene(n_frames=8, n_points=150, noise_px=0.3, seed=2, fps=2.0)
    # start landmarks well above the estimator's noise floor so convergence
    # towards it is measurable (floor ≈ z²σ_px/(fx·baseline) ≈ 0.05-0.06 m at
    # z≈7 m, fx=458, σ=0.3 px — verified by a GT-initialized oracle run)
    p = _build_problem(sc, point_noise=0.15)
    out = ba_mod.bundle_adjust(p, sc.fx, sc.fy, sc.cx, sc.cy, n_iters=12)

    t_err_before = np.linalg.norm(np.asarray(p.t) - sc.t_cw, axis=-1).mean()
    t_err_after = np.linalg.norm(np.asarray(out.t) - sc.t_cw, axis=-1).mean()
    assert t_err_after < t_err_before * 0.2, (t_err_before, t_err_after)
    assert t_err_after < 4e-3

    X_err_before = np.linalg.norm(np.asarray(p.X) - sc.X, axis=-1).mean()
    X_err_after = np.linalg.norm(np.asarray(out.X) - sc.X, axis=-1).mean()
    assert X_err_after < 0.4 * X_err_before, (X_err_before, X_err_after)
    assert X_err_after < 8e-2

    # the solution must be at the noise floor: re-running BA from groundtruth
    # landmarks on the same noisy observations must not do meaningfully better
    oracle = ba_mod.bundle_adjust(
        p._replace(R=jnp.asarray(sc.R_cw), t=jnp.asarray(sc.t_cw),
                   X=jnp.asarray(sc.X)),
        sc.fx, sc.fy, sc.cx, sc.cy, n_iters=12,
    )
    X_err_oracle = np.linalg.norm(np.asarray(oracle.X) - sc.X, axis=-1).mean()
    # weakly-observed landmarks sit in near-flat directions of the robust
    # cost (identical final cost, init-dependent position), so allow margin
    assert X_err_after < 1.4 * X_err_oracle + 1e-3, (X_err_after, X_err_oracle)

    # fixed poses must not move
    np.testing.assert_allclose(np.asarray(out.t[:2]), np.asarray(p.t[:2]), atol=1e-5)


def test_ba_handles_unobserved_landmarks():
    sc = synthetic.make_scene(n_frames=6, n_points=100, noise_px=0.3, seed=3, fps=2.0)
    p = _build_problem(sc)
    w = np.array(p.w)
    w[:, :10] = 0.0  # kill all observations of first 10 landmarks
    p = p._replace(w=jnp.asarray(w))
    out = ba_mod.bundle_adjust(p, sc.fx, sc.fy, sc.cx, sc.cy, n_iters=8)
    # unobserved landmarks unchanged, no NaNs anywhere
    np.testing.assert_allclose(
        np.asarray(out.X[:10]), np.asarray(p.X[:10]), atol=1e-6
    )
    assert np.isfinite(np.asarray(out.t)).all()
    assert np.isfinite(np.asarray(out.X)).all()


def test_ba_robust_to_outliers():
    sc = synthetic.make_scene(
        n_frames=8, n_points=150, noise_px=0.3, outlier_frac=0.15, seed=4, fps=2.0
    )
    p = _build_problem(sc)
    out = ba_mod.bundle_adjust(p, sc.fx, sc.fy, sc.cx, sc.cy, n_iters=14)
    t_err_after = np.linalg.norm(np.asarray(out.t) - sc.t_cw, axis=-1).mean()
    assert t_err_after < 2e-2, t_err_after
