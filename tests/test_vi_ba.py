"""Joint visual-inertial BA (VIBA2) recovers poses, velocities, and biases."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.backend import ba as ba_mod
from orb_slam3_ros2_tpu.backend import vi_ba
from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.imu import preintegration as pre_mod
from orb_slam3_ros2_tpu.io import synthetic


def test_vi_ba_converges_and_recovers_bias():
    K = 6
    fps = 2.0
    seed = 11
    sc = synthetic.make_scene(n_frames=K, n_points=120, noise_px=0.3,
                              seed=seed, fps=fps)
    traj = synthetic.default_trajectory(seed=seed + 1)
    ts = sc.timestamps
    true_bg = np.array([0.015, -0.01, 0.02])

    # preintegrate each interval with the true bias baked into measurements
    pres = []
    for i in range(K - 1):
        _, gyro, acc = synthetic.make_imu(
            traj, ts[i], ts[i + 1], rate=200.0, gyro_bias=true_bg,
            gyro_noise=1e-4, acc_noise=1e-3, seed=i,
        )
        n = len(gyro)
        pres.append(pre_mod.preintegrate(
            jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
            jnp.full((n,), 1.0 / 200.0, jnp.float32), jnp.ones(n, bool),
        ))
    pres = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *pres)

    # groundtruth velocities
    h = 1e-4
    v_gt = np.stack([
        (traj.position(t + h) - traj.position(t - h)) / (2 * h) for t in ts
    ])

    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.normal(0, 0.015, (K, 6)).astype(np.float32))
    xi = xi.at[0].set(0.0)
    R0, t0 = lie.se3_retract(jnp.asarray(sc.R_cw), jnp.asarray(sc.t_cw), xi)
    X0 = jnp.asarray(sc.X + rng.normal(0, 0.04, sc.X.shape), jnp.float32)
    v_init = jnp.asarray(v_gt + rng.normal(0, 0.1, v_gt.shape), jnp.float32)

    p = ba_mod.BAProblem(
        R=R0, t=t0, X=X0, uv=jnp.asarray(sc.uv),
        w=jnp.asarray(sc.vis, jnp.float32),
        fixed=jnp.zeros((K,), bool).at[0].set(True),
        point_valid=jnp.ones((sc.X.shape[0],), bool),
    )
    out = vi_ba.vi_bundle_adjust(
        p, pres, v_init, jnp.zeros(3), jnp.zeros(3),
        sc.fx, sc.fy, sc.cx, sc.cy, n_iters=10,
        prior_bg=1e1, prior_ba=1e0,
    )

    # pose bound is looser than visual-only BA would give: at 0.5 s keyframe
    # intervals the Euler preintegration discretization error is non-zero and
    # the covariance whitening weights the IMU strongly, pulling poses a few
    # mm off the visual optimum (real sequences use 0.05-0.25 s intervals)
    t_err = np.linalg.norm(np.asarray(out.t) - sc.t_cw, axis=-1).mean()
    assert t_err < 2e-2, t_err
    v_err = np.linalg.norm(np.asarray(out.v) - v_gt, axis=-1).mean()
    assert v_err < 5e-2, v_err
    np.testing.assert_allclose(np.asarray(out.bg), true_bg, atol=4e-3)
    assert np.isfinite(float(out.cost))


def test_vi_ba_pure_visual_equivalence_when_imu_weightless():
    """With near-zero IMU information the solution matches visual-only BA."""
    K = 5
    sc = synthetic.make_scene(n_frames=K, n_points=100, noise_px=0.3,
                              seed=12, fps=2.0)
    traj = synthetic.default_trajectory(seed=13)
    ts = sc.timestamps
    pres = []
    for i in range(K - 1):
        _, gyro, acc = synthetic.make_imu(traj, ts[i], ts[i + 1], rate=50.0)
        n = len(gyro)
        # inflate noise so preintegration carries ~no information
        pres.append(pre_mod.preintegrate(
            jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
            jnp.full((n,), 1.0 / 50.0, jnp.float32), jnp.ones(n, bool),
            noise_gyro=10.0, noise_acc=100.0,
        ))
    pres = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *pres)

    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.normal(0, 0.01, (K, 6)).astype(np.float32))
    xi = xi.at[0].set(0.0).at[1].set(0.0)
    R0, t0 = lie.se3_retract(jnp.asarray(sc.R_cw), jnp.asarray(sc.t_cw), xi)
    X0 = jnp.asarray(sc.X + rng.normal(0, 0.03, sc.X.shape), jnp.float32)
    p = ba_mod.BAProblem(
        R=R0, t=t0, X=X0, uv=jnp.asarray(sc.uv),
        w=jnp.asarray(sc.vis, jnp.float32),
        fixed=jnp.zeros((K,), bool).at[0].set(True).at[1].set(True),
        point_valid=jnp.ones((sc.X.shape[0],), bool),
    )
    out_vi = vi_ba.vi_bundle_adjust(
        p, pres, jnp.zeros((K, 3)), jnp.zeros(3), jnp.zeros(3),
        sc.fx, sc.fy, sc.cx, sc.cy, n_iters=8,
    )
    out_v = ba_mod.bundle_adjust(p, sc.fx, sc.fy, sc.cx, sc.cy, n_iters=8,
                                 reclassify_every=1000)
    t_err_vi = np.linalg.norm(np.asarray(out_vi.t) - sc.t_cw, axis=-1).mean()
    t_err_v = np.linalg.norm(np.asarray(out_v.t) - sc.t_cw, axis=-1).mean()
    assert abs(t_err_vi - t_err_v) < 3e-3, (t_err_vi, t_err_v)
