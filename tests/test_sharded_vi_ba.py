"""Distributed joint visual-inertial BA over the virtual 8-device mesh:
recovers poses/velocities/bias like the single-chip solver, with the
visual Schur reduction landmark-sharded (BASELINE.md north-star bullet 3:
"distributed VIBA")."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.backend import ba as ba_mod
from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.imu import preintegration as pre_mod
from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.parallel import mesh as mesh_mod
from orb_slam3_ros2_tpu.parallel import sharded_vi_ba


def _vi_problem(K=6, L=128, seed=11):
    sc = synthetic.make_scene(n_frames=K, n_points=L, noise_px=0.3,
                              seed=seed, fps=2.0)
    traj = synthetic.default_trajectory(seed=seed + 1)
    ts = sc.timestamps
    true_bg = np.array([0.015, -0.01, 0.02])
    pres = []
    for i in range(K - 1):
        _, gyro, acc = synthetic.make_imu(
            traj, ts[i], ts[i + 1], rate=200.0, gyro_bias=true_bg,
            gyro_noise=1e-4, acc_noise=1e-3, seed=i)
        n = len(gyro)
        pres.append(pre_mod.preintegrate(
            jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
            jnp.full((n,), 1.0 / 200.0, jnp.float32), jnp.ones(n, bool)))
    pres = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *pres)
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
        point_valid=jnp.ones((L,), bool))
    return sc, p, pres, v_init, v_gt, true_bg


def test_sharded_vi_ba_recovers_state_on_8_devices():
    mesh = mesh_mod.make_mesh(len(jax.devices()))
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    L = 16 * n_dev
    sc, p, pres, v_init, v_gt, true_bg = _vi_problem(K=6, L=L)

    solver = sharded_vi_ba.make_sharded_vi_ba(
        mesh, sc.fx, sc.fy, sc.cx, sc.cy, n_iters=10,
        prior_bg=1e1, prior_ba=1e0)
    out = solver(sharded_vi_ba.shard_vi_problem(p, mesh), pres, v_init,
                 jnp.zeros(3), jnp.zeros(3))

    err_before = np.linalg.norm(np.asarray(p.t) - sc.t_cw, axis=-1).mean()
    t_err = np.linalg.norm(np.asarray(out.t) - sc.t_cw, axis=-1).mean()
    assert np.isfinite(float(out.cost))
    assert t_err < err_before, (t_err, err_before)
    assert t_err < 2e-2, t_err
    v_err = np.linalg.norm(np.asarray(out.v) - v_gt, axis=-1).mean()
    assert v_err < 5e-2, v_err
    np.testing.assert_allclose(np.asarray(out.bg), true_bg, atol=5e-3)
