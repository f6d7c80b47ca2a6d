"""IMU preintegration vs analytic trajectory; VI init recovers scale/gravity."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.imu import preintegration as pre_mod
from orb_slam3_ros2_tpu.imu import vi_init
from orb_slam3_ros2_tpu.io import synthetic


def _segment(traj, t0, t1, rate=200.0, **kw):
    t, gyro, acc = synthetic.make_imu(traj, t0, t1, rate=rate, **kw)
    dts = np.full(t.shape, 1.0 / rate)
    return t, gyro, acc, dts


def test_preintegration_matches_groundtruth():
    traj = synthetic.default_trajectory(seed=5)
    t0, t1 = 0.3, 0.8
    _, gyro, acc, dts = _segment(traj, t0, t1)
    pre = pre_mod.preintegrate(
        jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
        jnp.asarray(dts, jnp.float32), jnp.ones(len(dts), bool),
    )
    # groundtruth deltas
    Ri, pi = traj.pose_wb(t0)
    Rj, pj = traj.pose_wb(t1)
    h = 1e-4
    vi = (traj.position(t0 + h) - traj.position(t0 - h)) / (2 * h)
    vj = (traj.position(t1 + h) - traj.position(t1 - h)) / (2 * h)
    dt = t1 - t0
    g = synthetic.GRAVITY

    dR_gt = Ri.T @ Rj
    dv_gt = Ri.T @ (vj - vi - g * dt)
    dp_gt = Ri.T @ (pj - pi - vi * dt - 0.5 * g * dt * dt)

    np.testing.assert_allclose(np.asarray(pre.dR), dR_gt, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pre.dv), dv_gt, atol=2e-2)
    np.testing.assert_allclose(np.asarray(pre.dp), dp_gt, atol=1e-2)
    assert abs(float(pre.dt) - dt) < 1e-6


def test_preintegration_mask_stops_integration():
    traj = synthetic.default_trajectory(seed=6)
    _, gyro, acc, dts = _segment(traj, 0.0, 0.5)
    m = np.ones(len(dts), bool)
    m[50:] = False  # only first 50 samples count
    pre_masked = pre_mod.preintegrate(
        jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
        jnp.asarray(dts, jnp.float32), jnp.asarray(m),
    )
    pre_trunc = pre_mod.preintegrate(
        jnp.asarray(gyro[:50], jnp.float32), jnp.asarray(acc[:50], jnp.float32),
        jnp.asarray(dts[:50], jnp.float32), jnp.ones(50, bool),
    )
    np.testing.assert_allclose(
        np.asarray(pre_masked.dp), np.asarray(pre_trunc.dp), atol=1e-6
    )
    np.testing.assert_allclose(float(pre_masked.dt), float(pre_trunc.dt), atol=1e-9)


def test_bias_jacobian_first_order():
    traj = synthetic.default_trajectory(seed=7)
    _, gyro, acc, dts = _segment(traj, 0.0, 0.4)
    g32 = jnp.asarray(gyro, jnp.float32)
    a32 = jnp.asarray(acc, jnp.float32)
    d32 = jnp.asarray(dts, jnp.float32)
    m = jnp.ones(len(dts), bool)

    pre0 = pre_mod.preintegrate(g32, a32, d32, m)
    dbg = jnp.asarray([0.004, -0.003, 0.002])
    dba = jnp.asarray([0.03, -0.02, 0.04])
    # exact re-integration at shifted bias
    pre1 = pre_mod.preintegrate(g32, a32, d32, m, bg=dbg, ba=dba)
    # first-order correction from pre0
    dR_c, dv_c, dp_c = pre_mod.bias_corrected(pre0, dbg, dba)
    np.testing.assert_allclose(np.asarray(dR_c), np.asarray(pre1.dR), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dv_c), np.asarray(pre1.dv), atol=5e-3)
    np.testing.assert_allclose(np.asarray(dp_c), np.asarray(pre1.dp), atol=2e-3)


def test_residual_zero_at_groundtruth():
    traj = synthetic.default_trajectory(seed=8)
    t0, t1 = 0.1, 0.45
    _, gyro, acc, dts = _segment(traj, t0, t1)
    pre = pre_mod.preintegrate(
        jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
        jnp.asarray(dts, jnp.float32), jnp.ones(len(dts), bool),
    )
    h = 1e-4
    Ri, pi = traj.pose_wb(t0)
    Rj, pj = traj.pose_wb(t1)
    vi = (traj.position(t0 + h) - traj.position(t0 - h)) / (2 * h)
    vj = (traj.position(t1 + h) - traj.position(t1 - h)) / (2 * h)
    r = pre_mod.residual(
        pre,
        jnp.asarray(Ri, jnp.float32), jnp.asarray(pi, jnp.float32),
        jnp.asarray(vi, jnp.float32),
        jnp.asarray(Rj, jnp.float32), jnp.asarray(pj, jnp.float32),
        jnp.asarray(vj, jnp.float32),
        jnp.zeros(3), jnp.zeros(3),
    )
    assert np.abs(np.asarray(r)).max() < 2e-2


def test_vi_init_recovers_scale_gravity_bias():
    traj = synthetic.default_trajectory(seed=9)
    K = 10
    kf_dt = 0.5
    kf_times = np.arange(K) * kf_dt + 0.1
    rate = 200.0
    true_bg = np.array([0.02, -0.01, 0.015])
    true_scale = 2.5  # visual map shrunk by this factor

    pres = []
    for i in range(K - 1):
        _, gyro, acc, dts = _segment(
            traj, kf_times[i], kf_times[i + 1], rate=rate,
            gyro_bias=true_bg, gyro_noise=1e-4, acc_noise=1e-3, seed=i,
        )
        n = len(dts)
        pres.append(
            pre_mod.preintegrate(
                jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
                jnp.asarray(dts, jnp.float32), jnp.ones(n, bool),
            )
        )
    # pad to common length? all segments equal length here
    pres_stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *pres
    )

    # visual poses: true poses with positions scaled DOWN by true_scale and
    # world rotated (gravity direction unknown to the initializer)
    phi_w = np.array([0.12, -0.2, 0.0])
    R_pert = np.asarray(lie.so3_exp(jnp.asarray(phi_w, jnp.float32)))
    R_wb_t, p_wb_t = traj.pose_wb(kf_times)
    R_wb_vis = jnp.asarray(
        np.einsum("ij,kjl->kil", R_pert.T, R_wb_t), jnp.float32
    )
    p_wb_vis = jnp.asarray(
        np.einsum("ij,kj->ki", R_pert.T, p_wb_t) / true_scale, jnp.float32
    )

    out = vi_init.vi_init(pres_stacked, R_wb_vis, p_wb_vis)
    assert abs(float(out.scale) - true_scale) / true_scale < 0.03, float(out.scale)
    np.testing.assert_allclose(np.asarray(out.bg), true_bg, atol=3e-3)
    # gravity direction: R_wg @ g0 should match the rotated-world gravity
    g_est = np.asarray(out.R_wg) @ np.array([0, 0, -9.81])
    g_true = R_pert.T @ np.array([0, 0, -9.81])
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert cos > 0.9995, cos
