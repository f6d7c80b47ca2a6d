"""Post-loop inertial global BA (r2 verdict item 6).

Upstream runs FullInertialBA inside LoopClosing::RunGlobalBundleAdjustment
when the IMU is initialized; r2 skipped GBA entirely in inertial mode. The
scenario here reproduces the welded-map situation directly: a converged VI
session gets its trailing keyframes perturbed the way a pose-graph-only
loop correction leaves them (locally consistent, globally biased), then
`System._run_inertial_gba` must pull them back using the joint
reprojection + preintegration objective."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.runtime.system import (
    ImuPoint, Sensor, System, TrackingState,
)

SETTINGS = os.path.join(os.path.dirname(__file__), "data", "synth_cam.yaml")


def _run_vi_session(n_frames=70, seed=1):
    traj_scale = 1.6
    fps = 10.0
    images, R_gt, t_gt, ts = synthetic.render_sequence(
        n_frames=n_frames, width=320, height=240, fx=260.0, fy=260.0,
        fps=fps, seed=seed, plane_depths=(6.0, 9.0), traj_scale=traj_scale,
    )
    traj = synthetic.default_trajectory(seed=seed + 3, scale=traj_scale)
    imu_t, gyro, acc = synthetic.make_imu(
        traj, -0.02, ts[-1] + 0.01, rate=200.0,
        gyro_noise=2e-4, acc_noise=2e-3,
        gyro_bias=np.array([0.01, -0.008, 0.012]), seed=3,
    )
    sys_ = System(None, SETTINGS, Sensor.IMU_MONOCULAR)
    sys_.VI_INIT_KFS = 6
    t_prev = -1.0
    for k in range(n_frames):
        sel = (imu_t > t_prev) & (imu_t <= ts[k])
        imu = [ImuPoint(acc[i], gyro[i], imu_t[i]) for i in np.where(sel)[0]]
        sys_.track_monocular(images[k], float(ts[k]), imu)
        t_prev = ts[k]
    assert sys_.get_tracking_state() == TrackingState.OK
    assert sys_.is_imu_initialized()
    return sys_, R_gt, t_gt, ts


def _kf_ate(sys_, R_gt, t_gt, ts):
    n_kf = int(sys_.map.n_kf)
    kR = np.asarray(sys_.map.kf_R[:n_kf])
    kt = np.asarray(sys_.map.kf_t[:n_kf])
    centers, gt = [], []
    for i in range(n_kf):
        k = int(np.argmin(np.abs(ts - sys_.kf_times[i])))
        centers.append(-kR[i].T @ kt[i])
        gt.append(-R_gt[k].T @ t_gt[k])
    return synthetic.ate_rmse(np.asarray(centers), np.asarray(gt))


@pytest.mark.slow
def test_inertial_gba_reconverges_perturbed_tail():
    sys_, R_gt, t_gt, ts = _run_vi_session()
    ate_clean = _kf_ate(sys_, R_gt, t_gt, ts)

    # simulate the residual error a pose-graph-only correction leaves:
    # the trailing third of the keyframes drift coherently off the map
    n_kf = int(sys_.map.n_kf)
    assert n_kf >= 9
    tail = np.arange(2 * n_kf // 3, n_kf)
    rng = np.random.default_rng(0)
    xi = np.zeros((n_kf, 6), np.float32)
    for j, k in enumerate(tail):
        mag = (j + 1) / len(tail)
        xi[k, :3] = 0.25 * mag * rng.standard_normal(3)
        xi[k, 3:] = 0.04 * mag * rng.standard_normal(3)
    R_pert, t_pert = lie.se3_retract(
        sys_.map.kf_R[:n_kf], sys_.map.kf_t[:n_kf], jnp.asarray(xi)
    )
    sys_.map = sys_.map._replace(
        kf_R=sys_.map.kf_R.at[:n_kf].set(R_pert),
        kf_t=sys_.map.kf_t.at[:n_kf].set(t_pert),
    )
    ate_pert = _kf_ate(sys_, R_gt, t_gt, ts)
    assert ate_pert > 2.0 * ate_clean, (ate_pert, ate_clean)

    sys_._run_inertial_gba()
    ate_gba = _kf_ate(sys_, R_gt, t_gt, ts)
    # the joint VI objective must recover most of the planted error
    assert ate_gba < 0.5 * ate_pert, (ate_gba, ate_pert)
    assert ate_gba < 1.3 * ate_clean, (ate_gba, ate_clean)
    # velocities were refreshed for the optimized window
    assert sys_.v_cur is not None and np.isfinite(sys_.v_cur).all()
