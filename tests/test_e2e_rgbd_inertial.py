"""End-to-end RGBD-inertial (IMU_RGBD): the sixth sensor mode of the
reference engine (`System::IMU_RGBD` [upstream]). Depth gives metric scale
from frame one, so VI init must accept scale ≈ 1 (fix_scale) and the fused
trajectory stays metric without alignment scale correction."""

import os

import numpy as np
import pytest

from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.runtime.system import (
    ImuPoint, Sensor, System, TrackingState,
)

SETTINGS = os.path.join(os.path.dirname(__file__), "data", "synth_cam.yaml")


@pytest.mark.slow
def test_e2e_rgbd_inertial():
    n_frames = 60
    seed = 2
    traj_scale = 1.4
    imgs, depths, R_gt, t_gt, ts = synthetic.render_sequence(
        n_frames=n_frames, width=320, height=240, fx=260.0, fy=260.0,
        fps=10.0, seed=seed, plane_depths=(5.0, 8.0),
        traj_scale=traj_scale, return_depth=True,
    )
    traj = synthetic.default_trajectory(seed=seed + 3, scale=traj_scale)
    true_bg = np.array([0.008, -0.006, 0.01])
    imu_t, gyro, acc = synthetic.make_imu(
        traj, -0.02, ts[-1] + 0.01, rate=200.0,
        gyro_noise=2e-4, acc_noise=2e-3, gyro_bias=true_bg, seed=5,
    )

    sys_ = System(None, SETTINGS, Sensor.IMU_RGBD)
    sys_.VI_INIT_KFS = 6
    t_prev = -1.0
    for k in range(n_frames):
        sel = (imu_t > t_prev) & (imu_t <= ts[k])
        imu = [ImuPoint(acc[i], gyro[i], imu_t[i]) for i in np.where(sel)[0]]
        sys_.track_rgbd(imgs[k], depths[k], float(ts[k]), imu)
        t_prev = ts[k]

    assert sys_.get_tracking_state() == TrackingState.OK
    assert sys_.is_imu_initialized(), "VI init never ran/accepted"
    assert np.linalg.norm(sys_.bg - true_bg) < 6e-3, sys_.bg

    est, gt = [], []
    for k, (t, T) in enumerate(sys_.get_frame_trajectory()):
        if sys_.tracking_log[k]["state"] != int(TrackingState.OK):
            continue
        est.append(-T[:3, :3].T @ T[:3, 3])
        gt.append(-R_gt[k].T @ t_gt[k])
    assert len(est) > 30
    est, gt = np.asarray(est), np.asarray(gt)
    len_est = np.linalg.norm(np.diff(est, axis=0), axis=1).sum()
    len_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert len_gt > 0.3
    assert abs(len_est - len_gt) / len_gt < 0.12, (len_est, len_gt)
    ate = synthetic.ate_rmse(est, gt, align=True)
    assert ate < 0.1, f"rgbd-inertial ATE {ate:.4f} m"
