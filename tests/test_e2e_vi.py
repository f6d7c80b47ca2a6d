"""End-to-end mono-inertial: VI initialization recovers metric scale.

Renders a synthetic sequence + consistent IMU (gravity, bias), runs
IMU_MONOCULAR mode, and checks the VIBA1 stage gates + metric scale —
the fork's observable surface (`GetInertialBA1/2`,
`/root/reference/src/imu_mono_realsense.cpp:485-495`)."""

import os

import numpy as np
import pytest

from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.runtime.system import (
    ImuPoint, Sensor, System, TrackingState,
)

SETTINGS = os.path.join(os.path.dirname(__file__), "data", "synth_cam.yaml")


@pytest.mark.slow
def test_e2e_vi_init_metric_scale():
    n_frames = 80
    seed = 1
    traj_scale = 1.6
    fps = 10.0
    images, R_gt, t_gt, ts = synthetic.render_sequence(
        n_frames=n_frames, width=320, height=240, fx=260.0, fy=260.0,
        fps=fps, seed=seed, plane_depths=(6.0, 9.0), traj_scale=traj_scale,
    )
    # the same analytic trajectory drives the IMU (body == camera frame)
    traj = synthetic.default_trajectory(seed=seed + 3, scale=traj_scale)
    true_bg = np.array([0.01, -0.008, 0.012])
    imu_t, gyro, acc = synthetic.make_imu(
        traj, -0.02, ts[-1] + 0.01, rate=200.0,
        gyro_noise=2e-4, acc_noise=2e-3, gyro_bias=true_bg, seed=3,
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
    assert sys_.is_imu_initialized(), "VI init never ran/accepted"
    assert sys_.get_inertial_ba1()
    # gyro bias direction/magnitude plausible. Tolerance is loose by design:
    # right after a ~2 s init window, visual KF-rotation drift maps 1:1 into
    # the bias estimate (upstream converges biases over tens of seconds of
    # continued local inertial BA; the init-stage estimate is coarse).
    np.testing.assert_allclose(sys_.bg, true_bg, atol=2e-2)

    # metric scale, NO scale alignment, on the EXPORT surface
    # (get_frame_trajectory — frames re-expressed against their reference
    # keyframes' FINAL poses, the reference's SaveTrajectoryTUM
    # semantics). The raw online poses right after the VI-init Sim3 are
    # turbulent (velocity reset + map rescale under the tracker) and a
    # LENGTH metric counts that jitter as distance — measured 3.8x
    # apparent scale over the first post-init second while the final map
    # itself was metric to a few percent. The export carries the
    # retroactive repair, which is what a consumer reads.
    est, gt = [], []
    for k, (t, T) in enumerate(sys_.get_frame_trajectory()):
        if sys_.tracking_log[k]["state"] != 1:
            continue
        if t < sys_.kf_times[min(len(sys_.kf_times) - 1,
                                 sys_.VI_INIT_KFS)]:
            continue  # only after VI init
        est.append(-T[:3, :3].T @ T[:3, 3])
        gt.append(-R_gt[k].T @ t_gt[k])
    est, gt = np.asarray(est), np.asarray(gt)
    assert len(est) > 20
    # PRIMARY: motion-weighted metric scale (Umeyama Sim3 scale est->gt).
    # A path-LENGTH ratio is biased high by per-frame pose jitter — at
    # this 320x240 far-plane config the ~2 cm/frame noise against ~7 cm
    # true steps inflates apparent length ~20% even when the map scale is
    # within a few percent of metric.
    s_uma = synthetic.umeyama_scale(est, gt)
    assert abs(s_uma - 1.0) < 0.10, s_uma
    # smoke bound on raw length (jitter-inflated, see above)
    len_est = np.linalg.norm(np.diff(est, axis=0), axis=1).sum()
    len_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert len_gt > 0.5
    assert abs(len_est - len_gt) / len_gt < 0.35, (len_est, len_gt)
