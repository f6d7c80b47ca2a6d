"""End-to-end stereo SLAM on rendered left/right pairs → metric ATE.

Stereo tracks metric scale (landmarks at fx·b/d depth), so ATE is evaluated
WITHOUT Sim3 scale alignment — rigid alignment only."""

import os

import numpy as np
import pytest

from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.runtime.system import Sensor, System, TrackingState

SETTINGS = os.path.join(os.path.dirname(__file__), "data", "synth_stereo.yaml")
BASELINE = 0.12


@pytest.fixture(scope="module")
def rendered():
    return synthetic.render_sequence(
        n_frames=30, width=320, height=240, fx=260.0, fy=260.0,
        fps=10.0, seed=2, plane_depths=(5.0, 8.0), traj_scale=1.4,
        stereo_baseline=BASELINE,
    )


def test_e2e_stereo_metric_scale(rendered):
    imgs_l, imgs_r, R_gt, t_gt, ts = rendered
    sys_ = System(None, SETTINGS, Sensor.STEREO)
    for k in range(imgs_l.shape[0]):
        sys_.track_stereo(imgs_l[k], imgs_r[k], float(ts[k]))

    assert sys_.get_tracking_state() == TrackingState.OK
    est, gt = [], []
    for k, (t, T) in enumerate(sys_.get_trajectory()):
        if sys_.tracking_log[k]["state"] != int(TrackingState.OK):
            continue
        est.append(-T[:3, :3].T @ T[:3, 3])
        gt.append(-R_gt[k].T @ t_gt[k])
    assert len(est) > 15
    est = np.asarray(est)
    gt = np.asarray(gt)
    # metric check: trajectory LENGTHS must agree without scale alignment
    len_est = np.linalg.norm(np.diff(est, axis=0), axis=1).sum()
    len_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert len_gt > 0.3
    assert abs(len_est - len_gt) / len_gt < 0.12, (len_est, len_gt)
    ate = synthetic.ate_rmse(est, gt, align=True)
    assert ate < 0.08, f"stereo ATE {ate:.4f} m"
