"""End-to-end RGB-D SLAM on rendered image+depth pairs → metric ATE.

Upstream `TrackRGBD` parity: depth sampled at keypoints spawns metric
landmarks, so scale is observable from frame one — ATE is checked without
scale alignment on trajectory length."""

import os

import numpy as np
import pytest

from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.runtime.system import Sensor, System, TrackingState

SETTINGS = os.path.join(os.path.dirname(__file__), "data", "synth_cam.yaml")


@pytest.fixture(scope="module")
def rendered():
    return synthetic.render_sequence(
        n_frames=30, width=320, height=240, fx=260.0, fy=260.0,
        fps=10.0, seed=2, plane_depths=(5.0, 8.0), traj_scale=1.4,
        return_depth=True,
    )


def test_depth_maps_consistent_with_planes(rendered):
    imgs, depths, R_gt, t_gt, ts = rendered
    # frame 0 depth values must lie between just-below-nearest and farthest
    d = depths[0][depths[0] > 0]
    assert d.min() > 3.0 and d.max() < 10.0
    # center pixel: analytic depth = (Z - c_z) / ray_z for the visible plane
    assert np.isfinite(depths).all()


def test_e2e_rgbd_metric_scale(rendered):
    imgs, depths, R_gt, t_gt, ts = rendered
    sys_ = System(None, SETTINGS, Sensor.RGBD)
    for k in range(imgs.shape[0]):
        sys_.track_rgbd(imgs[k], depths[k], float(ts[k]))

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
    # metric: trajectory lengths agree WITHOUT scale alignment
    len_est = np.linalg.norm(np.diff(est, axis=0), axis=1).sum()
    len_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert len_gt > 0.3
    assert abs(len_est - len_gt) / len_gt < 0.1, (len_est, len_gt)
    ate = synthetic.ate_rmse(est, gt, align=True)
    assert ate < 0.08, f"rgbd ATE {ate:.4f} m"
