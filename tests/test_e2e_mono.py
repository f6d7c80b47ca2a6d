"""End-to-end monocular SLAM on a rendered synthetic sequence → ATE.

This is the framework's equivalent of the reference's de-facto validation
(live/rosbag replay + eyeball, SURVEY.md §4) made quantitative: known
groundtruth trajectory, Sim3-aligned ATE threshold.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_ros2_tpu.atlas import map_state as ms
from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.runtime.system import Sensor, System, TrackingState

SETTINGS = os.path.join(os.path.dirname(__file__), "data", "synth_cam.yaml")


@pytest.fixture(scope="module")
def rendered():
    return synthetic.render_sequence(
        n_frames=40, width=320, height=240, fx=260.0, fy=260.0,
        fps=10.0, seed=1, plane_depths=(6.0, 9.0), traj_scale=1.6,
    )


def make_system():
    return System(
        None, SETTINGS, Sensor.MONOCULAR,
        map_cfg=None,
    )


def test_e2e_mono_tracks_and_ate(rendered):
    images, R_cw_gt, t_cw_gt, ts = rendered
    sys_ = make_system()
    for k in range(images.shape[0]):
        sys_.track_monocular(images[k], float(ts[k]))

    assert sys_.get_tracking_state() == TrackingState.OK
    n_kf = int(sys_.map.n_kf)
    assert n_kf >= 4, f"only {n_kf} keyframes"
    n_lm = int(np.asarray(sys_.map.lm_valid).sum())
    assert n_lm > 100, f"only {n_lm} landmarks"

    # ATE on camera centers over tracked frames (Sim3-aligned: mono scale
    # free), scored on the EXPORT surface get_frame_trajectory() — frames
    # re-expressed against their reference keyframes' final poses, the
    # reference's SaveTrajectoryTUM semantics. The raw online trajectory
    # keeps a looser sanity bound: the initializer's global parallax gate
    # (r5; upstream minParallax) starts this slow clip ~8 frames later, so
    # the young-map wobble right after init weighs more in the raw poses —
    # the same gate that fixed the 15x mono collapse on hard seed-2.
    def centers(traj):
        est, gt = [], []
        for k, (t, T) in enumerate(traj):
            if sys_.tracking_log[k]["state"] != int(TrackingState.OK):
                continue
            R, tt = T[:3, :3], T[:3, 3]
            est.append(-R.T @ tt)
            gt.append(-R_cw_gt[k].T @ t_cw_gt[k])
        return np.array(est), np.array(gt)

    est, gt = centers(sys_.get_frame_trajectory())
    assert len(est) > 20, "too few tracked frames"
    ate = synthetic.ate_rmse(est, gt)
    assert ate < 0.05, f"ATE {ate:.4f} m"
    est_raw, gt_raw = centers(sys_.get_trajectory())
    ate_raw = synthetic.ate_rmse(est_raw, gt_raw)
    assert ate_raw < 0.12, f"raw online ATE {ate_raw:.4f} m"


def test_e2e_map_pcl_snapshot(rendered):
    images, _, _, ts = rendered
    sys_ = make_system()
    for k in range(20):
        sys_.track_monocular(images[k], float(ts[k]))
    pcl = sys_.get_map_pcl()
    assert pcl.ndim == 2 and pcl.shape[1] == 3
    if sys_.get_tracking_state() == TrackingState.OK:
        assert len(pcl) > 50
