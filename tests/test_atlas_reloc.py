"""Atlas-wide relocalization: a lost tracker recovers directly into an OLD
(non-active) map and resumes it, discarding the junk map spawned during the
blackout (upstream Tracking::Relocalization searches the KeyFrameDatabase
across the whole Atlas; round-1 searched only the active map)."""

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
        fps=10.0, seed=1, plane_depths=(6.0, 9.0), traj_scale=1.6,
    )


def test_reloc_into_first_map_discards_junk_map(rendered):
    images, R_cw_gt, t_cw_gt, ts = rendered
    sys_ = System(None, SETTINGS, Sensor.MONOCULAR)
    for k in range(images.shape[0]):
        sys_.track_monocular(images[k], float(ts[k]))
    assert sys_.get_tracking_state() == TrackingState.OK
    pose_at_10 = None
    for k, (t, T) in enumerate(sys_.get_trajectory()):
        if abs(t - float(ts[10])) < 1e-9:
            pose_at_10 = T
    assert pose_at_10 is not None

    # blackout: tracking dies, a junk map spawns
    sys_.state = TrackingState.LOST
    sys_.atlas.create_new_map()
    sys_._spawn_state_reset()
    sys_.state = TrackingState.LOST  # force the reloc path, not init
    assert sys_.atlas.n_maps() == 2
    assert sys_.atlas.active == 1

    # re-show a frame from the original scene: must recover into map 0
    T = sys_.track_monocular(images[10], float(ts[-1]) + 1.0)
    assert sys_.get_tracking_state() == TrackingState.OK
    assert sys_.atlas.active == 0
    assert sys_.atlas.n_maps() == 1  # empty junk map discarded
    # recovered pose matches the original track of that frame
    c_new = -T[:3, :3].T @ T[:3, 3]
    c_old = -pose_at_10[:3, :3].T @ pose_at_10[:3, 3]
    assert np.linalg.norm(c_new - c_old) < 0.1

    # the resumed map is protected: a later persistent loss freezes it
    # instead of discarding
    assert sys_._map_protected


def test_reloc_stays_lost_on_unseen_scene(rendered):
    images, _, _, ts = rendered
    sys_ = System(None, SETTINGS, Sensor.MONOCULAR)
    for k in range(20):
        sys_.track_monocular(images[k], float(ts[k]))
    assert sys_.get_tracking_state() == TrackingState.OK
    sys_.state = TrackingState.LOST
    sys_.atlas.create_new_map()
    sys_._spawn_state_reset()
    sys_.state = TrackingState.LOST
    # a blank frame matches nothing anywhere in the atlas
    blank = np.zeros_like(images[0])
    sys_.track_monocular(blank, float(ts[-1]) + 2.0)
    assert sys_.get_tracking_state() == TrackingState.LOST
    assert sys_.atlas.n_maps() == 2
