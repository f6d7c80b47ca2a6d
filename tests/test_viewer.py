"""Live web viewer (E12 Pangolin-equivalent): page + state snapshot."""

import json
import urllib.request

import numpy as np

from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.runtime.system import Sensor, System
from orb_slam3_ros2_tpu.runtime.viewer import LiveViewer

SETTINGS = "tests/data/synth_cam.yaml"


def test_viewer_serves_page_and_state():
    sys_ = System(None, SETTINGS, Sensor.MONOCULAR)
    images, R_gt, t_gt, ts = synthetic.render_sequence(
        n_frames=14, width=320, height=240, fx=260.0, fy=260.0,
        fps=10.0, seed=1, traj_scale=1.6,
    )
    for k in range(images.shape[0]):
        sys_.track_monocular(images[k], float(ts[k]))

    v = LiveViewer(sys_, port=0)  # ephemeral port
    try:
        base = f"http://127.0.0.1:{v.port}"
        page = urllib.request.urlopen(f"{base}/", timeout=10).read()
        assert b"tpu-slam live viewer" in page
        d = json.loads(
            urllib.request.urlopen(f"{base}/state.json", timeout=10).read()
        )
        assert d["state"] == "OK"
        assert d["n_keyframes"] >= 2
        assert d["n_landmarks"] > 50
        assert len(d["trajectory"]) == images.shape[0]
        assert len(d["center"]) == 3
        assert len(d["points"]) == d["n_landmarks"] or d["points"]
        # trajectory points are finite 3-vectors
        assert np.isfinite(np.asarray(d["trajectory"])).all()
    finally:
        v.close()
