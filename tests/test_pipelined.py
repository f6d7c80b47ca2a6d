"""Latency-tolerant pipelined operating mode (System(pipelined=True)).

r3 verdict item 1: the orchestrated loop must not pay a blocking
host<->device round-trip per frame. In pipelined mode the per-frame device
program chains pose prediction on-device and the host consumes each
frame's packed summary ONE FRAME BEHIND via an async copy. These tests pin
the semantics: one trajectory record per frame, accuracy parity with the
staged loop, and sane keyframe production.
"""

import os
import tempfile

import numpy as np
import pytest

from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.runtime.system import Sensor, System, TrackingState

SETTINGS = os.path.join(os.path.dirname(__file__), "data", "synth_cam.yaml")


def _run(pipelined: bool, n=60):
    images, R_gt, t_gt, ts = synthetic.render_sequence(
        n_frames=n, width=320, height=240, fx=260.0, fy=260.0,
        fps=20.0, seed=1, traj_scale=1.0,
    )
    sys_ = System(None, SETTINGS, Sensor.MONOCULAR, pipelined=pipelined)
    for k in range(n):
        sys_.track_monocular(images[k], float(ts[k]))
    traj = sys_.get_frame_trajectory()
    est = np.stack([-T[:3, :3].T @ T[:3, 3] for _, T in traj])
    gt = np.stack([-R_gt[k].T @ t_gt[k] for k in range(n)])
    ok = np.array([st["state"] == int(TrackingState.OK)
                   for st in sys_.tracking_log])
    ate = synthetic.ate_rmse(est[ok], gt[ok])
    return sys_, float(ate), traj


def test_pipelined_record_per_frame():
    sys_, ate, traj = _run(True)
    assert len(traj) == 60
    assert len(sys_.tracking_log) == 60
    assert len(sys_.frame_refs) == 60
    # timestamps strictly increasing (consume-time appends stay in order)
    t = [x for x, _ in traj]
    assert all(b > a for a, b in zip(t, t[1:]))


def test_pipelined_matches_staged_accuracy():
    _, ate_staged, _ = _run(False)
    _, ate_piped, _ = _run(True)
    # one-frame-lagged keyframe decisions shift KF placement slightly; the
    # sequence-level accuracy must stay in the same regime
    assert ate_piped < max(2.0 * ate_staged, 0.08), (
        f"pipelined ATE {ate_piped} vs staged {ate_staged}")


def test_pipelined_keyframes_and_state():
    sys_, _, _ = _run(True)
    n_kf = int(sys_.map.n_kf)
    assert n_kf >= 5  # mapping kept running through the lagged decisions
    assert sys_.state == TrackingState.OK
