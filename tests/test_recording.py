"""Record/replay + live-source tests (reference rosbag + calibration-tooling
parity: `launch/mapping.launch.py:167-213`, `config/Calibration/`)."""

import os

import numpy as np
import pytest

from orb_slam3_ros2_tpu.io import euroc
from orb_slam3_ros2_tpu.io.recording import (
    RawRecorder,
    SequenceRecorder,
    process_raw_recording,
)


def test_sequence_recorder_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    rec = SequenceRecorder(str(tmp_path / "rec"))
    ts = [1.0, 1.05, 1.1]
    imgs = [rng.integers(0, 255, (24, 32), dtype=np.uint8) for _ in ts]
    for i, (img, t) in enumerate(zip(imgs, ts)):
        for k in range(4):  # 4 IMU samples per frame interval
            ti = t - 0.05 + 0.0125 * (k + 1)
            rec.add_imu(ti, [0.1 * i, 0, k], [0, 9.81, 0.01 * k])
        rec.add_frame(img, t)
        rec.add_groundtruth(t, [i, 2 * i, 0.0])
    root = rec.close()

    seq = euroc.load_sequence(root)
    assert len(seq.frames) == 3
    np.testing.assert_allclose([f.t for f in seq.frames], ts, atol=1e-9)
    np.testing.assert_array_equal(seq.frames[1].load(), imgs[1])
    assert seq.imu_t.shape == (12,)
    # imu_between respects the (t_prev, t_img] interleave contract
    tt, gg, aa = seq.imu_between(1.0, 1.05)
    assert len(tt) == 4 and np.all(tt > 1.0) and np.all(tt <= 1.05)
    np.testing.assert_allclose(gg[:, 0], 0.1, atol=1e-12)
    # groundtruth came back through the standard gt reader
    np.testing.assert_allclose(seq.gt_at(1.05), [1, 2, 0], atol=1e-9)


def test_raw_recorder_and_processing(tmp_path):
    """Raw (rate-mismatched) capture → EuRoC sequence, matching the
    reference gyro-rate accel-interpolation convention."""
    rng = np.random.default_rng(1)
    raw = RawRecorder(str(tmp_path / "raw"))
    # gyro 400 Hz, accel 250 Hz (D435i rates), 0.1 s
    gyro_t = np.arange(0, 0.1, 1 / 400)
    acc_t = np.arange(-0.004, 0.104, 1 / 250)
    acc_f = lambda t: np.stack([np.sin(20 * t), np.cos(20 * t), t], -1)
    for t in gyro_t:
        raw.add_gyro(t, [1.0, 2.0, 3.0])
    for t in acc_t:
        raw.add_acc(t, acc_f(t))
    for i, t in enumerate([0.0, 0.05]):
        raw.add_frame(rng.integers(0, 255, (16, 16), dtype=np.uint8), t)
    raw.close()

    out = process_raw_recording(str(tmp_path / "raw"), str(tmp_path / "proc"))
    seq = euroc.load_sequence(out)
    # output is at gyro rate, inside the accel time range
    assert len(seq.imu_t) == len(gyro_t)
    np.testing.assert_allclose(seq.imu_gyro, np.tile([1, 2, 3], (40, 1)))
    # linear interpolation of a smooth signal: close to the true curve
    np.testing.assert_allclose(seq.imu_acc, acc_f(seq.imu_t), atol=2e-3)
    assert len(seq.frames) == 2
    assert os.path.basename(seq.frames[0].path) == "0.png"


def test_camera_info_from_settings():
    from orb_slam3_ros2_tpu.runtime.cam_source import (
        camera_info_from_settings,
        rectified_info,
    )

    info = camera_info_from_settings("tests/data/synth_cam.yaml")
    assert (info.width, info.height) == (320, 240)
    np.testing.assert_allclose(
        info.k, [[260, 0, 160], [0, 260, 120], [0, 0, 1]]
    )
    assert not info.is_distorted
    r = rectified_info(info)
    np.testing.assert_allclose(r.k, info.k)
    np.testing.assert_allclose(r.d, 0.0)


def test_opencv_camera_source_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
              for _ in range(5)]
    for f in frames:
        w.write(f)
    w.release()

    from orb_slam3_ros2_tpu.runtime.cam_source import OpenCVCameraSource

    src = OpenCVCameraSource(path)
    got = list(src.frames())
    src.release()
    assert len(got) == 5
    img, t = got[0]
    assert img.shape == (48, 64) and img.dtype == np.uint8
    assert t > 0


def test_make_aprilgrid_roundtrip(tmp_path):
    """Generated calibration target (reference aprilgrid spec parity):
    every tag on the board must be detectable by the AprilTag detector."""
    cv2 = pytest.importorskip("cv2")
    import subprocess
    import sys as _sys

    out = str(tmp_path / "target")
    subprocess.run(
        [_sys.executable, "scripts/make_aprilgrid.py", "--out", out,
         "--cols", "4", "--rows", "3"],
        check=True, capture_output=True,
    )
    spec = open(f"{out}/aprilgrid.yaml").read()
    assert "aprilgrid" in spec and "tagCols: 4" in spec
    img = cv2.imread(f"{out}/aprilgrid.png", 0)
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    corners, ids, _ = cv2.aruco.ArucoDetector(d).detectMarkers(img)
    assert ids is not None and len(ids) == 12
    assert sorted(int(i) for i in ids.ravel()) == list(range(12))
