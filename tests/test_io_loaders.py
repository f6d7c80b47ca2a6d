"""Dataset-loader + calibration-sync tests (KITTI layout, IMU resampling)."""

import os

import numpy as np

from orb_slam3_ros2_tpu.io import imu_sync, kitti


def _write_kitti(tmp_path, seq="07", n=5):
    seq_dir = tmp_path / "sequences" / seq
    (seq_dir / "image_0").mkdir(parents=True)
    (seq_dir / "image_1").mkdir(parents=True)
    times = np.arange(n) * 0.1
    np.savetxt(seq_dir / "times.txt", times, fmt="%.6f")
    poses_dir = tmp_path / "poses"
    poses_dir.mkdir()
    P = np.zeros((n, 3, 4))
    for k in range(n):
        P[k, :, :3] = np.eye(3)
        P[k, :, 3] = [k * 0.5, 0.0, k * 0.1]
    np.savetxt(poses_dir / f"{seq}.txt", P.reshape(n, 12), fmt="%.6f")
    return tmp_path


def test_kitti_loader_frames_and_gt(tmp_path):
    root = _write_kitti(tmp_path)
    seq = kitti.load_sequence(str(root), "07")
    assert len(seq.frames) == 5
    assert seq.frames[3].t == 0.3
    assert seq.frames[0].path.endswith(
        os.path.join("sequences", "07", "image_0", "000000.png")
    )
    assert seq.frames[0].path_right is None
    np.testing.assert_allclose(seq.gt_p[4], [2.0, 0.0, 0.4])
    assert len(seq.imu_t) == 0  # odometry benchmark has no IMU

    st = kitti.load_sequence(str(root), "07", stereo=True)
    assert st.frames[2].path_right.endswith("image_1/000002.png")


def test_imu_sync_interpolation_and_csv(tmp_path):
    # accel at 100 Hz, gyro at 200 Hz over ~1 s; linear accel signal so the
    # interpolation is exact
    acc_t = np.arange(0.0, 1.0, 0.01)
    acc = np.stack([acc_t * 2.0, -acc_t, np.full_like(acc_t, 9.81)], axis=-1)
    gyro_t = np.arange(-0.01, 1.01, 0.005)  # extends past both accel ends
    gyro = np.stack(
        [np.sin(gyro_t), np.cos(gyro_t), gyro_t * 0.1], axis=-1
    )
    t, g, a = imu_sync.interpolate_acc_at_gyro(gyro_t, gyro, acc_t, acc)
    assert t[0] >= acc_t[0] and t[-1] <= acc_t[-1]
    np.testing.assert_allclose(a[:, 0], t * 2.0, atol=1e-12)
    np.testing.assert_allclose(a[:, 2], 9.81, atol=1e-12)
    np.testing.assert_allclose(g[:, 2], t * 0.1, atol=1e-12)

    out = tmp_path / "imu0.csv"
    imu_sync.save_euroc_imu_csv(str(out), t, g, a)
    lines = out.read_text().strip().split("\n")
    assert lines[0].startswith("#timestamp [ns]")
    first = lines[1].split(",")
    assert len(first) == 7
    assert int(first[0]) == int(round(t[0] * 1e9))
