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


def test_tum_rgbd_loader(tmp_path):
    """TUM RGB-D layout: nearest-timestamp rgb/depth association, 16-bit
    depth at 5000 units/m, groundtruth positions."""
    import cv2

    from orb_slam3_ros2_tpu.io import tum_rgbd

    root = tmp_path / "fr1"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rng = np.random.default_rng(0)
    rgb_rows, depth_rows = [], []
    for i, t in enumerate([1.00, 1.05, 1.10, 1.15]):
        name = f"rgb/{t:.6f}.png"
        cv2.imwrite(str(root / name),
                    rng.integers(0, 255, (24, 32), dtype=np.uint8))
        rgb_rows.append(f"{t:.6f} {name}")
    # depth stream offset by 6 ms; one rgb frame (1.15) gets no partner
    for t in [1.006, 1.056, 1.106]:
        name = f"depth/{t:.6f}.png"
        d16 = np.full((24, 32), int(2.5 * 5000), np.uint16)
        cv2.imwrite(str(root / name), d16)
        depth_rows.append(f"{t:.6f} {name}")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_rows) + "\n")
    (root / "depth.txt").write_text("\n".join(depth_rows) + "\n")
    (root / "groundtruth.txt").write_text(
        "# gt\n1.00 0 0 0 0 0 0 1\n1.10 1 0 0 0 0 0 1\n"
    )

    seq = tum_rgbd.load_sequence(str(root), max_dt=0.02)
    assert len(seq.frames) == 3  # the 1.15 frame has no depth within 20 ms
    img, depth = seq.frames[0].load()
    assert img.shape == (24, 32) and img.dtype == np.float32
    np.testing.assert_allclose(depth, 2.5, atol=1e-4)
    np.testing.assert_allclose(seq.gt_at(1.10), [1, 0, 0])
