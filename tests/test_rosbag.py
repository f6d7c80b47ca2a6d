"""rosbag2 sqlite reader/writer: CDR round-trips + bag replay e2e.

The reference replays recorded bags through its live stack
(`launch/mapping.launch.py:167-190`); io/rosbag.py provides that capability
without ROS. The writer is validated against the reader (and both against
the CDR alignment rules), then a rendered sequence is replayed through the
engine straight from a bag."""

import os

import numpy as np
import pytest

from orb_slam3_ros2_tpu.io import rosbag, synthetic

SETTINGS = os.path.join(os.path.dirname(__file__), "data", "synth_cam.yaml")


def test_cdr_image_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 64)).astype(np.float32)
    payload = rosbag.encode_image(img, t=12.3456789, frame_id="cam0")
    msg = rosbag.decode_image(payload)
    assert msg.frame_id == "cam0"
    assert abs(msg.t - 12.3456789) < 1e-6
    np.testing.assert_array_equal(msg.data, img)


def test_cdr_imu_roundtrip_alignment():
    # odd-length frame_id forces 8-byte alignment padding before the
    # quaternion doubles — the classic CDR decode bug
    gyro = np.array([0.1, -0.2, 0.3])
    acc = np.array([9.5, 0.01, -0.02])
    payload = rosbag.encode_imu(gyro, acc, t=5.5, frame_id="imu_link")
    msg = rosbag.decode_imu(payload)
    np.testing.assert_allclose(msg.gyro, gyro)
    np.testing.assert_allclose(msg.acc, acc)
    np.testing.assert_allclose(msg.quat, [0, 0, 0, 1])
    assert abs(msg.t - 5.5) < 1e-6


def test_bag_write_read(tmp_path):
    bag_dir = str(tmp_path / "bag")
    w = rosbag.Rosbag2Writer(bag_dir)
    w.add_topic("/camera/image_raw", "sensor_msgs/msg/Image")
    w.add_topic("/camera/imu", "sensor_msgs/msg/Imu")
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (32, 40)).astype(np.float32)
            for _ in range(3)]
    for k, img in enumerate(imgs):
        for j in range(4):
            t_imu = 0.05 + 0.1 * k + 0.025 * j
            w.write("/camera/imu",  t_imu,
                    rosbag.encode_imu([0.01 * j, 0, 0], [0, 0, 9.8], t_imu))
        w.write("/camera/image_raw", 0.1 + 0.1 * k,
                rosbag.encode_image(img, 0.1 + 0.1 * k))
    w.close()
    assert os.path.isfile(os.path.join(bag_dir, "metadata.yaml"))

    r = rosbag.Rosbag2Reader(bag_dir)
    assert set(r.topic_names()) == {"/camera/image_raw", "/camera/imu"}
    g_img, g_imu = r.guess_topics()
    assert g_img == "/camera/image_raw" and g_imu == "/camera/imu"

    n_img = n_imu = 0
    last_t = -1.0
    for name, bag_t, msg in r.messages([g_img, g_imu]):
        assert bag_t >= last_t  # time-ordered interleave
        last_t = bag_t
        if name == g_img:
            np.testing.assert_array_equal(msg.data, imgs[n_img])
            n_img += 1
        else:
            n_imu += 1
    assert n_img == 3 and n_imu == 12


def test_decode_rgb_and_16bit():
    rng = np.random.default_rng(2)
    # rgb8 via hand-built CDR (writer only emits mono8)
    h, w = 8, 10
    rgb = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    c = rosbag.CdrWriter()
    c.header(1.0, "cam")
    c.uint32(h)
    c.uint32(w)
    c.string("rgb8")
    c.uint8(0)
    c.uint32(w * 3)
    c.bytes_seq(rgb.tobytes())
    msg = rosbag.decode_image(c.tobytes())
    expect = rgb.astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                               np.float32)
    np.testing.assert_allclose(msg.data, expect, atol=1e-3)

    d16 = rng.integers(0, 65535, (h, w)).astype(np.uint16)
    c = rosbag.CdrWriter()
    c.header(2.0, "cam")
    c.uint32(h)
    c.uint32(w)
    c.string("mono16")
    c.uint8(0)
    c.uint32(w * 2)
    c.bytes_seq(d16.tobytes())
    msg = rosbag.decode_image(c.tobytes())
    np.testing.assert_allclose(msg.data, d16 / 257.0, atol=1e-3)


@pytest.mark.slow
def test_replay_bag_through_engine(tmp_path):
    from orb_slam3_ros2_tpu.runtime.system import Sensor, System

    n_frames = 25
    images, R_gt, t_gt, ts = synthetic.render_sequence(
        n_frames=n_frames, width=320, height=240, fx=260.0, fy=260.0,
        fps=10.0, seed=1)
    bag_dir = str(tmp_path / "bag")
    w = rosbag.Rosbag2Writer(bag_dir)
    w.add_topic("/image_rect", "sensor_msgs/msg/Image")
    for k in range(n_frames):
        w.write("/image_rect", float(ts[k]) + 1.0,
                rosbag.encode_image(images[k], float(ts[k]) + 1.0))
    w.close()

    sys_ = System(None, SETTINGS, Sensor.MONOCULAR)
    out = rosbag.replay_bag(sys_, bag_dir)
    assert len(out) == n_frames
    ok = sum(1 for rec in sys_.tracking_log if rec["state"] == 1)
    assert ok > n_frames // 2, f"only {ok} tracked frames"
