"""mcap storage for rosbag2 bags: writer/reader round-trip + dispatch.

rosbag2's newer default storage is mcap; the reference replays whatever
storage was recorded (`launch/mapping.launch.py:167-190`), so current-era
bags must open through the same `Rosbag2Reader` interface. The fixture is
written by our own minimal `McapWriter` (magic + Schema/Channel/Message
framing, uncompressed), so the test is fully self-contained."""

import os
import struct

import numpy as np

from orb_slam3_ros2_tpu.io import rosbag


def _write_fixture(bag_dir, chunked=False):
    w = rosbag.McapWriter(bag_dir)
    w.add_topic("/camera/image_raw", "sensor_msgs/msg/Image")
    w.add_topic("/camera/imu", "sensor_msgs/msg/Imu")
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (32, 40)).astype(np.float32)
            for _ in range(3)]
    for k, img in enumerate(imgs):
        for j in range(4):
            t_imu = 0.05 + 0.1 * k + 0.025 * j
            w.write("/camera/imu", t_imu,
                    rosbag.encode_imu([0.01 * j, 0, 0], [0, 0, 9.8], t_imu))
        w.write("/camera/image_raw", 0.1 + 0.1 * k,
                rosbag.encode_image(img, 0.1 + 0.1 * k))
    w.close()
    return imgs, w.path


def test_mcap_write_read_roundtrip(tmp_path):
    bag_dir = str(tmp_path / "bag")
    imgs, path = _write_fixture(bag_dir)
    assert path.endswith(".mcap") and os.path.isfile(path)

    # directory dispatch: Rosbag2Reader must return an McapReader
    r = rosbag.Rosbag2Reader(bag_dir)
    assert isinstance(r, rosbag.McapReader)
    assert set(r.topic_names()) == {"/camera/image_raw", "/camera/imu"}
    img_topic, imu_topic = r.guess_topics()
    assert img_topic == "/camera/image_raw"
    assert imu_topic == "/camera/imu"

    msgs = list(r.messages([img_topic, imu_topic]))
    assert len(msgs) == 15  # 3 images + 12 imu
    times = [t for _, t, _ in msgs]
    assert times == sorted(times)
    got_imgs = [m.data for n, _, m in msgs if n == img_topic]
    assert len(got_imgs) == 3
    np.testing.assert_array_equal(got_imgs[1], imgs[1])
    imu = [m for n, _, m in msgs if n == imu_topic]
    np.testing.assert_allclose(imu[3].gyro, [0.03, 0, 0])

    # file-path dispatch too
    r2 = rosbag.Rosbag2Reader(path)
    assert isinstance(r2, rosbag.McapReader)
    assert len(list(r2.messages(["/camera/imu"]))) == 12


def test_mcap_chunked_uncompressed(tmp_path):
    """A bag whose messages live inside an UNCOMPRESSED Chunk record (the
    layout stock rosbag2 writes with chunking on, minus compression)."""
    bag_dir = str(tmp_path / "bagc")
    imgs, path = _write_fixture(bag_dir)
    # rewrap: read raw records, move Message records into one Chunk
    with open(path, "rb") as f:
        data = f.read()
    body = data[len(rosbag._MCAP_MAGIC):]
    head, msgs = [], []
    off = 0
    while off + 9 <= len(body):
        op = body[off]
        ln = struct.unpack_from("<Q", body, off + 1)[0]
        rec = body[off: off + 9 + ln]
        off += 9 + ln
        if op == 0x05:
            msgs.append(rec)
        elif op in (0x01, 0x03, 0x04):
            head.append(rec)
    records = b"".join(msgs)
    chunk_body = (struct.pack("<QQQI", 0, 0, len(records), 0)
                  + rosbag.McapWriter._s("")
                  + struct.pack("<Q", len(records)) + records)
    chunk = bytes([0x06]) + struct.pack("<Q", len(chunk_body)) + chunk_body
    # DataEnd body is a single uint32 crc
    out = (rosbag._MCAP_MAGIC + b"".join(head) + chunk
           + bytes([0x0F]) + struct.pack("<Q", 4) + struct.pack("<I", 0)
           + rosbag._MCAP_MAGIC)
    p2 = os.path.join(bag_dir, "chunked_0.mcap")
    with open(p2, "w+b") as f:
        f.write(out)
    r = rosbag.McapReader(p2)
    msgs2 = list(r.messages(["/camera/image_raw"]))
    assert len(msgs2) == 3
    np.testing.assert_array_equal(msgs2[2][2].data, imgs[2])
