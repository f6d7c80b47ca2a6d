"""Host output products: filters, grids, PCD/PGM round trips."""

import numpy as np

from orb_slam3_ros2_tpu.runtime import outputs


def test_sor_and_radius_filter_removes_outliers():
    rng = np.random.default_rng(0)
    cluster = rng.normal(0, 0.05, (500, 3))
    outliers = rng.uniform(5, 10, (20, 3))
    pts = np.concatenate([cluster, outliers])
    filtered = outputs.filter_point_cloud(pts)
    assert len(filtered) >= 400
    assert (np.linalg.norm(filtered, axis=1) < 1.0).all()


def test_occupancy_grid_rasterization():
    pts = np.array([[0.0, 0.0, 0.0], [1.0, 0.5, 0.0], [0.52, 0.26, 0.0]])
    grid, origin = outputs.point_cloud_to_occupancy_grid(pts, resolution=0.05)
    assert origin == (0.0, 0.0)
    assert grid[0, 0] == 100
    assert grid[int(0.5 / 0.05), int(1.0 / 0.05)] == 100
    assert grid[int(0.26 / 0.05), int(0.52 / 0.05)] == 100
    assert (grid == 100).sum() == 3


def test_pcd_roundtrip(tmp_path):
    pts = np.asarray([[1.5, -2.0, 3.25], [0.0, 0.1, 0.2]], np.float32)
    p = str(tmp_path / "cloud" / "c.pcd")
    outputs.save_pcd(p, pts)
    back = outputs.load_pcd(p)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_pgm_yaml_artifacts(tmp_path):
    grid = np.full((4, 6), -1, np.int8)
    grid[1, 2] = 100
    grid[0, 0] = 0
    base = str(tmp_path / "grid" / "map")
    outputs.save_occupancy_grid(base, grid, (1.0, 2.0))
    with open(base + ".pgm", "rb") as f:
        header = f.readline().strip()
        dims = f.readline().split()
        _ = f.readline()
        data = f.read()
    assert header == b"P5"
    assert [int(x) for x in dims] == [6, 4]
    img = np.frombuffer(data, np.uint8).reshape(4, 6)[::-1]
    assert img[1, 2] == 0  # occupied -> black
    assert img[0, 0] == 254  # free -> white
    assert img[2, 3] == 205  # unknown -> gray
    with open(base + ".yaml") as f:
        y = f.read()
    assert "occupied_thresh: 0.65" in y
    assert "free_thresh: 0.196" in y
    assert "resolution: 0.05" in y


def test_annotate_frame_shapes():
    img = np.zeros((120, 160), np.uint8)
    uv = np.array([[10.0, 20.0], [150.0, 100.0]])
    vis = outputs.annotate_frame(img, uv, np.array([True, True]))
    assert vis.shape == (120, 160, 3)
    assert vis.sum() > 0


def test_native_filter_matches_scipy_oracle():
    """native/pcl_filters.cpp must keep exactly the same points as the
    scipy KD-tree path (identical SOR + radius semantics)."""
    from orb_slam3_ros2_tpu.runtime import outputs

    if outputs._native_filter() is None:
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    # dense cluster + sparse outliers so both stages actually cut
    pts = np.concatenate([
        rng.normal(0, 0.3, (800, 3)),
        rng.uniform(-8, 8, (60, 3)),
    ]).astype(np.float32)
    got = outputs.filter_point_cloud(pts, sor_mean_k=30, sor_stddev=0.5,
                                     radius=0.15, min_neighbors=4,
                                     native=True)
    want = outputs.filter_point_cloud(pts, sor_mean_k=30, sor_stddev=0.5,
                                      radius=0.15, min_neighbors=4,
                                      native=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0)
    assert 0 < len(got) < len(pts)


def test_kitti_trajectory_export(tmp_path):
    """KITTI 3x4 [R|t] rows, world-from-camera (SaveTrajectoryKITTI)."""
    from orb_slam3_ros2_tpu.io import synthetic
    from orb_slam3_ros2_tpu.runtime.session import SlamSession
    from orb_slam3_ros2_tpu.runtime.system import Sensor

    images, R_gt, t_gt, ts = synthetic.render_sequence(
        n_frames=12, width=320, height=240, fx=260.0, fy=260.0,
        fps=10.0, seed=1, traj_scale=1.6,
    )
    sess = SlamSession("tests/data/synth_cam.yaml", Sensor.MONOCULAR,
                       output_name="kitti_t", output_root=str(tmp_path))
    for k in range(images.shape[0]):
        sess.feed(images[k], float(ts[k]))
    path = sess.save_trajectory_kitti()
    rows = np.loadtxt(path)
    assert rows.shape[1] == 12
    # each row is a valid rotation | translation
    M = rows[-1].reshape(3, 4)
    np.testing.assert_allclose(M[:, :3] @ M[:, :3].T, np.eye(3), atol=1e-4)
