"""Camera models vs OpenCV oracle (projectPoints / fisheye.projectPoints)."""

import cv2
import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.models import cameras as cam_mod

EUROC_PINHOLE = dict(  # config/Monocular-Inertial/EuRoC.yaml:11-23 values
    fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
    width=752, height=480,
)
TUMVI_KB8 = dict(  # config/Stereo/TUM-VI.yaml:11-32 style values
    fx=190.978477, fy=190.973307, cx=254.931706, cy=256.897442,
    dist=(0.003482389402, 0.000715034845, -0.002053236141, 0.000202936736),
    width=512, height=512,
)


def _rand_points(n=200, seed=0, fov_limit=0.6):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-fov_limit, fov_limit, size=(n, 2))
    z = rng.uniform(0.5, 10.0, size=(n, 1))
    return np.concatenate([xy * z, z], axis=-1).astype(np.float32)


def test_pinhole_project_matches_opencv():
    cam = cam_mod.make_camera("PinHole", **EUROC_PINHOLE)
    pts = _rand_points(seed=1)
    got = np.asarray(cam_mod.project(cam, jnp.asarray(pts)))
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    d = np.array(EUROC_PINHOLE["dist"])
    want, _ = cv2.projectPoints(
        pts.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), K, d
    )
    np.testing.assert_allclose(got, want.reshape(-1, 2), atol=1e-2)


def test_pinhole_unproject_roundtrip():
    cam = cam_mod.make_camera("PinHole", **EUROC_PINHOLE)
    pts = _rand_points(seed=2, fov_limit=0.5)
    uv = cam_mod.project(cam, jnp.asarray(pts))
    rays = cam_mod.unproject(cam, uv)
    want = pts / pts[:, 2:3]
    np.testing.assert_allclose(np.asarray(rays), want, atol=1e-4)


def test_kb8_project_matches_opencv_fisheye():
    cam = cam_mod.make_camera("KannalaBrandt8", **TUMVI_KB8)
    pts = _rand_points(seed=3, fov_limit=1.2)
    got = np.asarray(cam_mod.project(cam, jnp.asarray(pts)))
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    d = np.array(TUMVI_KB8["dist"])
    want, _ = cv2.fisheye.projectPoints(
        pts.reshape(1, -1, 3).astype(np.float64), np.zeros(3), np.zeros(3), K, d
    )
    np.testing.assert_allclose(got, want.reshape(-1, 2), atol=5e-2)


def test_kb8_unproject_roundtrip():
    cam = cam_mod.make_camera("KannalaBrandt8", **TUMVI_KB8)
    pts = _rand_points(seed=4, fov_limit=1.0)
    uv = cam_mod.project(cam, jnp.asarray(pts))
    rays = cam_mod.unproject(cam, uv)
    want = pts / pts[:, 2:3]
    np.testing.assert_allclose(np.asarray(rays), want, atol=1e-3)


def test_rectified_roundtrip_and_bounds():
    cam = cam_mod.make_camera(
        "Rectified", fx=380.0, fy=380.0, cx=320.0, cy=240.0, width=640, height=480,
        baseline=0.05,
    )
    pts = _rand_points(seed=5, fov_limit=0.6)
    uv = cam_mod.project(cam, jnp.asarray(pts))
    rays = cam_mod.unproject(cam, uv)
    np.testing.assert_allclose(np.asarray(rays), pts / pts[:, 2:3], atol=1e-5)
    inside = np.asarray(cam_mod.in_image(cam, uv))
    uv_np = np.asarray(uv)
    want = (
        (uv_np[:, 0] >= 0) & (uv_np[:, 0] < 640) & (uv_np[:, 1] >= 0) & (uv_np[:, 1] < 480)
    )
    np.testing.assert_array_equal(inside, want)


def test_projection_jacobian_matches_autodiff():
    import jax

    cam = cam_mod.make_camera(
        "Rectified", fx=380.0, fy=375.0, cx=320.0, cy=240.0, width=640, height=480
    )
    pts = jnp.asarray(_rand_points(16, seed=6))
    J_closed = cam_mod.project_jacobian_point(cam, pts)
    J_auto = jax.vmap(jax.jacfwd(lambda x: cam_mod.project(cam, x)))(pts)
    np.testing.assert_allclose(np.asarray(J_closed), np.asarray(J_auto), atol=1e-4)
