"""Intrinsics calibration from synthetic aprilgrid views: render the
generated board under a known camera, recover fx/fy/cx/cy."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from orb_slam3_ros2_tpu.io.calibrate import (  # noqa: E402
    AprilGridSpec,
    calibrate,
    detect_grid,
)


def _board(spec, px_per_tag=120):
    dic = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    gap = int(round(px_per_tag * spec.tag_spacing))
    W = spec.cols * px_per_tag + (spec.cols + 1) * gap
    H = spec.rows * px_per_tag + (spec.rows + 1) * gap
    board = np.full((H, W), 255, np.uint8)
    for r in range(spec.rows):
        for c in range(spec.cols):
            tag = cv2.aruco.generateImageMarker(
                dic, r * spec.cols + c, px_per_tag)
            y = gap + r * (px_per_tag + gap)
            x = gap + c * (px_per_tag + gap)
            board[y:y + px_per_tag, x:x + px_per_tag] = tag
    # meters per pixel on the target plane; board origin = first tag corner
    mpp = spec.tag_size / px_per_tag
    origin_px = np.array([gap, gap], np.float64)
    return board, mpp, origin_px


def _render_view(board, mpp, origin_px, K, rvec, tvec, size):
    """Project the target plane (z=0 world) through K·[R|t] and warp the
    board image accordingly."""
    R, _ = cv2.Rodrigues(rvec)
    # world (x, y, 0) of board pixel p: (p - origin) * mpp
    A = np.array([[mpp, 0, -origin_px[0] * mpp],
                  [0, mpp, -origin_px[1] * mpp],
                  [0, 0, 1.0]])
    P = np.column_stack([R[:, 0], R[:, 1], tvec.ravel()])  # plane homography
    Hm = K @ P @ A
    return cv2.warpPerspective(board, Hm, size, flags=cv2.INTER_LINEAR,
                               borderValue=255)


def test_calibration_recovers_known_intrinsics():
    spec = AprilGridSpec(cols=4, rows=3, tag_size=0.08, tag_spacing=0.3)
    board, mpp, origin_px = _board(spec)
    fx, fy, cx, cy = 420.0, 410.0, 330.0, 230.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    size = (640, 480)

    rng = np.random.default_rng(0)
    views = []
    # systematic strong tilts about x and y: planar-target calibration
    # needs view diversity to decouple focal length from distortion
    tilts = [(0.0, 0.0), (0.45, 0.0), (-0.45, 0.0), (0.0, 0.45),
             (0.0, -0.45), (0.35, 0.35), (-0.35, 0.35), (0.35, -0.35),
             (-0.35, -0.35), (0.2, -0.4)]
    for ax, ay in tilts:
        rvec = np.array([ax, ay, rng.normal(0, 0.1)])
        tvec = np.array([
            -0.22 + rng.normal(0, 0.05), -0.17 + rng.normal(0, 0.05),
            0.75 + rng.uniform(-0.1, 0.25),
        ])
        views.append(_render_view(board, mpp, origin_px, K, rvec, tvec,
                                  size))

    obj, im = detect_grid(views[0], spec)
    assert len(obj) >= 24  # detections with matched world coordinates

    res = calibrate(views, spec, model="PinHole")
    assert res is not None and res.n_views >= 8
    assert res.rms_px < 1.0, res.rms_px
    assert abs(res.fx - fx) / fx < 0.01, res.fx
    assert abs(res.fy - fy) / fy < 0.01, res.fy
    assert abs(res.cx - cx) < 5 and abs(res.cy - cy) < 5
    keys = res.settings_keys()
    assert "Camera1.fx" in keys and 'Camera.type: "PinHole"' in keys
