"""General (non-rectified) stereo: epipolar-gated ray matching + midpoint
triangulation under `Stereo.T_c1_c2` — the path the reference uses for
KannalaBrandt8 fisheye rigs (`config/Stereo/TUM-VI.yaml:8,34-41`; upstream
`KannalaBrandt8::TriangulateMatches`)."""

import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.frontend import stereo as stereo_mod
from orb_slam3_ros2_tpu.io import settings as settings_mod
from orb_slam3_ros2_tpu.models import cameras as cam_mod
from orb_slam3_ros2_tpu.ops import orb_descriptor as desc_ops


def _rig(seed=0, n=120):
    """Synthetic KB8 stereo rig with groundtruth correspondences."""
    rng = np.random.default_rng(seed)
    s = settings_mod.load_settings("tests/data/synth_kb8_stereo.yaml")
    cam1, cam2 = s.camera, s.camera2
    T12 = np.asarray(s.T_c1_c2, np.float64)
    R12, t12 = T12[:3, :3], T12[:3, 3]
    # points in front of the left camera
    X1 = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1.0, 1.0, n),
         rng.uniform(2.0, 8.0, n)], axis=-1,
    )
    # x_c1 = R12 x_c2 + t12  =>  x_c2 = R12^T (x_c1 - t12)
    X2 = (X1 - t12) @ R12
    uv1 = np.asarray(cam_mod.project(cam1, jnp.asarray(X1)))
    uv2 = np.asarray(cam_mod.project(cam2, jnp.asarray(X2)))
    vis = (
        (uv1[:, 0] > 2) & (uv1[:, 0] < cam1.width - 2)
        & (uv1[:, 1] > 2) & (uv1[:, 1] < cam1.height - 2)
        & (uv2[:, 0] > 2) & (uv2[:, 0] < cam2.width - 2)
        & (uv2[:, 1] > 2) & (uv2[:, 1] < cam2.height - 2)
        & (X2[:, 2] > 0.1)
    )
    bits = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    return s, cam1, cam2, R12, t12, X1, uv1, uv2, vis, bits


def test_unproject_roundtrip_kb8():
    s, cam1, cam2, R12, t12, X1, uv1, uv2, vis, bits = _rig()
    rays = np.asarray(cam_mod.unproject(cam1, jnp.asarray(uv1)))
    # rays must be parallel to the groundtruth directions
    d = X1 / np.linalg.norm(X1, axis=-1, keepdims=True)
    r = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
    assert np.abs((d * r).sum(-1)[vis] - 1.0).max() < 1e-6


def test_match_stereo_general_triangulates():
    s, cam1, cam2, R12, t12, X1, uv1, uv2, vis, bits = _rig()
    n = X1.shape[0]
    # shuffle the right features so matching is non-trivial
    perm = np.random.default_rng(1).permutation(n)
    signs1 = desc_ops.signs_from_bits(jnp.asarray(bits))
    signs2 = desc_ops.signs_from_bits(jnp.asarray(bits[perm]))
    rays1 = cam_mod.unproject(cam1, jnp.asarray(uv1))
    rays2 = cam_mod.unproject(cam2, jnp.asarray(uv2[perm]))
    lvl = jnp.zeros((n,), jnp.int32)
    so = stereo_mod.match_stereo_general(
        rays1, signs1, jnp.asarray(vis), lvl,
        rays2, signs2, jnp.asarray(vis[perm]), lvl,
        jnp.asarray(R12), jnp.asarray(t12),
        max_depth=20.0,
    )
    valid = np.asarray(so.valid)
    Xr = np.asarray(so.X_cam)
    assert valid.sum() > 0.7 * vis.sum(), (valid.sum(), vis.sum())
    err = np.linalg.norm(Xr[valid] - X1[valid], axis=-1)
    rel = err / np.linalg.norm(X1[valid], axis=-1)
    assert np.median(rel) < 0.01, np.median(rel)
    assert rel.max() < 0.08, rel.max()


def test_system_selects_general_path():
    from orb_slam3_ros2_tpu.runtime.system import Sensor, System

    sys_ = System(None, "tests/data/synth_kb8_stereo.yaml", Sensor.STEREO)
    assert sys_._stereo_right_raw  # general two-view path active
    assert abs(sys_.stereo_baseline - 0.1010) < 1e-3

    sys_r = System(None, "tests/data/synth_stereo.yaml", Sensor.STEREO)
    assert not sys_r._stereo_right_raw  # rectified scanline path


def test_rectified_obs_matches_backproject():
    """The rectified wrapper produces the same 3-D points as the legacy
    depth backprojection."""
    rng = np.random.default_rng(3)
    n = 32
    uv = rng.uniform(10, 200, (n, 2)).astype(np.float32)
    depth = rng.uniform(1.0, 10.0, n).astype(np.float32)
    sm = stereo_mod.StereoMatch(
        depth=jnp.asarray(depth), disparity=jnp.zeros(n),
        right_u=jnp.zeros(n), valid=jnp.ones(n, bool),
    )
    so = stereo_mod.obs_from_rectified(sm, jnp.asarray(uv), 260.0, 260.0,
                                       160.0, 120.0)
    X = np.asarray(stereo_mod.backproject(jnp.asarray(uv),
                                          jnp.asarray(depth),
                                          260.0, 260.0, 160.0, 120.0))
    np.testing.assert_allclose(np.asarray(so.X_cam), X, atol=1e-6)
    np.testing.assert_allclose(np.asarray(so.depth), depth, atol=1e-6)
