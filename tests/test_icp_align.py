"""Map-to-map ICP localization tests (libpointmatcher side-car parity,
`/root/reference/config/pointmatcher_config.yaml`, `README.md:95-110`)."""

import numpy as np
from scipy.spatial.transform import Rotation

from orb_slam3_ros2_tpu.atlas import icp_align


def _room_cloud(rng, n=3000):
    """Points sampled from three orthogonal planes (floor + two walls) with
    mild clutter — structured enough for meaningful normals."""
    n3 = n // 3
    floor = np.stack([rng.uniform(-2, 2, n3), rng.uniform(-2, 2, n3),
                      np.zeros(n3)], -1)
    wall1 = np.stack([rng.uniform(-2, 2, n3), np.full(n3, -2.0),
                      rng.uniform(0, 2, n3)], -1)
    wall2 = np.stack([np.full(n3, 2.0), rng.uniform(-2, 2, n3),
                      rng.uniform(0, 2, n3)], -1)
    pts = np.concatenate([floor, wall1, wall2], 0)
    return pts + rng.normal(0, 0.002, pts.shape)


def test_normals_on_plane():
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, 256), rng.uniform(-1, 1, 256),
                    np.zeros(256)], -1).astype(np.float32)
    import jax.numpy as jnp

    n = np.asarray(icp_align.estimate_normals(
        jnp.asarray(pts), jnp.ones(256, bool), knn=5
    ))
    assert np.all(np.abs(n[:, 2]) > 0.99)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_icp_recovers_known_transform():
    rng = np.random.default_rng(3)
    dst = _room_cloud(rng)
    R_gt = Rotation.from_euler("zyx", [12.0, -6.0, 4.0],
                               degrees=True).as_matrix()
    t_gt = np.array([0.4, -0.3, 0.2])
    # src = the same scene observed in its own frame: dst = R src + t
    src_full = (dst - t_gt) @ R_gt  # inverse transform
    # partial overlap: each cloud keeps a random 70%
    src = src_full[rng.random(len(src_full)) < 0.7]
    dst = dst[rng.random(len(dst)) < 0.7]
    src = src + rng.normal(0, 0.005, src.shape)

    T, stats = icp_align.align_maps(src, dst, iters=40)
    rot_err = Rotation.from_matrix(T[:3, :3] @ R_gt.T).magnitude()
    assert rot_err < 0.01, rot_err
    assert np.linalg.norm(T[:3, 3] - t_gt) < 0.02
    assert stats["rms"] < 0.02
    assert stats["inlier_frac"] > 0.9


def test_icp_identity_on_same_cloud():
    rng = np.random.default_rng(5)
    pts = _room_cloud(rng, n=1200)
    T, stats = icp_align.align_maps(pts, pts, iters=15)
    assert np.linalg.norm(T[:3, 3]) < 5e-3
    assert Rotation.from_matrix(T[:3, :3]).magnitude() < 5e-3
    assert stats["rms"] < 5e-3
