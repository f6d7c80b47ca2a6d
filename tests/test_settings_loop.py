"""Settings parser on all 24 reference YAMLs; BoW retrieval; Sim3; pose graph."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.io.settings import load_opencv_yaml, load_settings
from orb_slam3_ros2_tpu.loop import pose_graph, sim3, vocab

REF_CFG = "/root/reference/config"


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference not mounted")
def test_settings_parse_all_reference_yamls():
    paths = [
        p for p in glob.glob(f"{REF_CFG}/*/*.yaml")
        if "Calibration" not in p and "mapper" not in p
        and "pointmatcher" not in p
    ]
    assert len(paths) == 24
    for p in paths:
        s = load_settings(p)
        assert s.camera.fx > 0 and s.camera.width > 0
        assert s.n_features >= 800
        assert 1.0 < s.scale_factor < 2.0


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference not mounted")
def test_settings_opencv_matrix_and_fork_keys():
    s = load_settings(f"{REF_CFG}/Monocular-Inertial/EuRoC.yaml")
    assert s.T_b_c1 is not None and s.T_b_c1.shape == (4, 4)
    np.testing.assert_allclose(s.T_b_c1[3], [0, 0, 0, 1], atol=1e-9)
    assert s.imu_frequency == 200.0
    assert s.sensor_type == "IMU_MONOCULAR"
    # resize keys rescale intrinsics (EuRoC.yaml newWidth 600 of 752)
    assert s.camera.width == 600
    assert abs(s.camera.fx - 458.654 * 600 / 752) < 1e-3

    d435 = load_settings(f"{REF_CFG}/Monocular-Inertial/RealSense_D435i.yaml")
    assert d435.loop_closing is False  # fork-added `loopClosing: 0` key


def test_bow_retrieval_finds_similar_frame():
    rng = np.random.default_rng(0)
    n_kf, n_feat = 12, 200

    def frame(seed):
        r = np.random.default_rng(seed)
        bits = r.random((n_feat, 256)) < 0.5
        return jnp.where(jnp.asarray(bits), 1.0, -1.0).astype(jnp.float32)

    db = vocab.empty_database(32)
    frames = [frame(i) for i in range(n_kf)]
    mask = jnp.ones((n_feat,), bool)
    for f in frames:
        db = vocab.add_keyframe(db, f, mask)

    # query = noisy copy of frame 3 (5% bits flipped)
    q = np.array(frames[3])
    flip = rng.random(q.shape) < 0.05
    q = jnp.asarray(np.where(flip, -q, q))
    scores, ids = vocab.query(
        db, q, mask, vocab.exclude_window(32, n_kf, n_kf + 10), top_k=3
    )
    assert int(ids[0]) == 3
    # exclusion mask hides the true match
    scores2, ids2 = vocab.query(
        db, q, mask, vocab.exclude_window(32, 2, 4), top_k=3
    )
    assert int(ids2[0]) != 3


def test_sim3_solver_recovers_transform():
    rng = np.random.default_rng(1)
    n = 80
    X2 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.3], jnp.float32)))
    s_gt, t_gt = 1.7, np.array([0.4, -0.2, 0.9])
    X1 = s_gt * (R_gt @ X2.T).T + t_gt + rng.normal(0, 0.005, (n, 3))
    out_mask = rng.random(n) < 0.2
    X1[out_mask] += rng.uniform(-3, 3, (out_mask.sum(), 3))

    res = sim3.solve_sim3(
        jax.random.PRNGKey(0), jnp.asarray(X1, jnp.float32),
        jnp.asarray(X2), jnp.ones(n, bool),
    )
    assert bool(res.ok)
    assert abs(float(res.s) - s_gt) < 0.05
    assert np.linalg.norm(np.asarray(res.R) - R_gt) < 0.03
    assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.08


def test_sim3_fix_scale():
    rng = np.random.default_rng(2)
    n = 50
    X2 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.05, -0.2], jnp.float32)))
    X1 = (R_gt @ X2.T).T + np.array([0.3, 0.1, -0.2])
    res = sim3.solve_sim3(
        jax.random.PRNGKey(1), jnp.asarray(X1, jnp.float32), jnp.asarray(X2),
        jnp.ones(n, bool), fix_scale=True,
    )
    assert bool(res.ok)
    assert float(res.s) == 1.0


def test_pose_graph_closes_loop():
    """Odometry chain with accumulated drift + one loop edge → corrected."""
    K = 12
    rng = np.random.default_rng(3)
    # groundtruth: poses on a circle (S_iw = world-to-frame-i, scale 1)
    R_gt, t_gt = [], []
    for k in range(K):
        ang = 2 * np.pi * k / K
        Rk = np.asarray(
            lie.so3_exp(jnp.asarray([0.0, 0.0, ang], jnp.float32))
        )
        tk = np.array([np.cos(ang), np.sin(ang), 0.0])
        R_gt.append(Rk)
        t_gt.append(-Rk @ tk)
    R_gt = np.stack(R_gt).astype(np.float32)
    t_gt = np.stack(t_gt).astype(np.float32)
    s_gt = np.ones(K, np.float32)

    # noisy odometry estimates (drifted): perturb each pose increasingly
    R_est, t_est = [R_gt[0]], [t_gt[0]]
    for k in range(1, K):
        xi = np.concatenate([
            rng.normal(0, 0.02 * k / K, 3), rng.normal(0, 0.02 * k / K, 3),
            [0.0],
        ]).astype(np.float32)
        dR, dt, ds = lie.sim3_exp(jnp.asarray(xi))
        Rk, tk, _ = lie.sim3_compose(
            dR, dt, ds, jnp.asarray(R_gt[k]), jnp.asarray(t_gt[k]),
            jnp.asarray(1.0),
        )
        R_est.append(np.asarray(Rk))
        t_est.append(np.asarray(tk))
    R_est = np.stack(R_est)
    t_est = np.stack(t_est)

    # edges: consecutive odometry (from groundtruth = perfect measurements)
    ei, ej, Rm, tm, sm = [], [], [], [], []

    def add_edge(i, j):
        Ri, ti, si = R_gt[i], t_gt[i], 1.0
        Rj, tj, sj = R_gt[j], t_gt[j], 1.0
        Rr, tr, sr = lie.sim3_compose(
            jnp.asarray(Ri), jnp.asarray(ti), jnp.asarray(si),
            *lie.sim3_inverse(jnp.asarray(Rj), jnp.asarray(tj), jnp.asarray(sj)),
        )
        ei.append(i); ej.append(j)
        Rm.append(np.asarray(Rr)); tm.append(np.asarray(tr))
        sm.append(float(sr))

    for k in range(K - 1):
        add_edge(k + 1, k)
    add_edge(0, K - 1)  # loop closure edge

    E = len(ei)
    out = pose_graph.optimize_pose_graph(
        jnp.asarray(R_est), jnp.asarray(t_est), jnp.asarray(s_gt),
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(Rm), jnp.float32),
        jnp.asarray(np.stack(tm), jnp.float32),
        jnp.asarray(sm, jnp.float32),
        jnp.ones(E, bool),
        jnp.zeros(K, bool).at[0].set(True),
        n_iters=15,
    )
    err_before = np.linalg.norm(t_est - t_gt, axis=-1).mean()
    err_after = np.linalg.norm(np.asarray(out.t) - t_gt, axis=-1).mean()
    assert err_after < 0.05 * err_before + 1e-4, (err_before, err_after)
    np.testing.assert_allclose(np.asarray(out.s), 1.0, atol=1e-3)
