"""Map lifecycle: slot compaction, keyframe culling, duplicate-landmark
fusion, preintegration merging, global BA (the reference's LocalMapping /
LoopClosing maintenance passes: MapPointCulling, KeyFrameCulling,
ORBmatcher::Fuse, IMU::Preintegrated::MergePrevious, GlobalBundleAdjustemnt
[upstream]; the snapshot itself ships no tests — SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.atlas import map_state as ms
from orb_slam3_ros2_tpu.frontend import tracking as trk
from orb_slam3_ros2_tpu.imu import preintegration as pre_mod
from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.ops import orb_descriptor as desc_ops

CFG = ms.MapConfig(max_kf=8, max_lm=64, n_feat=16)
FX = FY = 100.0
CX = CY = 50.0


def _small_map(n_kf=4, n_lm=20, seed=0):
    """Map with n_kf keyframes observing n_lm landmarks consistently."""
    rng = np.random.default_rng(seed)
    m = ms.empty_map(CFG)
    X = np.stack(
        [rng.uniform(-1, 1, n_lm), rng.uniform(-1, 1, n_lm),
         rng.uniform(3, 6, n_lm)], axis=-1,
    ).astype(np.float32)
    bits = rng.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)
    m = m._replace(
        lm_X=m.lm_X.at[:n_lm].set(jnp.asarray(X)),
        lm_valid=m.lm_valid.at[:n_lm].set(True),
        lm_bits=m.lm_bits.at[:n_lm].set(jnp.asarray(bits)),
        n_lm=jnp.asarray(n_lm, jnp.int32),
    )
    N = CFG.n_feat
    for k in range(n_kf):
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.1 * k, 0, 0], np.float32)
        # each KF observes landmarks k..k+N-1 (wrapping)
        obs = np.full(N, -1, np.int32)
        uv = np.zeros((N, 2), np.float32)
        fb = np.zeros((N, 8), np.uint32)
        for f in range(min(N, n_lm)):
            l = (k + f) % n_lm
            obs[f] = l
            xc = R @ X[l] + t
            uv[f] = [FX * xc[0] / xc[2] + CX, FY * xc[1] / xc[2] + CY]
            fb[f] = bits[l]
        m = ms.insert_keyframe(
            m, jnp.asarray(R), jnp.asarray(t), jnp.asarray(float(k)),
            jnp.asarray(uv), jnp.zeros((N,), jnp.int32), jnp.asarray(fb),
            jnp.ones((N,), bool), jnp.asarray(obs),
        )
    return m, X, bits


def test_compact_landmarks_preserves_observations():
    m, X, _ = _small_map()
    # invalidate a few landmarks
    drop = [2, 5, 11]
    lv = np.asarray(m.lm_valid).copy()
    lv[drop] = False
    m = m._replace(lm_valid=jnp.asarray(lv))
    m2, remap = ms.compact_landmarks(m)
    remap = np.asarray(remap)
    n_keep = int(m2.n_lm)
    assert n_keep == 20 - len(drop)
    assert np.asarray(m2.lm_valid)[:n_keep].all()
    assert not np.asarray(m2.lm_valid)[n_keep:].any()
    for d in drop:
        assert remap[d] == -1
    # every kept landmark keeps its position and its observations
    obs_old = np.asarray(m.kf_obs_lm)
    obs_new = np.asarray(m2.kf_obs_lm)
    X2 = np.asarray(m2.lm_X)
    for l_old in range(20):
        if l_old in drop:
            continue
        l_new = remap[l_old]
        np.testing.assert_allclose(X2[l_new], X[l_old], atol=1e-6)
        assert ((obs_old == l_old) == (obs_new == l_new)).all()
    # dropped landmarks' observations are nulled
    assert not np.isin(obs_new, [remap[d] for d in drop if remap[d] >= 0]).any()


def test_compact_keyframes_remaps_and_recounts():
    m, X, _ = _small_map()
    keep = np.ones(CFG.max_kf, bool)
    keep[1] = False  # cull KF 1
    m2, remap = ms.compact_keyframes(m, jnp.asarray(keep))
    remap = np.asarray(remap)
    assert int(m2.n_kf) == 3
    assert remap[0] == 0 and remap[1] == -1 and remap[2] == 1 and remap[3] == 2
    # poses moved with the permutation
    np.testing.assert_allclose(
        np.asarray(m2.kf_t[1]), np.asarray(m.kf_t[2]), atol=1e-7
    )
    # observation counts recomputed from the surviving table
    m_ref = ms.recount_observations(m2)
    np.testing.assert_array_equal(
        np.asarray(m2.lm_n_obs), np.asarray(m_ref.lm_n_obs)
    )
    # each landmark lost at most one observation (the culled KF's)
    n_old = np.asarray(ms.recount_observations(m).lm_n_obs)
    n_new = np.asarray(m2.lm_n_obs)
    assert (n_old - n_new >= 0).all() and (n_old - n_new <= 1).all()


def test_keyframe_redundancy_scores():
    m, _, _ = _small_map(n_kf=4, n_lm=16)  # 16 features see all 16 lms -> all
    # KFs observe every landmark -> every landmark has 4 obs -> fully
    # redundant keyframes
    r = np.asarray(ms.keyframe_redundancy(m, min_obs=4))
    assert (r[:4] > 0.99).all()
    r2 = np.asarray(ms.keyframe_redundancy(m, min_obs=5))
    assert (r2[:4] < 0.01).all()


def test_fuse_adopts_and_merges():
    m, X, bits = _small_map(n_kf=2, n_lm=10)
    # duplicate landmark: same position+descriptor as landmark 0, observed
    # only by KF 1's feature 12 (previously free)
    n_lm = int(m.n_lm)
    m = m._replace(
        lm_X=m.lm_X.at[n_lm].set(m.lm_X[0] + 1e-4),
        lm_valid=m.lm_valid.at[n_lm].set(True),
        lm_bits=m.lm_bits.at[n_lm].set(m.lm_bits[0]),
        n_lm=jnp.asarray(n_lm + 1, jnp.int32),
    )
    uv1 = np.asarray(m.kf_uv[1]).copy()
    R1 = np.asarray(m.kf_R[1])
    t1 = np.asarray(m.kf_t[1])
    xc = R1 @ np.asarray(m.lm_X[n_lm]) + t1
    uv1[12] = [FX * xc[0] / xc[2] + CX, FY * xc[1] / xc[2] + CY]
    fb = np.asarray(m.kf_bits[1]).copy()
    fb[12] = np.asarray(m.lm_bits[0])
    obs1 = np.asarray(m.kf_obs_lm[1]).copy()
    # feature 12 observes the duplicate; feature (1 + ... ) — KF1 feature f
    # observes lm (1+f)%10, so some feature observes lm 0: f = 9
    assert obs1[9] == 0
    obs1[12] = n_lm
    m = m._replace(
        kf_uv=m.kf_uv.at[1].set(jnp.asarray(uv1)),
        kf_bits=m.kf_bits.at[1].set(jnp.asarray(fb)),
        kf_obs_lm=m.kf_obs_lm.at[1].set(jnp.asarray(obs1)),
        kf_feat_valid=m.kf_feat_valid.at[1, 12].set(True),
    )
    m = ms.recount_observations(m)
    m2, n_adopt, n_merge = trk.fuse_map_points(
        m, jnp.asarray(1, jnp.int32), FX, FY, CX, CY, 100, 100,
        radius=3.0,
    )
    obs2 = np.asarray(m2.kf_obs_lm)
    lv2 = np.asarray(m2.lm_valid)
    # the duplicate pair (0, n_lm) must have been merged: only one survives
    assert lv2[0] != lv2[n_lm] or int(n_merge) > 0
    survivor = 0 if lv2[0] else n_lm
    # both observing features now point at the survivor (or were nulled)
    assert obs2[1, 9] in (survivor, -1)
    assert obs2[1, 12] in (survivor, -1)
    assert not (lv2[0] and lv2[n_lm])


def test_preintegration_merge_matches_direct():
    traj = synthetic.default_trajectory(seed=3)
    rate = 200.0
    t, gyro, acc = synthetic.make_imu(traj, 0.0, 1.0, rate=rate)
    dts = np.full(t.shape, 1.0 / rate, np.float32)
    half = len(t) // 2
    bg = jnp.asarray([0.01, -0.02, 0.005], jnp.float32)
    ba = jnp.asarray([0.05, 0.02, -0.04], jnp.float32)

    def pre(sl):
        return pre_mod.preintegrate(
            jnp.asarray(gyro[sl], jnp.float32), jnp.asarray(acc[sl], jnp.float32),
            jnp.asarray(dts[sl]), jnp.ones(len(dts[sl]), bool), bg, ba,
        )

    p1 = pre(slice(0, half))
    p2 = pre(slice(half, None))
    pm = pre_mod.merge(p1, p2)
    pd = pre(slice(None))
    np.testing.assert_allclose(np.asarray(pm.dR), np.asarray(pd.dR), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pm.dv), np.asarray(pd.dv), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pm.dp), np.asarray(pd.dp), atol=1e-4)
    assert abs(float(pm.dt) - float(pd.dt)) < 1e-6
    # bias Jacobians compose to first order
    np.testing.assert_allclose(np.asarray(pm.JRg), np.asarray(pd.JRg),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(pm.Jvg), np.asarray(pd.Jvg),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(pm.Jva), np.asarray(pd.Jva),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(pm.Jpg), np.asarray(pd.Jpg),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(pm.Jpa), np.asarray(pd.Jpa),
                               atol=2e-3)
    # covariance: same order of magnitude, PSD
    assert np.all(np.linalg.eigvalsh(np.asarray(pm.cov)) > -1e-12)
    np.testing.assert_allclose(
        np.trace(np.asarray(pm.cov)), np.trace(np.asarray(pd.cov)), rtol=0.3
    )


def test_global_ba_reduces_reprojection_error():
    sc = synthetic.make_scene(n_frames=5, n_points=40, noise_px=0.0, seed=2)
    cfg = ms.MapConfig(max_kf=8, max_lm=64, n_feat=48)
    m = ms.empty_map(cfg)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2**32, (40, 8), dtype=np.uint32)
    m = m._replace(
        lm_X=m.lm_X.at[:40].set(
            jnp.asarray(sc.X + rng.normal(0, 0.05, sc.X.shape), jnp.float32)
        ),
        lm_valid=m.lm_valid.at[:40].set(True),
        lm_bits=m.lm_bits.at[:40].set(jnp.asarray(bits)),
        n_lm=jnp.asarray(40, jnp.int32),
    )
    for k in range(5):
        uv = np.zeros((48, 2), np.float32)
        obs = np.full(48, -1, np.int32)
        uv[:40] = sc.uv[k]
        obs[:40] = np.where(sc.vis[k], np.arange(40), -1)
        # perturb all but the first pose
        dR = np.eye(3) if k == 0 else np.asarray(
            trk.lie.so3_exp(jnp.asarray(rng.normal(0, 0.01, 3), jnp.float32))
        )
        m = ms.insert_keyframe(
            m, jnp.asarray(dR @ sc.R_cw[k], jnp.float32),
            jnp.asarray(sc.t_cw[k] + rng.normal(0, 0.02, 3), jnp.float32),
            jnp.asarray(float(k)),
            jnp.asarray(uv), jnp.zeros(48, jnp.int32),
            jnp.zeros((48, 8), jnp.uint32),
            jnp.asarray(obs >= 0), jnp.asarray(obs),
        )
    m2 = trk.global_ba(m, sc.fx, sc.fy, sc.cx, sc.cy, n_iters=12)
    # reprojection residuals drop to numerical noise (zero-noise scene)
    errs = []
    for k in range(5):
        R = np.asarray(m2.kf_R[k])
        t = np.asarray(m2.kf_t[k])
        xc = np.asarray(m2.lm_X[:40]) @ R.T + t
        uv = np.stack(
            [sc.fx * xc[:, 0] / xc[:, 2] + sc.cx,
             sc.fy * xc[:, 1] / xc[:, 2] + sc.cy], -1,
        )
        errs.append(np.linalg.norm(uv - sc.uv[k], axis=-1)[sc.vis[k]])
    rmse = np.sqrt((np.concatenate(errs) ** 2).mean())
    assert rmse < 1e-2, rmse
    # camera centers converge to GT up to the free mono scale gauge (only
    # KF0 is fixed, as upstream GlobalBundleAdjustemnt does) -> Sim3-align
    c_est = np.stack([
        -np.asarray(m2.kf_R[k]).T @ np.asarray(m2.kf_t[k]) for k in range(5)
    ])
    c_gt = np.stack([-sc.R_cw[k].T @ sc.t_cw[k] for k in range(5)])
    assert synthetic.ate_rmse(c_est, c_gt) < 1e-3
