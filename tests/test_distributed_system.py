"""The live engine's distributed operating mode (r2 verdict item 2).

`System._run_global_ba` must dispatch to the landmark-sharded Schur solver
when a mesh is attached, and the result must agree with the single-device
path — validated on the virtual 8-device CPU mesh exactly as SURVEY.md §4
prescribes (the reference's only optimizer is one in-process g2o,
`/root/reference/CMakeLists.txt:125-127`)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.atlas import map_state as ms
from orb_slam3_ros2_tpu.frontend import tracking as trk
from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.parallel import distributed_map
from orb_slam3_ros2_tpu.parallel import mesh as mesh_mod

FX = FY = 300.0
CX, CY = 160.0, 120.0


def _scene_map(seed=0, K=8, L=160, max_kf=16, pose_noise=0.02,
               point_noise=0.05):
    """MapState populated from a synthetic scene with noisy geometry."""
    sc = synthetic.make_scene(n_frames=K, n_points=L, noise_px=0.3,
                              seed=seed, fps=2.0, fx=FX, fy=FY, cx=CX, cy=CY)
    rng = np.random.default_rng(seed)
    cfg = ms.MapConfig(max_kf=max_kf, max_lm=L, n_feat=L)
    m = ms.empty_map(cfg)

    xi = rng.normal(0, pose_noise, (K, 6)).astype(np.float32)
    xi[0] = 0
    R0, t0 = lie.se3_retract(jnp.asarray(sc.R_cw), jnp.asarray(sc.t_cw),
                             jnp.asarray(xi))
    X0 = sc.X + rng.normal(0, point_noise, sc.X.shape)

    obs = np.where(sc.vis > 0, np.arange(L)[None, :], -1).astype(np.int32)
    m = m._replace(
        kf_valid=jnp.asarray(np.arange(max_kf) < K),
        kf_R=m.kf_R.at[:K].set(R0),
        kf_t=m.kf_t.at[:K].set(t0),
        kf_uv=m.kf_uv.at[:K].set(jnp.asarray(sc.uv, jnp.float32)),
        kf_obs_lm=m.kf_obs_lm.at[:K].set(jnp.asarray(obs)),
        kf_feat_valid=m.kf_feat_valid.at[:K].set(jnp.asarray(sc.vis > 0)),
        lm_X=jnp.asarray(X0, jnp.float32),
        lm_valid=jnp.ones((L,), bool),
        n_kf=jnp.asarray(K, jnp.int32),
        n_lm=jnp.asarray(L, jnp.int32),
    )
    return sc, m


def _pose_err(m, sc, K):
    return np.linalg.norm(
        np.asarray(m.kf_t[:K]) - sc.t_cw, axis=-1).mean()


def test_distributed_map_ba_matches_single_device():
    assert len(jax.devices()) == 8
    sc, m = _scene_map()
    K = 8
    ids = jnp.arange(m.kf_R.shape[0], dtype=jnp.int32).clip(0, K - 1)
    fix = (jnp.arange(ids.shape[0]) == 0)

    mesh = mesh_mod.make_mesh(8)
    m_dist = distributed_map.distributed_map_ba(
        m, ids, fix, mesh, FX, FY, CX, CY, n_iters=10)
    m_single = trk.local_ba(m, ids, fix, FX, FY, CX, CY, n_iters=10)

    e0 = _pose_err(m, sc, K)
    ed = _pose_err(m_dist, sc, K)
    es = _pose_err(m_single, sc, K)
    # both solvers converge and agree with each other
    assert ed < 0.3 * e0, (ed, e0)
    assert abs(ed - es) < 5e-3, (ed, es)
    # landmarks only moved where observed; untouched slots identical
    assert np.allclose(np.asarray(m_dist.lm_valid), np.asarray(m.lm_valid))


def test_system_global_ba_dispatches_to_mesh():
    """System with a mesh runs the SAME _run_global_ba entry point through
    the distributed solver and lands on the same map as the single-device
    System."""
    from orb_slam3_ros2_tpu.runtime import system as sys_mod

    K = 8
    NF = 600  # synth_cam extractor capacity (map n_feat must match)

    mesh = mesh_mod.make_mesh(8)
    sys_d = sys_mod.System(None, "tests/data/synth_cam.yaml",
                           sys_mod.Sensor.MONOCULAR,
                           map_cfg=ms.MapConfig(max_kf=16, max_lm=160,
                                                n_feat=NF),
                           mesh=mesh)
    sys_s = sys_mod.System(None, "tests/data/synth_cam.yaml",
                           sys_mod.Sensor.MONOCULAR,
                           map_cfg=ms.MapConfig(max_kf=16, max_lm=160,
                                                n_feat=NF))
    # intrinsics of the solve come from the settings; rebuild the scene map
    # against them so the geometry is consistent
    cam = sys_d.cam
    sc = synthetic.make_scene(n_frames=K, n_points=160, noise_px=0.3,
                              seed=3, fps=2.0, fx=cam.fx, fy=cam.fy,
                              cx=cam.cx, cy=cam.cy)
    rng = np.random.default_rng(3)
    xi = rng.normal(0, 0.02, (K, 6)).astype(np.float32)
    xi[0] = 0
    R0, t0 = lie.se3_retract(jnp.asarray(sc.R_cw), jnp.asarray(sc.t_cw),
                             jnp.asarray(xi))
    X0 = sc.X + rng.normal(0, 0.05, sc.X.shape)
    # features 0..159 observe landmark ids 0..159; remaining capacity unused
    obs = np.full((K, NF), -1, np.int32)
    obs[:, :160] = np.where(sc.vis > 0, np.arange(160)[None, :], -1)
    fv = np.zeros((K, NF), bool)
    fv[:, :160] = sc.vis > 0
    uvf = np.zeros((K, NF, 2), np.float32)
    uvf[:, :160] = sc.uv
    for s in (sys_d, sys_s):
        mm = s.map._replace(
            kf_valid=jnp.asarray(np.arange(16) < K),
            kf_R=s.map.kf_R.at[:K].set(R0),
            kf_t=s.map.kf_t.at[:K].set(t0),
            kf_uv=s.map.kf_uv.at[:K].set(jnp.asarray(uvf)),
            kf_obs_lm=s.map.kf_obs_lm.at[:K].set(jnp.asarray(obs)),
            kf_feat_valid=s.map.kf_feat_valid.at[:K].set(jnp.asarray(fv)),
            lm_X=jnp.asarray(X0, jnp.float32),
            lm_valid=jnp.ones((160,), bool),
            n_kf=jnp.asarray(K, jnp.int32),
            n_lm=jnp.asarray(160, jnp.int32),
        )
        s.map = mm

    sys_d._run_global_ba(n_iters=10)
    sys_s._run_global_ba(n_iters=10)

    ed = _pose_err(sys_d.map, sc, K)
    es = _pose_err(sys_s.map, sc, K)
    assert ed < 8e-3, ed
    assert abs(ed - es) < 5e-3, (ed, es)
    # the two engines' maps agree keyframe by keyframe
    assert np.allclose(np.asarray(sys_d.map.kf_t[:K]),
                       np.asarray(sys_s.map.kf_t[:K]), atol=2e-2)
