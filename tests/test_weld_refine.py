"""Pixel-accurate Atlas welds: refine_weld_pnp + duplicate-landmark
aliasing (atlas/merging.py).

The 3D-3D Sim3 between two mono maps is only as accurate as triangulated
landmark depth (a few percent of scene depth); the weld's real rigidity
must come from (a) a reprojection-refined Sim3 seed and (b) cross-map
observations created by aliasing duplicate landmarks, which a subsequent
BA can then bind. This test constructs two synthetic map fragments of the
same scene — the second in a rotated/scaled/offset world with NOISY
landmark positions — and checks that the PnP refinement recovers the true
Sim3 far better than the noisy 3D-3D solve, and that aliasing rewires the
old map's observations onto the active ids.
"""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros2_tpu.atlas import map_state as ms
from orb_slam3_ros2_tpu.atlas import merging
from orb_slam3_ros2_tpu.geom import lie

FX = FY = 300.0
CX, CY = 160.0, 120.0
W, H = 320, 240


def _project(R, t, X):
    xc = X @ R.T + t
    return np.stack([FX * xc[:, 0] / xc[:, 2] + CX,
                     FY * xc[:, 1] / xc[:, 2] + CY], axis=-1)


def _build_pair(noise_3d=0.03, depth_bias=0.05, seed=0):
    """Active map A (one kf at identity) and old map O (same physical
    scene, world transformed by Sim3 g: x_A = s R x_O + t). The old map's
    landmarks carry a DEPTH-CORRELATED bias (points pushed away along the
    old camera's rays, mimicking mono triangulation depth error) plus
    small random noise — the regime where a 3D-3D Sim3 is systematically
    wrong but reprojection stays pixel-exact."""
    rng = np.random.default_rng(seed)
    N = 120
    X_A = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                    rng.uniform(4, 8, N)], axis=-1).astype(np.float32)
    # groundtruth Sim3 active <- old
    s_gt = 1.3
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.2])),
                      np.float32)
    t_gt = np.array([0.4, -0.2, 0.3], np.float32)
    # old-world landmark positions: x_O = (1/s) R^T (x_A - t)
    X_O_true = ((X_A - t_gt) @ R_gt) / s_gt

    bits = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
    cfg = ms.MapConfig(max_kf=8, max_lm=512, n_feat=256)

    def build(X_world, R_kf, t_kf, uv):
        m = ms.empty_map(cfg)
        n = N
        obs = np.full((cfg.n_feat,), -1, np.int32)
        obs[:n] = np.arange(n)
        fv = np.zeros((cfg.n_feat,), bool)
        fv[:n] = True
        uv_pad = np.zeros((cfg.n_feat, 2), np.float32)
        uv_pad[:n] = uv
        kf_bits = np.zeros((cfg.n_feat, 8), np.uint32)
        kf_bits[:n] = bits
        return m._replace(
            kf_R=m.kf_R.at[0].set(jnp.asarray(R_kf)),
            kf_t=m.kf_t.at[0].set(jnp.asarray(t_kf)),
            kf_valid=m.kf_valid.at[0].set(True),
            kf_uv=m.kf_uv.at[0].set(jnp.asarray(uv_pad)),
            kf_bits=m.kf_bits.at[0].set(jnp.asarray(kf_bits)),
            kf_feat_valid=m.kf_feat_valid.at[0].set(jnp.asarray(fv)),
            kf_obs_lm=m.kf_obs_lm.at[0].set(jnp.asarray(obs)),
            lm_X=m.lm_X.at[:n].set(jnp.asarray(X_world)),
            lm_valid=m.lm_valid.at[:n].set(True),
            lm_bits=m.lm_bits.at[:n].set(jnp.asarray(bits)),
            lm_n_obs=m.lm_n_obs.at[:n].set(2),
            n_kf=jnp.asarray(1, jnp.int32),
            n_lm=jnp.asarray(n, jnp.int32),
        )

    # active kf at identity observes the TRUE active-world points (pixel
    # observations are exact; only the 3D estimates are noisy)
    X_A_noisy = (X_A + rng.normal(0, noise_3d, X_A.shape)).astype(np.float32)
    uv_A = _project(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                    X_A).astype(np.float32)
    mA = build(X_A_noisy, np.eye(3), np.zeros(3), uv_A)
    # old kf: camera at old-world pose whose active-world equivalent is
    # identity; in old world: R_cw_o = R_gt^T ... derive via the transform
    # rule R_cw' = R_cw_o R^T with R_cw' = I  =>  R_cw_o = R_gt
    # t_cw' = s t_o - R_cw' t = 0  =>  t_o = t / s ... solve: t_o such that
    # s*t_o - I@t_gt = 0
    R_o = R_gt
    t_o = (t_gt / s_gt) @ np.eye(3)
    t_o = np.asarray(R_gt.T @ (t_gt / s_gt) * 0 + t_gt / s_gt, np.float32)
    # old map 3D estimates: depth-biased along the old camera's rays
    # (+ small noise); old kf observes the true points at exact pixels
    x_c = X_O_true @ R_o.T + t_o
    x_c_biased = x_c * (1.0 + depth_bias)
    X_O = ((x_c_biased - t_o) @ R_o
           + rng.normal(0, noise_3d, X_A.shape)).astype(np.float32)
    uv_O = _project(R_o, t_o, X_O_true).astype(np.float32)
    mO = build(X_O, R_o, t_o, uv_O)
    return mA, mO, (R_gt, t_gt, s_gt), cfg


def _sim3_err(cand, gt):
    R_gt, t_gt, s_gt = gt
    dR = float(np.linalg.norm(cand.R - R_gt))
    dt = float(np.linalg.norm(cand.t - t_gt))
    ds = abs(cand.s - s_gt) / s_gt
    return dR, dt, ds


def test_refine_weld_pnp_beats_3d3d():
    mA, mO, gt, cfg = _build_pair(seed=2)
    cand = merging.detect_cross_map(mA, 0, mO, 0, jax.random.PRNGKey(0),
                                    fix_scale=False, min_inliers=20)
    assert cand is not None and cand.ok
    assert cand.lm_pairs.shape[0] >= 20
    dR0, dt0, _ = _sim3_err(cand, gt)
    refined = merging.refine_weld_pnp(mA, mO, cand, FX, FY, CX, CY)
    dR1, dt1, _ = _sim3_err(refined, gt)
    # reprojection refinement must beat the 3D-3D seed (the planted depth
    # bias leaves a systematic error in the 3D-3D alignment that
    # reprojection does not inherit). r4 note: the pre-fix 3D-3D seed was
    # INVERTED (solve_sim3 argument swap) so 'refine beats seed 4x' was
    # trivially true; with a correct seed the honest bar is absolute
    # quality plus a solid relative improvement.
    assert dt1 < 0.1, (dt0, dt1)
    assert dR1 < 0.05, (dR0, dR1)
    # translation/scale carry the depth-bias systematic — refinement must
    # clearly improve them; rotation is already near-correct in the seed,
    # so it only has to not regress
    assert dt1 < 0.75 * dt0, (dt0, dt1)
    assert dR1 <= dR0 * 1.05, (dR0, dR1)


def test_merge_with_alias_rewires_observations():
    mA, mO, gt, cfg = _build_pair(seed=3)
    cand = merging.detect_cross_map(mA, 0, mO, 0, jax.random.PRNGKey(1),
                                    fix_scale=False, min_inliers=20)
    cand = merging.refine_weld_pnp(mA, mO, cand, FX, FY, CX, CY)
    alias = np.full(cfg.max_lm, -1, np.int32)
    alias[cand.lm_pairs[:, 1]] = cand.lm_pairs[:, 0]
    merged, kept, off = merging.merge_maps(mA, mO, cand.R, cand.t, cand.s,
                                           cfg, lm_alias=alias)
    # the old keyframe landed in slot 1 and its aliased observations point
    # at ACTIVE landmark ids (cross-map observations exist)
    obs_new = np.asarray(merged.kf_obs_lm[1])
    n_cross = 0
    for la, lo in cand.lm_pairs:
        js = np.flatnonzero(np.asarray(mO.kf_obs_lm[0]) == lo)
        for j in js:
            assert obs_new[j] == la, (j, obs_new[j], la)
            n_cross += 1
    assert n_cross >= 20
    # aliased duplicates were NOT copied into new slots
    n_lm_A = int(np.asarray(mA.lm_valid).sum())
    n_alias = int((alias >= 0).sum())
    n_lm_merged = int(np.asarray(merged.lm_valid).sum())
    n_lm_O = int(np.asarray(mO.lm_valid).sum())
    assert n_lm_merged == n_lm_A + n_lm_O - n_alias
