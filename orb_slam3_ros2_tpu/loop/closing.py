"""Loop-closing orchestration (E8): candidate detection, Sim3 verification,
pose-graph correction, landmark transport.

Reference behavior [upstream `LoopClosing` thread]: every new keyframe is
queried against the BoW database (minus the covisible neighborhood); a
candidate passes descriptor matching + `Sim3Solver` RANSAC; on acceptance
the essential graph is optimized over Sim3 (7-DoF mono / 6-DoF inertial) and
map points are transported through their reference keyframe's correction;
a global BA follows. The fork exposes a `loopClosing` on/off switch
(`/root/reference/config/Monocular-Inertial/RealSense_D435i.yaml:9`).

TPU-native: fixed-capacity edge lists over the map's keyframe capacity; the
host only sequences the stages (all compute jitted). The odometry edges are
built from the *pre-correction* poses so drift is preserved as relative
constraints, exactly like the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.atlas import map_state as ms
from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.loop import pose_graph as pg
from orb_slam3_ros2_tpu.loop import sim3 as sim3_mod
from orb_slam3_ros2_tpu.ops import matcher
from orb_slam3_ros2_tpu.ops import orb_descriptor as desc_ops


class LoopCandidate(NamedTuple):
    ok: bool
    cand_kf: int
    R: np.ndarray  # Sim3 correction: x_old ≈ s R x_new + t (world-to-world)
    t: np.ndarray
    s: float
    n_inliers: int


@jax.jit
def _match_kf_pair(m: ms.MapState, kf_a, kf_b):
    """Descriptor match between two keyframes' features (landmark-bearing)."""
    sa = desc_ops.signs_from_bits(m.kf_bits[kf_a])
    sb = desc_ops.signs_from_bits(m.kf_bits[kf_b])
    va = m.kf_feat_valid[kf_a] & (m.kf_obs_lm[kf_a] >= 0)
    vb = m.kf_feat_valid[kf_b] & (m.kf_obs_lm[kf_b] >= 0)
    res = matcher.match(sa, va, sb, vb, max_dist=50.0, ratio=0.8, mutual=True)
    return res.idx


def detect_and_verify(
    m: ms.MapState,
    new_kf: int,
    cand_kf: int,
    key,
    fix_scale: bool = False,
    min_inliers: int = 20,
) -> Optional[LoopCandidate]:
    """Geometric verification of a BoW candidate via 3D-3D Sim3 RANSAC."""
    idx = np.asarray(_match_kf_pair(m, jnp.asarray(new_kf), jnp.asarray(cand_kf)))
    obs_a = np.asarray(m.kf_obs_lm[new_kf])
    obs_b = np.asarray(m.kf_obs_lm[cand_kf])
    lm_X = np.asarray(m.lm_X)
    lm_valid = np.asarray(m.lm_valid)

    N = idx.shape[0]
    pairs_a = np.zeros((N, 3), np.float32)
    pairs_b = np.zeros((N, 3), np.float32)
    mask = np.zeros((N,), bool)
    for i in range(N):
        j = idx[i]
        if j < 0:
            continue
        la, lb = obs_a[i], obs_b[j]
        if la < 0 or lb < 0 or not (lm_valid[la] and lm_valid[lb]):
            continue
        pairs_a[i] = lm_X[la]
        pairs_b[i] = lm_X[lb]
        mask[i] = True
    if mask.sum() < min_inliers:
        return None

    res = sim3_mod.solve_sim3(
        key, jnp.asarray(pairs_b), jnp.asarray(pairs_a), jnp.asarray(mask),
        fix_scale=fix_scale, min_inliers=min_inliers,
    )
    if not bool(res.ok):
        return None
    return LoopCandidate(
        ok=True, cand_kf=cand_kf,
        R=np.asarray(res.R), t=np.asarray(res.t), s=float(res.s),
        n_inliers=int(res.n_inliers),
    )


def close_loop(
    m: ms.MapState,
    new_kf: int,
    cand: LoopCandidate,
    fix_scale: bool = False,
    n_iters: int = 12,
) -> ms.MapState:
    """Pose-graph correction + landmark transport after an accepted loop."""
    K = m.kf_R.shape[0]
    n_kf = int(m.n_kf)

    R_old = np.asarray(m.kf_R)
    t_old = np.asarray(m.kf_t)
    s_old = np.ones((K,), np.float32)

    # odometry edges i -> i-1 from pre-correction poses; loop edge new->cand
    E_cap = K + 8
    ei = np.zeros((E_cap,), np.int32)
    ej = np.zeros((E_cap,), np.int32)
    Rm = np.tile(np.eye(3, dtype=np.float32), (E_cap, 1, 1))
    tm = np.zeros((E_cap, 3), np.float32)
    sm = np.ones((E_cap,), np.float32)
    ev = np.zeros((E_cap,), bool)

    def rel(i, j):
        Rr, tr, sr = lie.sim3_compose(
            jnp.asarray(R_old[i]), jnp.asarray(t_old[i]), jnp.asarray(1.0),
            *lie.sim3_inverse(
                jnp.asarray(R_old[j]), jnp.asarray(t_old[j]), jnp.asarray(1.0)
            ),
        )
        return np.asarray(Rr), np.asarray(tr), float(sr)

    e = 0
    for k in range(1, n_kf):
        Rr, tr, sr = rel(k, k - 1)
        ei[e], ej[e] = k, k - 1
        Rm[e], tm[e], sm[e] = Rr, tr, sr
        ev[e] = True
        e += 1

    # loop edge: corrected pose of new KF = S_new_old ∘ S_corr⁻¹
    S_corr_inv = lie.sim3_inverse(
        jnp.asarray(cand.R), jnp.asarray(cand.t), jnp.asarray(cand.s)
    )
    R_newc, t_newc, s_newc = lie.sim3_compose(
        jnp.asarray(R_old[new_kf]), jnp.asarray(t_old[new_kf]),
        jnp.asarray(1.0), *S_corr_inv,
    )
    R_loop, t_loop, s_loop = lie.sim3_compose(
        R_newc, t_newc, s_newc,
        *lie.sim3_inverse(
            jnp.asarray(R_old[cand.cand_kf]), jnp.asarray(t_old[cand.cand_kf]),
            jnp.asarray(1.0),
        ),
    )
    ei[e], ej[e] = new_kf, cand.cand_kf
    Rm[e], tm[e], sm[e] = np.asarray(R_loop), np.asarray(t_loop), float(s_loop)
    ev[e] = True
    loop_w = np.ones((E_cap,), np.float32)
    loop_w[e] = float(max(n_kf - 1, 1))  # loop edge outweighs one odo edge
    e += 1

    fixed = np.zeros((K,), bool)
    fixed[cand.cand_kf] = True
    fixed[0] = True
    # invalid / future slots held fixed so the solve stays well-posed
    fixed[n_kf:] = True

    out = pg.optimize_pose_graph(
        jnp.asarray(R_old), jnp.asarray(t_old), jnp.asarray(s_old),
        jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(Rm), jnp.asarray(tm), jnp.asarray(sm),
        jnp.asarray(ev), jnp.asarray(fixed),
        edge_weight=jnp.asarray(loop_w * ev),
        n_iters=n_iters, fix_scale=fix_scale,
    )

    return _apply_correction(m, jnp.asarray(R_old), jnp.asarray(t_old),
                             out.R, out.t, out.s)


@jax.jit
def _apply_correction(m: ms.MapState, R_old, t_old, R_new, t_new, s_new):
    """Transport landmarks through their reference keyframe's correction and
    convert corrected Sim3 poses back to SE(3) ([R | t/s], upstream)."""
    ref = jnp.clip(m.lm_ref_kf, 0, R_old.shape[0] - 1)
    x_r = lie.se3_apply(R_old[ref], t_old[ref], m.lm_X)  # lm in ref-kf frame
    Rn, tn, sn = lie.sim3_inverse(R_new[ref], t_new[ref], s_new[ref])
    X_corr = lie.sim3_apply(Rn, tn, sn, x_r)
    lm_X = jnp.where(m.lm_valid[:, None], X_corr, m.lm_X)

    kf_t_se3 = t_new / jnp.maximum(s_new[:, None], 1e-8)
    kf_R = jnp.where(m.kf_valid[:, None, None], R_new, m.kf_R)
    kf_t = jnp.where(m.kf_valid[:, None], kf_t_se3, m.kf_t)
    return m._replace(kf_R=kf_R, kf_t=kf_t, lm_X=lm_X)
