"""Cross-map place recognition + map merging (E8 / E9).

Reference behavior [upstream `LoopClosing::MergeLocal`]: when place
recognition matches the current keyframe against a keyframe of a *non-active*
Atlas map, a Sim3 between the two worlds is solved from 3D-3D landmark
correspondences, the old map is transported into the active world, and its
keyframes/landmarks are welded into the active map. The reference exposes the
multi-map machinery through the Atlas save/load keys
(`/root/reference/config/Monocular/MilkV.yaml:74-75`) and spawns the extra
maps on tracking loss (`README.md:113-115` "map keeps getting lost").

TPU-native note: merging is a rare host-side event (not a per-frame op), so
it runs in numpy over the fixed-capacity arrays; the merged map is a normal
`MapState` ready for jitted consumption. Capacity overflow drops the
lowest-value content (oldest keyframes, least-observed landmarks) rather
than failing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.atlas import map_state as ms
from orb_slam3_ros2_tpu.loop import sim3 as sim3_mod
from orb_slam3_ros2_tpu.ops import matcher
from orb_slam3_ros2_tpu.ops import orb_descriptor as desc_ops


class MergeCandidate(NamedTuple):
    ok: bool
    old_kf: int
    # Sim3 active <- old : x_active = s · R @ x_old + t
    R: np.ndarray
    t: np.ndarray
    s: float
    n_inliers: int


@jax.jit
def _match_cross(bits_a, valid_a, bits_b, valid_b):
    sa = desc_ops.signs_from_bits(bits_a)
    sb = desc_ops.signs_from_bits(bits_b)
    res = matcher.match(sa, valid_a, sb, valid_b,
                        max_dist=50.0, ratio=0.8, mutual=True)
    return res.idx


def detect_cross_map(
    active: ms.MapState,
    new_kf: int,
    old: ms.MapState,
    old_kf: int,
    key,
    fix_scale: bool = False,
    min_inliers: int = 20,
) -> Optional[MergeCandidate]:
    """Verify a cross-map BoW hit: 3D-3D Sim3 between the two worlds."""
    idx = np.asarray(_match_cross(
        active.kf_bits[new_kf],
        active.kf_feat_valid[new_kf] & (active.kf_obs_lm[new_kf] >= 0),
        old.kf_bits[old_kf],
        old.kf_feat_valid[old_kf] & (old.kf_obs_lm[old_kf] >= 0),
    ))
    obs_a = np.asarray(active.kf_obs_lm[new_kf])
    obs_b = np.asarray(old.kf_obs_lm[old_kf])
    Xa = np.asarray(active.lm_X)
    Xb = np.asarray(old.lm_X)
    va = np.asarray(active.lm_valid)
    vb = np.asarray(old.lm_valid)

    N = idx.shape[0]
    pa = np.zeros((N, 3), np.float32)
    pb = np.zeros((N, 3), np.float32)
    mask = np.zeros((N,), bool)
    for i in range(N):
        j = idx[i]
        if j < 0:
            continue
        la, lb = obs_a[i], obs_b[j]
        if la < 0 or lb < 0 or not (va[la] and vb[lb]):
            continue
        pa[i] = Xa[la]
        pb[i] = Xb[lb]
        mask[i] = True
    if mask.sum() < min_inliers:
        return None

    # x_active = s R x_old + t
    res = sim3_mod.solve_sim3(
        key, jnp.asarray(pb), jnp.asarray(pa), jnp.asarray(mask),
        fix_scale=fix_scale, min_inliers=min_inliers,
    )
    if not bool(res.ok):
        return None
    return MergeCandidate(
        ok=True, old_kf=old_kf, R=np.asarray(res.R), t=np.asarray(res.t),
        s=float(res.s), n_inliers=int(res.n_inliers),
    )


def merge_maps(
    active: ms.MapState,
    old: ms.MapState,
    R_ao: np.ndarray,
    t_ao: np.ndarray,
    s_ao: float,
    cfg: ms.MapConfig,
) -> Tuple[ms.MapState, np.ndarray, int]:
    """Weld `old` (transformed by Sim3 active←old) into `active`.

    Keyframe poses transform scale-consistently: with X_a = s R X_o + t and
    uniform scaling of camera coords leaving projections invariant,
        R_cw' = R_cw_o Rᵀ,   t_cw' = s·t_cw_o − R_cw' t.
    Returns (merged map, kept-old-KF index array, kf slot offset) so the
    caller can transport the BoW database rows of the surviving keyframes.
    """
    A = {k: np.array(v) for k, v in active._asdict().items()}  # mutable copies
    O = {k: np.asarray(v) for k, v in old._asdict().items()}
    n_kf_a = int(A["n_kf"])
    n_kf_o = int(O["n_kf"])
    K, L, _ = cfg.max_kf, cfg.max_lm, cfg.n_feat

    # ---- keyframes: most recent old KFs fill the remaining capacity
    room_kf = K - n_kf_a
    take_kf = min(n_kf_o, room_kf)
    kept_kf = np.arange(n_kf_o - take_kf, n_kf_o)  # old ids kept, in order

    # ---- landmarks: highest-observation-count first
    lm_valid_o = O["lm_valid"].copy()
    lm_ids_o = np.where(lm_valid_o)[0]
    n_lm_a = int(A["lm_valid"].sum())
    room_lm = L - n_lm_a
    if len(lm_ids_o) > room_lm:
        order = np.argsort(-O["lm_n_obs"][lm_ids_o])
        lm_ids_o = lm_ids_o[order[:room_lm]]
    free_slots = np.where(~A["lm_valid"])[0][: len(lm_ids_o)]
    lm_remap = np.full(L, -1, np.int32)
    lm_remap[lm_ids_o] = free_slots

    # ---- transforms
    R_ao = np.asarray(R_ao, np.float32)
    t_ao = np.asarray(t_ao, np.float32)
    s = float(s_ao)
    X_o = O["lm_X"]
    X_t = s * X_o @ R_ao.T + t_ao
    R_cw_t = O["kf_R"] @ R_ao.T[None]
    t_cw_t = s * O["kf_t"] - np.einsum("kij,j->ki", R_cw_t, t_ao)

    # ---- write keyframes
    for i, ko in enumerate(kept_kf):
        kn = n_kf_a + i
        A["kf_R"][kn] = R_cw_t[ko]
        A["kf_t"][kn] = t_cw_t[ko]
        A["kf_valid"][kn] = True
        A["kf_time"][kn] = O["kf_time"][ko]
        A["kf_uv"][kn] = O["kf_uv"][ko]
        A["kf_level"][kn] = O["kf_level"][ko]
        A["kf_bits"][kn] = O["kf_bits"][ko]
        A["kf_feat_valid"][kn] = O["kf_feat_valid"][ko]
        obs = O["kf_obs_lm"][ko]
        A["kf_obs_lm"][kn] = np.where(obs >= 0, lm_remap[np.clip(obs, 0, L - 1)],
                                      -1)

    # ---- write landmarks
    kf_off = n_kf_a - (n_kf_o - take_kf)  # new id = old id + kf_off (if kept)
    for lo, ln in zip(lm_ids_o, free_slots):
        A["lm_X"][ln] = X_t[lo]
        A["lm_valid"][ln] = True
        A["lm_bits"][ln] = O["lm_bits"][lo]
        ref_new = int(O["lm_ref_kf"][lo]) + kf_off
        A["lm_ref_kf"][ln] = np.clip(ref_new, 0, K - 1)
        A["lm_n_obs"][ln] = O["lm_n_obs"][lo]
        A["lm_found"][ln] = O["lm_found"][lo]
        A["lm_visible"][ln] = O["lm_visible"][lo]

    A["n_kf"] = np.asarray(n_kf_a + take_kf, np.int32)
    A["n_lm"] = np.asarray(
        max(int(A["n_lm"]), int(free_slots.max()) + 1 if len(free_slots) else 0),
        np.int32,
    )
    merged = ms.MapState(**{k: jnp.asarray(v) for k, v in A.items()})
    return merged, kept_kf, n_kf_a
