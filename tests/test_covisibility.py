"""Covisibility graph: matrix correctness, local-window selection, essential
graph edges (reference: per-KeyFrame mConnectedKeyFrameWeights maintained by
UpdateConnections, consumed by local BA / essential graph / loop-candidate
exclusion [upstream]; SURVEY.md §7 hard part 1)."""

import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.atlas import map_state as ms
from orb_slam3_ros2_tpu.frontend import tracking as trk
from orb_slam3_ros2_tpu.loop import closing


def _map_with_obs(obs_rows, n_lm=16, max_kf=8, n_feat=6):
    """Build a MapState whose kf i observes landmark ids obs_rows[i]."""
    cfg = ms.MapConfig(max_kf=max_kf, max_lm=n_lm, n_feat=n_feat)
    m = ms.empty_map(cfg)
    K = len(obs_rows)
    obs = np.full((max_kf, n_feat), -1, np.int32)
    fv = np.zeros((max_kf, n_feat), bool)
    for i, row in enumerate(obs_rows):
        for f, lm in enumerate(row):
            obs[i, f] = lm
            fv[i, f] = True
    m = m._replace(
        kf_valid=jnp.asarray(np.arange(max_kf) < K),
        kf_obs_lm=jnp.asarray(obs),
        kf_feat_valid=jnp.asarray(fv),
        lm_valid=jnp.ones((n_lm,), bool),
        n_kf=jnp.asarray(K, jnp.int32),
        n_lm=jnp.asarray(n_lm, jnp.int32),
    )
    return m


def test_covisibility_matrix_counts_shared_landmarks():
    m = _map_with_obs([
        [0, 1, 2, 3],      # kf0
        [2, 3, 4, 5],      # kf1: shares {2,3} with kf0
        [5, 6, 7, 8],      # kf2: shares {5} with kf1, nothing with kf0
    ])
    C = np.asarray(ms.covisibility_matrix(m))
    assert C[0, 1] == 2 and C[1, 0] == 2
    assert C[1, 2] == 1 and C[2, 1] == 1
    assert C[0, 2] == 0
    assert np.all(np.diag(C) == 0)
    # invalid keyframe rows/cols are zero
    assert np.all(C[3:] == 0) and np.all(C[:, 3:] == 0)


def test_covisibility_ignores_invalid_landmarks_and_features():
    m = _map_with_obs([[0, 1], [0, 1]], n_lm=4)
    # invalidate landmark 1 -> shared count drops to 1
    m = m._replace(lm_valid=m.lm_valid.at[1].set(False))
    C = np.asarray(ms.covisibility_matrix(m))
    assert C[0, 1] == 1
    # invalidate kf0's feature observing lm 0 -> no sharing at all
    m = m._replace(kf_feat_valid=m.kf_feat_valid.at[0, 0].set(False))
    C = np.asarray(ms.covisibility_matrix(m))
    assert C[0, 1] == 0


def test_select_local_window_prefers_covisible_over_consecutive():
    # kf3 shares heavily with kf0 (revisit), lightly with kf2, not with kf1
    m = _map_with_obs([
        [0, 1, 2, 3, 4],   # kf0
        [8, 9, 10, 11],    # kf1 (disjoint)
        [4, 12],           # kf2
        [0, 1, 2, 3, 12],  # kf3: shares 4 with kf0, 1 with kf2, 0 with kf1
    ])
    ids, fixed = trk.select_local_window(
        m, jnp.asarray(3, jnp.int32), n_window=3, n_fixed_ring=2
    )
    ids = np.asarray(ids)
    fixed = np.asarray(fixed)
    assert ids[0] == 3
    assert set(ids[:3].tolist()) == {3, 0, 2}  # covisible set, NOT {1,2,3}
    # kf0 is in the window and is the gauge anchor
    assert fixed[np.flatnonzero(ids == 0)[0]]
    # window members other than the anchors optimize
    assert not fixed[0]


def test_select_local_window_fixed_ring_holds_second_ring():
    # chain: 0-1 share, 1-2 share, 2-3 share; window around 3 of size 2
    m = _map_with_obs([
        [0, 1], [1, 2], [2, 3], [3, 4],
    ])
    ids, fixed = trk.select_local_window(
        m, jnp.asarray(3, jnp.int32), n_window=2, n_fixed_ring=2
    )
    ids = np.asarray(ids)
    fixed = np.asarray(fixed)
    # window = {3, 2}; ring must contain kf1 (covisible with kf2), held fixed
    assert set(ids[:2].tolist()) == {3, 2}
    ring = ids[2:][fixed[2:] & (ids[2:] != 3)]
    assert 1 in ring.tolist()


def test_best_covisible_picks_top_sharer():
    m = _map_with_obs([
        [0, 1, 2], [5, 6], [0, 1, 3], [0, 1, 2, 3],
    ])
    best = int(trk.best_covisible(
        m, jnp.asarray(3, jnp.int32), jnp.asarray([3, 2], jnp.int32)
    ))
    assert best == 0  # shares 3 lms; kf2 excluded; kf1 shares none
    # nothing shared -> falls back to kf_id - 1
    m2 = _map_with_obs([[0], [1], [2]])
    best2 = int(trk.best_covisible(
        m2, jnp.asarray(2, jnp.int32), jnp.asarray([2, -5], jnp.int32)
    ))
    assert best2 == 1


def test_essential_graph_edges_include_covis_links():
    covis = np.zeros((6, 6), int)
    covis[0, 4] = covis[4, 0] = 50   # strong revisit link
    covis[1, 3] = covis[3, 1] = 5    # below threshold
    ei, ej = closing.essential_graph_edges(covis, n_kf=5, covis_th=20)
    pairs = {frozenset(p) for p in zip(ei.tolist(), ej.tolist())}
    # odometry chain
    for k in range(1, 5):
        assert frozenset((k, k - 1)) in pairs
    assert frozenset((4, 0)) in pairs
    assert frozenset((3, 1)) not in pairs
    # cap limits covis edges, never the chain
    ei2, ej2 = closing.essential_graph_edges(
        covis, n_kf=5, covis_th=20, max_covis_edges=0
    )
    assert len(ei2) == 4
