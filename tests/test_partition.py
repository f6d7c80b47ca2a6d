"""Covisibility-aware keyframe partitioning (parallel/partition.py).

Planted-structure test: a trajectory that revisits a place puts strongly
covisible keyframes far apart in TIME; contiguous chunking cuts exactly
those loop edges and round-robin cuts everything. The partitioner must
recover the true regions and beat both baselines on cut weight."""

import numpy as np

from orb_slam3_ros2_tpu.parallel import partition


def _planted_covis(seed=0):
    """64 keyframes, two spatial regions visited as A(0:16) B(16:32)
    A(32:48) B(48:64) — the revisit pattern loop closure creates."""
    rng = np.random.default_rng(seed)
    region = np.zeros(64, int)
    region[16:32] = 1
    region[48:64] = 1
    W = np.zeros((64, 64))
    same = region[:, None] == region[None, :]
    W[same] = rng.uniform(20, 60, same.sum())
    W[~same] = rng.uniform(0, 1.5, (~same).sum())  # weak cross-region noise
    W = (W + W.T) / 2
    np.fill_diagonal(W, 0)
    return W, region


def test_partition_recovers_planted_regions():
    W, region = _planted_covis()
    assign = partition.partition_keyframes(W, 2)
    # each shard must be (almost) pure one region
    for s in (0, 1):
        members = region[assign == s]
        purity = max((members == 0).mean(), (members == 1).mean())
        assert purity >= 0.9, f"shard {s} purity {purity}"
    # balanced
    sizes = np.bincount(assign, minlength=2)
    assert sizes.max() - sizes.min() <= 2


def test_partition_beats_contiguous_and_round_robin():
    W, _ = _planted_covis()
    K = W.shape[0]
    ours = partition.cut_fraction(W, partition.partition_keyframes(W, 2))
    contiguous = partition.cut_fraction(
        W, (np.arange(K) >= K // 2).astype(np.int32))
    rr = partition.cut_fraction(W, (np.arange(K) % 2).astype(np.int32))
    assert ours < 0.5 * contiguous, (ours, contiguous)
    assert ours < 0.5 * rr, (ours, rr)


def test_partition_four_shards_balanced():
    W, _ = _planted_covis(seed=3)
    assign = partition.partition_keyframes(W, 4)
    sizes = np.bincount(assign, minlength=4)
    assert sizes.min() >= 1
    assert sizes.max() <= int(np.ceil(64 / 4)) + 1
    assert partition.cut_fraction(W, assign) <= partition.cut_fraction(
        W, (np.arange(64) % 4).astype(np.int32))


def test_shard_indices_shapes_and_padding():
    assign = np.array([0, 1, 0, 1, 1, 2], np.int32)
    idx, valid = partition.shard_indices(assign, 3)
    assert idx.shape == valid.shape == (3, 3)
    assert valid.sum() == 6
    np.testing.assert_array_equal(np.sort(idx[valid]), np.arange(6))
    # padding repeats a real member (in-bounds gathers)
    assert idx[2, 1] == idx[2, 0]


def test_boundary_keyframes():
    W = np.zeros((4, 4))
    W[0, 1] = W[1, 0] = 5.0  # within shard 0
    W[1, 2] = W[2, 1] = 3.0  # crosses
    assign = np.array([0, 0, 1, 1], np.int32)
    b = partition.boundary_keyframes(W, assign)
    np.testing.assert_array_equal(b, [False, True, True, False])


def test_partition_on_real_covisibility():
    """End-to-end shape: covisibility from a MapState built by make_scene
    observations, partitioned, cut no worse than round-robin."""
    import jax.numpy as jnp

    from orb_slam3_ros2_tpu.atlas import map_state as ms
    from orb_slam3_ros2_tpu.io import synthetic

    sc = synthetic.make_scene(n_frames=12, n_points=200, seed=2)
    cfg = ms.MapConfig(max_kf=16, max_lm=256, n_feat=256)
    m = ms.empty_map(cfg)
    # obs indicator: kf k observes landmark l where vis
    obs = np.full((16, 256), -1, np.int32)
    for k in range(12):
        vis = np.where(sc.vis[k])[0][:256]
        obs[k, : len(vis)] = vis
    m = m._replace(
        kf_obs_lm=m.kf_obs_lm.at[:, : obs.shape[1]].set(jnp.asarray(obs)),
        kf_feat_valid=jnp.asarray(obs >= 0),
        kf_valid=m.kf_valid.at[:12].set(True),
        lm_valid=m.lm_valid.at[:200].set(True),
        n_kf=jnp.asarray(12, m.n_kf.dtype),
    )
    covis = np.asarray(ms.covisibility_matrix(m))[:12, :12]
    assert covis.max() > 0
    assign = partition.partition_keyframes(covis, 2)
    assert partition.cut_fraction(covis, assign) <= partition.cut_fraction(
        covis, (np.arange(12) % 2).astype(np.int32)) + 1e-9
