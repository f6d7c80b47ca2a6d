"""Trained-vocabulary path (ORBvoc.txt slot parity): k-majority training,
save/load, System ctor plumbing, and retrieval-purity gain over the random
codebook."""

import numpy as np
import pytest

from orb_slam3_ros2_tpu.loop import vocab as vocab_mod


@pytest.fixture(autouse=True)
def _restore_default_vocab():
    yield
    vocab_mod._ACTIVE_ANCHORS = None
    import jax

    jax.clear_caches()


def _clustered_signs(n_clusters=64, per=40, flip=0.08, seed=2):
    rng = np.random.default_rng(seed)
    centers = np.where(rng.random((n_clusters, 256)) < 0.5, -1.0, 1.0)
    signs, labels = [], []
    for c in range(n_clusters):
        flips = rng.random((per, 256)) < flip
        signs.append(np.where(flips, -centers[c], centers[c]))
        labels.append(np.full(per, c))
    return (np.concatenate(signs).astype(np.float32),
            np.concatenate(labels), centers)


def _purity(word_of, labels):
    """Fraction of descriptor pairs from the same cluster assigned the same
    word (higher = better codebook for place recognition)."""
    agree = total = 0
    for c in np.unique(labels):
        w = word_of[labels == c]
        counts = np.bincount(w)
        agree += (counts * (counts - 1)).sum() / 2
        total += len(w) * (len(w) - 1) / 2
    return agree / total


def test_trained_vocab_beats_random_codebook():
    signs, labels, _ = _clustered_signs(n_clusters=1500, per=3)
    A = vocab_mod.train_vocabulary(signs, iters=6, seed=0)
    assert A.shape == (vocab_mod.N_WORDS, 256)
    assert np.all(np.abs(A) == 1.0)

    rand = vocab_mod._anchors_np()
    w_rand = np.argmax(signs @ rand.T, axis=1)
    w_train = np.argmax(signs @ A.T, axis=1)
    p_rand, p_train = _purity(w_rand, labels), _purity(w_train, labels)
    assert p_train > p_rand + 0.1, (p_rand, p_train)


def test_save_load_set_roundtrip(tmp_path):
    signs, _, _ = _clustered_signs(n_clusters=1200, per=2)
    A = vocab_mod.train_vocabulary(signs, iters=3, seed=1)
    path = vocab_mod.save_vocabulary(str(tmp_path / "v"), A)
    B = vocab_mod.load_vocabulary(path)
    np.testing.assert_array_equal(A, B)

    import jax.numpy as jnp

    sgn = jnp.asarray(signs[:32])
    mask = jnp.ones(32, bool)
    w_default = np.asarray(vocab_mod.assign_words(sgn, mask))
    vocab_mod.set_vocabulary(B)
    w_trained = np.asarray(vocab_mod.assign_words(sgn, mask))
    assert (w_default != w_trained).any()


def test_system_ctor_loads_vocab(tmp_path):
    signs, _, _ = _clustered_signs(n_clusters=1200, per=2)
    A = vocab_mod.train_vocabulary(signs, iters=2, seed=3)
    path = vocab_mod.save_vocabulary(str(tmp_path / "voc"), A)

    from orb_slam3_ros2_tpu.runtime.system import Sensor, System

    System(path, "tests/data/synth_cam.yaml", Sensor.MONOCULAR)
    np.testing.assert_array_equal(vocab_mod._ACTIVE_ANCHORS, A)

    with pytest.raises(ValueError):
        vocab_mod.set_vocabulary(np.ones((3, 3), np.float32))
