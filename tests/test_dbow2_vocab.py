"""DBoW2 ORBvoc.txt loader: format acceptance, level flattening, round-trip
(reference ctor contract: `/root/reference/src/imu_mono_realsense.cpp:52-53`
loads the DBoW2 text vocabulary)."""

import numpy as np
import pytest

from orb_slam3_ros2_tpu.loop import dbow2, vocab


def _write_tree_vocab(path, k=3, L=2, seed=0):
    """Synthetic k-ary tree vocabulary: 3 level-1 nodes, 9 level-2 leaves."""
    rng = np.random.default_rng(seed)
    lines = [f"{k} {L} 0 0"]
    node_id = 0
    level1 = []
    for _ in range(k):
        node_id += 1
        level1.append(node_id)
        b = rng.integers(0, 256, 32)
        lines.append("0 0 " + " ".join(map(str, b)) + " 0.0")
    leaves = []
    for p in level1:
        for _ in range(k):
            node_id += 1
            b = rng.integers(0, 256, 32)
            w = rng.uniform(0.1, 2.0)
            lines.append(f"{p} 1 " + " ".join(map(str, b)) + f" {w:.6f}")
            leaves.append(b)
    path.write_text("\n".join(lines) + "\n")
    return np.array(leaves, np.uint8)


def test_loads_tree_and_pads_to_codebook_width(tmp_path):
    p = tmp_path / "voc.txt"
    leaf_bytes = _write_tree_vocab(p)
    A = dbow2.load_dbow2_text(str(p))
    assert A.shape == (vocab.N_WORDS, 256)
    assert np.all(np.abs(A) == 1.0)
    # the 9 leaves (level closest to 1024 among {1: 3, 2: 9}) lead the book
    leaf_signs = dbow2._bytes_to_signs(leaf_bytes)
    got = {tuple(r) for r in A[:9].tolist()}
    want = {tuple(r) for r in leaf_signs.tolist()}
    assert got == want


def test_roundtrip_flat_codebook(tmp_path):
    rng = np.random.default_rng(1)
    book = np.where(rng.random((vocab.N_WORDS, 256)) < 0.5, -1.0, 1.0
                    ).astype(np.float32)
    p = tmp_path / "flat.txt"
    dbow2.save_dbow2_text(str(p), book)
    loaded = dbow2.load_dbow2_text(str(p))
    np.testing.assert_array_equal(loaded, book)


def test_system_accepts_orbvoc_txt(tmp_path):
    import os

    rng = np.random.default_rng(2)
    book = np.where(rng.random((vocab.N_WORDS, 256)) < 0.5, -1.0, 1.0
                    ).astype(np.float32)
    p = tmp_path / "ORBvoc.txt"
    dbow2.save_dbow2_text(str(p), book)

    from orb_slam3_ros2_tpu.runtime.system import Sensor, System

    settings = os.path.join(os.path.dirname(__file__), "data",
                            "synth_cam.yaml")
    try:
        System(str(p), settings, Sensor.MONOCULAR)
        installed = np.asarray(vocab.anchors())
        np.testing.assert_array_equal(installed, book)
    finally:
        vocab._ACTIVE_ANCHORS = None  # don't leak into other tests
        import jax

        jax.clear_caches()


def test_rejects_malformed_file(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("10 6 0 0\n1 2 3\n")
    with pytest.raises(ValueError):
        dbow2.load_dbow2_text(str(p))
