"""Atlas save/load roundtrip; EuRoC loader on a synthesized fixture tree."""

import os

import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.atlas import atlas as atlas_mod
from orb_slam3_ros2_tpu.atlas import map_state as ms
from orb_slam3_ros2_tpu.io import euroc
from orb_slam3_ros2_tpu.loop import vocab


def test_atlas_save_load_roundtrip(tmp_path):
    cfg = ms.MapConfig(max_kf=8, max_lm=64, n_feat=32)
    at = atlas_mod.Atlas(cfg)
    m = at.current_map
    m = ms.insert_keyframe(
        m, jnp.eye(3), jnp.asarray([1.0, 2.0, 3.0]), jnp.asarray(0.5),
        jnp.zeros((32, 2)), jnp.zeros((32,), jnp.int32),
        jnp.zeros((32, 8), jnp.uint32), jnp.ones((32,), bool),
        jnp.full((32,), -1, jnp.int32),
    )
    at.current_map = m
    rng = np.random.default_rng(0)
    signs = jnp.where(jnp.asarray(rng.random((32, 256)) < 0.5), 1.0, -1.0)
    at.current_bow = vocab.add_keyframe(
        at.current_bow, signs, jnp.ones((32,), bool)
    )
    at.create_new_map()
    assert at.n_maps() == 2 and at.active == 1

    p = str(tmp_path / "atlas.npz")
    at.save(p)
    back = atlas_mod.Atlas.load(p)
    assert back.n_maps() == 2
    assert back.active == 1
    np.testing.assert_allclose(
        np.asarray(back.maps[0].kf_t[0]), [1.0, 2.0, 3.0]
    )
    assert int(back.maps[0].n_kf) == 1
    assert int(back.bow_dbs[0].n) == 1
    np.testing.assert_allclose(
        np.asarray(back.bow_dbs[0].vecs), np.asarray(at.bow_dbs[0].vecs)
    )


def _write_euroc_fixture(root):
    import cv2

    mav = os.path.join(root, "mav0")
    os.makedirs(os.path.join(mav, "cam0", "data"))
    os.makedirs(os.path.join(mav, "imu0"))
    os.makedirs(os.path.join(mav, "state_groundtruth_estimate0"))
    rng = np.random.default_rng(0)
    with open(os.path.join(mav, "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for k in range(3):
            ns = int(1e9 * (100.0 + 0.05 * k))
            name = f"{ns}.png"
            img = (rng.random((48, 64)) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(mav, "cam0", "data", name), img)
            f.write(f"{ns},{name}\n")
    with open(os.path.join(mav, "imu0", "data.csv"), "w") as f:
        f.write("#t,wx,wy,wz,ax,ay,az\n")
        for k in range(40):
            ns = int(1e9 * (99.99 + 0.005 * k))
            f.write(f"{ns},0.1,0.2,0.3,0.0,0.0,9.81\n")
    with open(os.path.join(
            mav, "state_groundtruth_estimate0", "data.csv"), "w") as f:
        f.write("#t,px,py,pz,qw,qx,qy,qz\n")
        for k in range(5):
            ns = int(1e9 * (100.0 + 0.025 * k))
            f.write(f"{ns},{0.1*k},{0.2*k},0.0,1,0,0,0\n")


def test_euroc_loader(tmp_path):
    _write_euroc_fixture(str(tmp_path))
    seq = euroc.load_sequence(str(tmp_path))
    assert len(seq.frames) == 3
    assert abs(seq.frames[0].t - 100.0) < 1e-9
    img = seq.frames[0].load()
    assert img.shape == (48, 64)
    # imu_between follows (t0, t1] — strictly after t0, inclusive of t1
    ts, gs, accs = seq.imu_between(seq.frames[0].t, seq.frames[1].t)
    assert (ts > seq.frames[0].t).all() and (ts <= seq.frames[1].t).all()
    assert len(ts) == 10
    np.testing.assert_allclose(gs[0], [0.1, 0.2, 0.3])
    g = seq.gt_at(seq.frames[1].t)
    assert g is not None and abs(g[0] - 0.2) < 1e-6
