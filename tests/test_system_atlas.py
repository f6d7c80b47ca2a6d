"""System-level Atlas behavior: save/load resume + new-map spawn on loss.

Reference semantics: `System.SaveAtlasToFile` / `LoadAtlasFromFile`
(`/root/reference/config/Monocular/MilkV.yaml:74-75`, "if LoadFile doesn't
exist ... create new Atlas from scratch" `config/Stereo/EuRoC.yaml:7-13`);
tracking-loss -> Atlas new-map spawn [upstream], surfaced in the README's
"map keeps getting lost" troubleshooting (`/root/reference/README.md:113-115`).
"""

import os

import numpy as np
import pytest

from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.runtime.system import Sensor, System, TrackingState

SETTINGS = os.path.join(os.path.dirname(__file__), "data", "synth_cam.yaml")


@pytest.fixture(scope="module")
def rendered():
    # 36 frames: the initializer's global parallax gate (upstream
    # TwoViewReconstruction minParallax) delays init by a few frames on
    # this slow-starting clip; the extra tail keeps the first map at the
    # same keyframe count as before the gate
    return synthetic.render_sequence(
        n_frames=36, width=320, height=240, fx=260.0, fy=260.0,
        fps=10.0, seed=1, plane_depths=(6.0, 9.0), traj_scale=1.6,
    )


def _run(sys_, images, ts, n=None):
    for k in range(n or images.shape[0]):
        sys_.track_monocular(images[k], float(ts[k]))


def test_atlas_save_load_resume_and_relocalize(rendered, tmp_path):
    images, R_gt, t_gt, ts = rendered
    sys_ = System(None, SETTINGS, Sensor.MONOCULAR)
    _run(sys_, images, ts)
    assert sys_.get_tracking_state() == TrackingState.OK
    n_kf = int(sys_.map.n_kf)
    assert n_kf >= 4

    path = str(tmp_path / "atlas.npz")
    saved = sys_.save_atlas(path)
    assert saved == path and os.path.isfile(path)

    # settings file with LoadAtlasFromFile pointing at the saved atlas
    text = open(SETTINGS).read()
    cfg2 = tmp_path / "resume.yaml"
    cfg2.write_text(text + f'\nSystem.LoadAtlasFromFile: "{path}"\n')

    sys2 = System(None, str(cfg2), Sensor.MONOCULAR,
                  map_cfg=sys_.map_cfg)
    assert sys2.get_tracking_state() == TrackingState.LOST  # resume → reloc
    assert int(sys2.map.n_kf) == n_kf
    assert sys2.atlas.n_maps() == sys_.atlas.n_maps()

    # feeding frames from the mapped area relocalizes into the loaded map
    for k in range(10):
        sys2.track_monocular(images[k], float(ts[k]) + 100.0)
        if sys2.get_tracking_state() == TrackingState.OK:
            break
    assert sys2.get_tracking_state() == TrackingState.OK
    # no re-initialization happened: the map is the loaded one, not a new one
    assert int(sys2.map.n_kf) >= n_kf


def test_missing_atlas_file_starts_fresh(tmp_path):
    text = open(SETTINGS).read()
    cfg = tmp_path / "fresh.yaml"
    cfg.write_text(text + '\nSystem.LoadAtlasFromFile: "/nonexistent/a.npz"\n')
    sys_ = System(None, str(cfg), Sensor.MONOCULAR)
    assert sys_.get_tracking_state() == TrackingState.NOT_INITIALIZED
    assert sys_.atlas.n_maps() == 1


def test_new_map_spawn_on_persistent_loss(rendered):
    images, _, _, ts = rendered
    sys_ = System(None, SETTINGS, Sensor.MONOCULAR)
    _run(sys_, images, ts)
    assert sys_.get_tracking_state() == TrackingState.OK
    assert int(sys_.map.n_kf) >= sys_.MIN_KFS_KEEP_MAP
    assert sys_.atlas.n_maps() == 1

    # blind the camera: uniform noise images that match nothing
    rng = np.random.default_rng(0)
    t = float(ts[-1])
    for k in range(sys_.LOST_FRAMES_NEW_MAP + 8):
        t += 0.1
        noise = rng.uniform(0, 255, images[0].shape).astype(np.float32)
        sys_.track_monocular(noise, t)
        if sys_.atlas.n_maps() > 1:
            break
    assert sys_.atlas.n_maps() == 2, "lost tracking must spawn a new map"
    assert sys_.get_tracking_state() == TrackingState.NOT_INITIALIZED
    assert int(sys_.map.n_kf) == 0  # fresh active map
    # the frozen map retains its keyframes
    assert int(sys_.atlas.maps[0].n_kf) >= sys_.MIN_KFS_KEEP_MAP


def test_loaded_map_never_discarded_on_loss(rendered, tmp_path):
    """A map restored via System.LoadAtlasFromFile must be frozen (new map
    spawned), never restarted in place, even below the tiny-map threshold —
    upstream Atlas keeps loaded maps as non-active maps."""
    images, R_gt, t_gt, ts = rendered
    sys_ = System(None, SETTINGS, Sensor.MONOCULAR)
    _run(sys_, images, ts, n=14)  # short clip: map stays below threshold
    n_kf = int(sys_.map.n_kf)
    assert 1 <= n_kf < sys_.MIN_KFS_KEEP_MAP  # small map, below threshold
    path = str(tmp_path / "small_atlas.npz")
    sys_.save_atlas(path)

    cfg = tmp_path / "resume_small.yaml"
    cfg.write_text(open(SETTINGS).read()
                   + f'\nSystem.LoadAtlasFromFile: "{path}"\n')
    sys2 = System(None, str(cfg), Sensor.MONOCULAR, map_cfg=sys_.map_cfg)
    assert int(sys2.map.n_kf) == n_kf

    # feed frames of a DIFFERENT scene: relocalization must fail and, after
    # LOST_FRAMES_NEW_MAP failures, spawn a NEW map; the loaded one survives
    other, _, _, ts2 = synthetic.render_sequence(
        n_frames=sys2.LOST_FRAMES_NEW_MAP + 5, width=320, height=240,
        fx=260.0, fy=260.0, fps=10.0, seed=9, traj_scale=1.6,
    )
    for k in range(other.shape[0]):
        sys2.track_monocular(other[k], 500.0 + float(ts2[k]))
    assert sys2.atlas.n_maps() == 2  # frozen loaded map + fresh active map


def test_session_periodic_checkpoint(rendered, tmp_path):
    """SlamSession(checkpoint_every=N) writes a resumable atlas mid-run
    (host-failure recovery, SURVEY §5)."""
    import os as _os

    from orb_slam3_ros2_tpu.runtime.session import SlamSession

    images, _, _, ts = rendered
    sess = SlamSession(SETTINGS, Sensor.MONOCULAR, output_name="ckpt_t",
                       output_root=str(tmp_path), checkpoint_every=8)
    for k in range(18):
        sess.feed(images[k], float(ts[k]))
    ckpt = _os.path.join(str(tmp_path), "ckpt_t", "checkpoint_atlas.npz")
    assert _os.path.isfile(ckpt)

    sys2 = System(None, SETTINGS, Sensor.MONOCULAR,
                  map_cfg=sess.system.map_cfg, load_atlas=ckpt)
    assert int(sys2.map.n_kf) >= 1
    assert sys2.get_tracking_state() == TrackingState.LOST  # awaiting reloc
