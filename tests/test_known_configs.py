"""Generated dataset-config tree (reference `config/` directory parity:
same parameter surface + OpenCV-FileStorage dialect, SURVEY.md §2.3)."""

import numpy as np

from orb_slam3_ros2_tpu.io import known_configs, settings


def test_all_configs_generate_and_load(tmp_path):
    paths = known_configs.write_all(str(tmp_path))
    # 24 configs — the same count the reference ships (SURVEY.md §2.1)
    assert len(paths) == 24
    for p in paths:
        s = settings.load_settings(p)
        assert s.camera.width > 0 and s.n_features >= 800
        if "Inertial" in p:
            assert s.sensor_type.startswith("IMU_")
            assert s.T_b_c1 is not None and s.T_b_c1.shape == (4, 4)
            assert s.noise_gyro > 0 and s.imu_frequency == 200.0
        if "/Stereo" in p:
            assert s.sensor_type.endswith("STEREO")
            assert (s.camera2 is not None) or s.stereo_b > 0


def test_euroc_stereo_extrinsics_consistent(tmp_path):
    """T_c1_c2 emitted for EuRoC equals inv(T_b_c0) @ T_b_c1 and has the
    known ~11 cm baseline."""
    known_configs.write_all(str(tmp_path))
    s = settings.load_settings(str(tmp_path / "Stereo" / "EuRoC.yaml"))
    T = s.T_c1_c2
    # proper rigid transform
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert abs(np.linalg.norm(T[:3, 3]) - 0.11) < 0.01


def test_kb8_config_selects_fisheye_model(tmp_path):
    from orb_slam3_ros2_tpu.models.cameras import CameraModel

    known_configs.write_all(str(tmp_path))
    s = settings.load_settings(str(tmp_path / "Monocular" / "TUM-VI.yaml"))
    assert s.camera.model == CameraModel.KANNALA_BRANDT8


def test_reference_rigs_present(tmp_path):
    """NTU-VIRAL / T265 / MilkV — the rigs the reference ships that round 1
    lacked (`/root/reference/config/Monocular/NTU_VIRAL.yaml`,
    `config/Monocular-Inertial/RealSense_T265.yaml`,
    `config/Monocular/MilkV.yaml`)."""
    from orb_slam3_ros2_tpu.models.cameras import CameraModel

    known_configs.write_all(str(tmp_path))
    ntu = settings.load_settings(str(tmp_path / "Stereo" / "NTU_VIRAL.yaml"))
    assert ntu.n_features == 2000 and ntu.n_levels == 7
    assert abs(np.linalg.norm(ntu.T_c1_c2[:3, 3]) - 0.259) < 0.01

    t265 = settings.load_settings(
        str(tmp_path / "Monocular-Inertial" / "RealSense_T265.yaml"))
    assert t265.camera.model == CameraModel.KANNALA_BRANDT8
    assert t265.n_features == 800
    assert t265.camera.width == 848 and t265.camera.height == 800
    assert t265.imu_frequency == 200.0

    milkv = settings.load_settings(str(tmp_path / "Monocular" / "MilkV.yaml"))
    assert milkv.camera.width == 640 and milkv.camera.height == 360
    assert milkv.save_atlas_to_file == "maps/prev_atlas"
