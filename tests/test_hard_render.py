"""CI coverage for the realistic renderer path (r2 verdict item 3: no test
exercised `render_room_sequence` at all — the e2e suite used only the easy
renderer). Small sizes so the compile cost stays CI-friendly."""

import os

import numpy as np
import pytest

from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.runtime.bench_eval import run_synthetic_case


def test_render_room_sequence_shapes_and_content():
    images, R_gt, t_gt, ts = synthetic.render_room_sequence(
        n_frames=4, width=160, height=120, fx=130.0, fy=130.0,
        fps=10.0, seed=0)
    assert images.shape == (4, 120, 160)
    # photometric model produces real 8-bit-ish content, not constants
    assert images.std() > 5.0
    assert np.all(np.isfinite(images))
    assert R_gt.shape == (4, 3, 3) and t_gt.shape == (4, 3)
    # consecutive frames differ (camera moves)
    assert np.abs(images[0] - images[-1]).mean() > 1.0


def test_render_room_sequence_stereo_pair():
    left, right, R_gt, t_gt, ts = synthetic.render_room_sequence(
        n_frames=2, width=160, height=120, fx=130.0, fy=130.0,
        fps=10.0, seed=1, stereo_baseline=0.1)
    assert left.shape == right.shape == (2, 120, 160)
    # stereo pair shows disparity: frames differ but are correlated
    d = np.abs(left[0] - right[0]).mean()
    assert 0.5 < d < 60.0, d


@pytest.mark.slow
def test_hard_rendered_mono_tracks():
    """The full engine tracks a short hard-rendered sequence (CI-size
    version of the EVAL.md suite's synth_hard case)."""
    row = run_synthetic_case(dict(
        name="ci_hard", mode="mono", n_frames=18, hard=True, seed=0,
        width=320, height=240, fx=260.0, n_features=600, n_levels=4,
        traj_scale=0.8,
    ))
    assert row["status"] == "ok", row
    assert row["tracked_frames"] >= 12, row
    assert row["ate_rmse_m"] < 0.12, row
