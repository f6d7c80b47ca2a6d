"""Stage tracer (SURVEY §5 tracing subsystem — absent in the reference)."""

import time

from orb_slam3_ros2_tpu.utils.tracing import StageTracer


def test_tracer_aggregates():
    tr = StageTracer()
    for _ in range(20):
        with tr.stage("a"):
            time.sleep(0.001)
    with tr.stage("b"):
        pass
    rep = tr.report()
    assert rep["a"]["n"] == 20
    assert rep["a"]["mean_ms"] >= 0.9
    assert rep["a"]["p95_ms"] >= rep["a"]["p50_ms"]
    assert rep["b"]["n"] == 1
    tr.reset()
    assert tr.report() == {}


def test_tracer_disabled_is_free():
    tr = StageTracer(enabled=False)
    with tr.stage("x"):
        pass
    assert tr.report() == {}


def test_system_records_stages():
    import numpy as np

    from orb_slam3_ros2_tpu.io import synthetic
    from orb_slam3_ros2_tpu.runtime.system import Sensor, System

    images, R_gt, t_gt, ts = synthetic.render_sequence(
        n_frames=8, width=320, height=240, fx=260.0, fy=260.0,
        fps=10.0, seed=1, traj_scale=1.6,
    )
    sys_ = System(None, "tests/data/synth_cam.yaml", Sensor.MONOCULAR)
    for k in range(images.shape[0]):
        sys_.track_monocular(images[k], float(ts[k]))
    rep = sys_.tracer.report()
    assert "extract" in rep and rep["extract"]["n"] == 8
    # tracking ran at least once after initialization (the fused per-frame
    # pipeline records as one "track_frame" stage)
    assert "track_frame" in rep and rep["track_frame"]["n"] >= 1
