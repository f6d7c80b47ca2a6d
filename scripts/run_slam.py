#!/usr/bin/env python
"""Dataset-replay / live SLAM runner — the `ros2 launch … mapping.launch.py`
equivalent (`/root/reference/launch/mapping.launch.py` without the DDS
plumbing): replays a EuRoC/TUM-VI sequence (or a synthetic render) through
the engine and writes the wrapper's artifact set (trajectory, PCD cloud,
PGM occupancy grid, optional annotated video) plus an ATE report when
groundtruth is available.

Usage:
  python scripts/run_slam.py --settings config/EuRoC.yaml \
      --dataset /data/MH_01_easy --mode imu_monocular --output-name mh01
  python scripts/run_slam.py --settings tests/data/synth_cam.yaml --synthetic
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings", required=True)
    ap.add_argument("--dataset", help="EuRoC-layout sequence root")
    ap.add_argument("--synthetic", action="store_true",
                    help="run on a rendered synthetic sequence")
    ap.add_argument("--mode", default="monocular",
                    choices=["monocular", "imu_monocular", "stereo",
                             "imu_stereo"])
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--output-name", default=None)
    ap.add_argument("--video", action="store_true")
    args = ap.parse_args()

    from orb_slam3_ros2_tpu.io import synthetic
    from orb_slam3_ros2_tpu.runtime.session import SlamSession
    from orb_slam3_ros2_tpu.runtime.system import ImuPoint, Sensor

    sensor = {
        "monocular": Sensor.MONOCULAR,
        "imu_monocular": Sensor.IMU_MONOCULAR,
        "stereo": Sensor.STEREO,
        "imu_stereo": Sensor.IMU_STEREO,
    }[args.mode]
    session = SlamSession(args.settings, sensor,
                          output_name=args.output_name,
                          record_video=args.video)

    est, gt = [], []
    t_start = time.perf_counter()
    n = 0
    if args.synthetic:
        images, R_gt, t_gt, ts = synthetic.render_sequence(
            n_frames=args.max_frames or 60,
            width=session.system.cam.width,
            height=session.system.cam.height,
            fx=session.system.cam.fx, fy=session.system.cam.fy,
            fps=session.system.cam.fps, seed=1, traj_scale=1.6,
        )
        for k in range(images.shape[0]):
            T = session.feed(images[k], float(ts[k]))
            n += 1
            if session.system.get_tracking_state().value == 1:
                est.append(-T[:3, :3].T @ T[:3, 3])
                gt.append(-R_gt[k].T @ t_gt[k])
    else:
        if not args.dataset:
            ap.error("--dataset or --synthetic required")
        from orb_slam3_ros2_tpu.io import euroc

        seq = euroc.load_sequence(args.dataset,
                                  stereo="stereo" in args.mode)
        t_prev = None
        frames = seq.frames[: args.max_frames or len(seq.frames)]
        for fr in frames:
            imu = []
            if "imu" in args.mode and t_prev is not None:
                tt, gg, aa = seq.imu_between(t_prev, fr.t)
                imu = [ImuPoint(a, g, t) for t, g, a in zip(tt, gg, aa)]
            T = session.system.track_monocular(fr.load(), fr.t, imu)
            t_prev = fr.t
            n += 1
            g = seq.gt_at(fr.t)
            if g is not None and session.system.get_tracking_state().value == 1:
                est.append(-T[:3, :3].T @ T[:3, 3])
                gt.append(g)

    wall = time.perf_counter() - t_start
    artifacts = session.shutdown()
    report = {
        "frames": n,
        "fps": round(n / wall, 2),
        "tracked_frames": len(est),
        "keyframes": int(session.system.map.n_kf),
        "landmarks": int(np.asarray(session.system.map.lm_valid).sum()),
        "artifacts": artifacts,
    }
    if len(est) > 10:
        report["ate_rmse_m"] = round(
            synthetic.ate_rmse(np.asarray(est), np.asarray(gt)), 4
        )
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
