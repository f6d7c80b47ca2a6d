#!/usr/bin/env python
"""Calibrate camera intrinsics from aprilgrid captures and print the
Camera1.* settings keys (the solve the reference delegates to Kalibr).

  python scripts/calibrate_camera.py --images 'captures/*.png' \
      --target calib_target/aprilgrid.yaml [--model KannalaBrandt8]

Accepts a glob of images or a recording directory (uses its cam0 frames).
"""

import argparse
import glob as globmod
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="glob of capture images or a recording dir")
    ap.add_argument("--target", required=True, help="aprilgrid.yaml spec")
    ap.add_argument("--model", default="PinHole",
                    choices=["PinHole", "KannalaBrandt8"])
    args = ap.parse_args()

    import cv2

    from orb_slam3_ros2_tpu.io.calibrate import AprilGridSpec, calibrate

    paths = sorted(globmod.glob(args.images))
    if len(paths) == 1 and os.path.isdir(paths[0]):
        paths = sorted(
            globmod.glob(os.path.join(paths[0], "mav0", "cam0", "data", "*"))
            or globmod.glob(os.path.join(paths[0], "cam0", "data", "*"))
        )
    images = [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in paths]
    images = [i for i in images if i is not None]
    if not images:
        print("no readable images", file=sys.stderr)
        return 1

    spec = AprilGridSpec.load(args.target)
    res = calibrate(images, spec, model=args.model)
    if res is None:
        print("not enough grid views (need >= 3 with detections)",
              file=sys.stderr)
        return 1
    print(f"# {res.n_views} views, reprojection RMS {res.rms_px:.3f} px")
    print(res.settings_keys())
    return 0


if __name__ == "__main__":
    sys.exit(main())
