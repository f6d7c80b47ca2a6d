#!/usr/bin/env python
"""Generate a Kalibr-style aprilgrid calibration target: the YAML spec +
a printable grid image + the individual tag PNGs.

Calibration-tooling parity with the reference, which ships a 6x6 80x80 cm
aprilgrid spec (`/root/reference/config/Calibration/recorder_empty/
april_6x6_80x80cm_larues.yaml`: target_type aprilgrid, tagCols/tagRows 6,
tagSize, tagSpacing) plus 36 rendered apriltag PNGs
(`config/Calibration/tag41_12_*.png`). Tags are AprilTag 36h11 via OpenCV.

  python scripts/make_aprilgrid.py --out calib_target [--cols 6 --rows 6]
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--cols", type=int, default=6)
    ap.add_argument("--rows", type=int, default=6)
    ap.add_argument("--tag-size", type=float, default=0.088,
                    help="tag edge length in meters")
    ap.add_argument("--tag-spacing", type=float, default=0.3,
                    help="space between tags as a fraction of tag size")
    ap.add_argument("--px-per-tag", type=int, default=160)
    ap.add_argument("--start-id", type=int, default=0)
    args = ap.parse_args()

    import cv2
    import numpy as np

    os.makedirs(args.out, exist_ok=True)
    dic = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)

    # Kalibr aprilgrid spec (same keys as the reference's target YAML)
    spec = os.path.join(args.out, "aprilgrid.yaml")
    with open(spec, "w") as f:
        f.write(
            "target_type: 'aprilgrid'\n"
            f"tagCols: {args.cols}\n"
            f"tagRows: {args.rows}\n"
            f"tagSize: {args.tag_size}\n"
            f"tagSpacing: {args.tag_spacing}\n"
        )

    px = args.px_per_tag
    gap = int(round(px * args.tag_spacing))
    W = args.cols * px + (args.cols + 1) * gap
    H = args.rows * px + (args.rows + 1) * gap
    board = np.full((H, W), 255, np.uint8)
    for r in range(args.rows):
        for c in range(args.cols):
            tid = args.start_id + r * args.cols + c
            tag = cv2.aruco.generateImageMarker(dic, tid, px)
            cv2.imwrite(os.path.join(args.out, f"tag36h11_{tid:02d}.png"),
                        tag)
            y = gap + r * (px + gap)
            x = gap + c * (px + gap)
            board[y:y + px, x:x + px] = tag
    board_path = os.path.join(args.out, "aprilgrid.png")
    cv2.imwrite(board_path, board)
    print(spec)
    print(board_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
