#!/usr/bin/env python
"""Materialize the built-in dataset settings tree (config/<Mode>/<Name>.yaml)
from the calibration tables in orb_slam3_ros2_tpu/io/known_configs.py —
the generated equivalent of the reference's hand-written config/ directory."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam3_ros2_tpu.io import known_configs


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "config"
    for path in known_configs.write_all(root):
        print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
