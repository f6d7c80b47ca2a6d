"""ATE evaluation harness: real EuRoC/TUM-VI sequences when present,
hard synthetic rendered sequences otherwise.

The accuracy bar (BASELINE.md): EuRoC MH01-MH05 mono-inertial ATE RMSE
0.03-0.06 m — the ORB-SLAM3 paper's table, matching the configs the
reference ships (`/root/reference/config/Monocular-Inertial/EuRoC.yaml`).

Usage:
    # real data (after scripts/fetch_euroc.py on a networked machine):
    python scripts/eval_ate.py --data datasets --modes mono vi

    # no data: evaluates on the rendered synthetic benchmark suite and
    # records that the container has no egress:
    python scripts/eval_ate.py

Writes one markdown table + one JSON blob to --out (default EVAL.md /
eval_results.json at the repo root) and prints the table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _config_for(seq_name: str, mode: str) -> str:
    fam = {
        "mono": "Monocular", "vi": "Monocular-Inertial",
        "stereo": "Stereo", "stereo_vi": "Stereo-Inertial",
    }[mode]
    rig = "TUM-VI" if seq_name.startswith("tumvi") else "EuRoC"
    return os.path.join(REPO, "config", fam, f"{rig}.yaml")


def eval_real_sequence(root: str, name: str, mode: str, max_frames=None):
    from orb_slam3_ros2_tpu.io import euroc, synthetic
    from orb_slam3_ros2_tpu.runtime.system import Sensor, System

    sensor = {
        "mono": Sensor.MONOCULAR, "vi": Sensor.IMU_MONOCULAR,
        "stereo": Sensor.STEREO, "stereo_vi": Sensor.IMU_STEREO,
    }[mode]
    seq = euroc.load_sequence(root, stereo="stereo" in mode)
    sys_ = System(None, _config_for(name, mode), sensor=sensor)
    t0 = time.perf_counter()
    est, gt = euroc.run_slam_on_sequence(
        sys_, seq, max_frames=max_frames, use_imu="vi" in mode)
    wall = time.perf_counter() - t0
    n = max_frames or len(seq.frames)
    if len(est) < 10:
        return {"sequence": name, "mode": mode, "ate_rmse_m": None,
                "tracked_frames": int(len(est)), "frames": int(n),
                "status": "tracking failed"}
    ate = synthetic.ate_rmse(est, gt)
    return {"sequence": name, "mode": mode, "ate_rmse_m": round(ate, 4),
            "tracked_frames": int(len(est)), "frames": int(n),
            "wall_s": round(wall, 1), "fps": round(len(est) / wall, 1),
            "status": "ok"}


def discover_real(data_dir: str):
    if not os.path.isdir(data_dir):
        return []
    out = []
    for name in sorted(os.listdir(data_dir)):
        root = os.path.join(data_dir, name)
        if os.path.isdir(os.path.join(root, "mav0")):
            out.append((name, root))
    return out


# --------------------------------------------------------------------------
# synthetic fallback suite (always runnable; exact groundtruth)
# --------------------------------------------------------------------------

def synthetic_suite(quick: bool = False):
    """Rendered-image benchmark cases. `hard=True` uses the realistic image
    formation (perspective texture warp + photometric noise + exposure
    drift) and realistic EuRoC-grade IMU noise (see io/synthetic.py)."""
    n = 40 if quick else 120
    return [
        dict(name="synth_easy", mode="mono", n_frames=n, hard=False),
        dict(name="synth_hard", mode="mono", n_frames=n, hard=True),
        dict(name="synth_hard_vi", mode="vi", n_frames=n, hard=True),
        dict(name="synth_hard_stereo", mode="stereo", n_frames=n, hard=True),
    ]


def eval_synthetic(case):
    from orb_slam3_ros2_tpu.io import synthetic
    from orb_slam3_ros2_tpu.runtime.bench_eval import run_synthetic_case

    return run_synthetic_case(case)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=os.path.join(REPO, "datasets"))
    ap.add_argument("--modes", nargs="+", default=["mono", "vi"],
                    choices=["mono", "vi", "stereo", "stereo_vi"])
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "eval_results.json"))
    args = ap.parse_args()

    results = []
    real = discover_real(args.data)
    if real:
        for name, root in real:
            for mode in args.modes:
                print(f"== {name} [{mode}]", file=sys.stderr)
                results.append(eval_real_sequence(
                    root, name, mode, args.max_frames))
                print(json.dumps(results[-1]), file=sys.stderr)
        source = "real"
    else:
        print("no real sequences under --data; running the synthetic "
              "rendered suite (container has zero egress — see EVAL.md)",
              file=sys.stderr)
        for case in synthetic_suite(args.quick):
            print(f"== {case['name']} [{case['mode']}]", file=sys.stderr)
            results.append(eval_synthetic(case))
            print(json.dumps(results[-1]), file=sys.stderr)
        source = "synthetic"

    blob = {"source": source, "results": results}
    with open(args.out, "w") as f:
        json.dump(blob, f, indent=1)

    hdr = "| sequence | mode | ATE RMSE (m) | tracked/total | fps |"
    sep = "|---|---|---|---|---|"
    lines = [hdr, sep]
    for r in results:
        ate = "—" if r["ate_rmse_m"] is None else f"{r['ate_rmse_m']:.4f}"
        lines.append(
            f"| {r['sequence']} | {r['mode']} | {ate} "
            f"| {r['tracked_frames']}/{r['frames']} "
            f"| {r.get('fps', '—')} |")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
