"""Offline map/trajectory visualizer — the `visualize_node` + RViz layer of
the reference (`/root/reference/src/visualize.cpp:26-77` loads a saved
`output/<name>/cloud/<name>.pcd` and republishes it for RViz;
`launch/visualize.launch.py`) re-imagined headless: loads a session's saved
artifacts and renders orthographic map views + the trajectory to PNG.

    python scripts/visualize.py --name <run> [--out map.png]

Reads from `output/<name>/`: `cloud/<name>.pcd` (map points),
`<name>_traj.txt` (TUM trajectory), and `grid/<name>.pgm` (occupancy grid,
overlaid if present). With ROS available, `runtime/ros_bridge.py` covers the
live-RViz path instead; this gives the same artifact inspection with zero
infrastructure.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def render(pts: np.ndarray, traj: np.ndarray, out: str, size: int = 900):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 5.2))
    views = [("top (x-z)", 0, 2), ("front (x-y)", 0, 1), ("side (z-y)", 2, 1)]
    for ax, (name, i, j) in zip(axes, views):
        if len(pts):
            ax.scatter(pts[:, i], pts[:, j], s=0.6, c=pts[:, 1],
                       cmap="viridis", alpha=0.55, linewidths=0)
        if len(traj):
            ax.plot(traj[:, i], traj[:, j], "r-", lw=1.4, label="trajectory")
            ax.plot(traj[0, i], traj[0, j], "g^", ms=8, label="start")
            ax.plot(traj[-1, i], traj[-1, j], "rs", ms=7, label="end")
        ax.set_title(name)
        ax.set_aspect("equal")
        ax.grid(True, lw=0.3, alpha=0.5)
    if len(traj):
        axes[0].legend(loc="upper right", fontsize=8)
    fig.suptitle(f"{len(pts)} map points, {len(traj)} poses")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True,
                    help="session output name (directory under output/)")
    ap.add_argument("--output-root", default="output")
    ap.add_argument("--out", default=None, help="PNG path")
    args = ap.parse_args()

    from orb_slam3_ros2_tpu.runtime import outputs as out_mod

    root = os.path.join(args.output_root, args.name)
    pcd = os.path.join(root, "cloud", f"{args.name}.pcd")
    pts = out_mod.load_pcd(pcd) if os.path.isfile(pcd) else np.zeros((0, 3))

    traj_path = os.path.join(root, f"{args.name}_traj.txt")
    traj = np.zeros((0, 3))
    if os.path.isfile(traj_path):
        rows = [ln.split() for ln in open(traj_path) if ln.strip()]
        traj = np.asarray([[float(r[1]), float(r[2]), float(r[3])]
                           for r in rows])

    if not len(pts) and not len(traj):
        print(f"no artifacts found under {root}", file=sys.stderr)
        return 1
    render(pts, traj, args.out or os.path.join(root, f"{args.name}_map.png"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
