"""Place-recognition recall benchmark: random vs trained codebooks.

VERDICT r1 weak-item 7: loop closing rode on synthetic scenes where recall
is trivially high and the default random-projection codebook was never
benchmarked. This script renders a sequence with TRUE revisits (the camera
trajectory is periodic, so frame k and frame k+T see the same place from a
near-identical pose) plus realistic photometric nuisance (room renderer),
builds the BoW database per codebook, queries every late frame against the
early map with temporal neighbors excluded, and reports recall@1/@5 plus
the median true-match rank.

Ground truth "same place": camera centers within `pos_tol` metres AND
optical axes within `ang_tol` degrees.

Usage:
    python scripts/bench_place_recognition.py [--frames 80] [--out JSON]

Runs on CPU by default (feature extraction at 320x240 is cheap; we want
this runnable in CI).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--period", type=float, default=4.0,
                    help="trajectory period in seconds (revisit spacing)")
    ap.add_argument("--fps", type=float, default=10.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from orb_slam3_ros2_tpu.frontend import extractor as ex
    from orb_slam3_ros2_tpu.io import synthetic
    from orb_slam3_ros2_tpu.loop import vocab as vocab_mod

    # a strictly periodic trajectory: frame k and k + period*fps revisit
    period = args.period
    traj = synthetic.Trajectory(
        amp_t=np.array([1.2, 0.7, 0.9]),
        freq_t=np.array([1, 2, 1]) / period,
        amp_r=np.array([0.12, 0.18, 0.08]),
        freq_r=np.array([2, 1, 1]) / period,
    )
    images, R_cw, t_cw, ts = synthetic.render_room_sequence(
        n_frames=args.frames, width=320, height=240, fx=260.0, fy=260.0,
        fps=args.fps, seed=3, traj=traj)

    cfg = ex.ExtractorConfig(n_features=600, n_levels=4, height=240,
                             width=320)
    extract = ex.make_extractor(cfg)
    feats = [extract(jnp.asarray(img)) for img in images]
    signs = np.stack([np.asarray(f.signs) for f in feats])
    masks = np.stack([np.asarray(f.mask) for f in feats])

    # ground-truth same-place relation
    centers = -np.einsum("kji,kj->ki", R_cw, t_cw)
    axes = R_cw[:, 2, :]  # camera +z in world
    pos_tol, ang_tol = 0.35, 15.0
    K = args.frames
    d_pos = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
    d_ang = np.degrees(np.arccos(
        np.clip(np.einsum("ki,ji->kj", axes, axes), -1, 1)))
    same_place = (d_pos < pos_tol) & (d_ang < ang_tol)

    gap = int(round(period * args.fps)) // 2  # exclude temporal neighbors

    def evaluate(anchors_pm, label):
        vocab_mod.set_vocabulary(anchors_pm)
        db = vocab_mod.empty_database(max_kf=K)
        for k in range(K):
            db = vocab_mod.add_keyframe(
                db, jnp.asarray(signs[k]), jnp.asarray(masks[k]))
        hits1 = hits5 = n_q = 0
        ranks = []
        for q in range(gap, K):
            cand = np.arange(K)
            allowed = (cand <= q - gap)
            gt = same_place[q] & allowed
            if not gt.any():
                continue
            exclude = jnp.asarray(~allowed)
            scores, idx = vocab_mod.query(
                db, jnp.asarray(signs[q]), jnp.asarray(masks[q]),
                exclude, top_k=5)
            idx = np.asarray(idx)
            scores = np.asarray(scores)
            top = idx[scores > -0.5]  # query() marks excluded slots -1.0
            n_q += 1
            if len(top) and gt[top[0]]:
                hits1 += 1
            if gt[top[:5]].any():
                hits5 += 1
            # rank of the best true match under the full score ordering
            full_scores, full_idx = vocab_mod.query(
                db, jnp.asarray(signs[q]), jnp.asarray(masks[q]),
                exclude, top_k=K)
            order = np.asarray(full_idx)
            rank = next((r for r, i in enumerate(order) if gt[i]), K)
            ranks.append(rank + 1)
        row = {"codebook": label, "queries": n_q,
               "recall@1": round(hits1 / max(n_q, 1), 3),
               "recall@5": round(hits5 / max(n_q, 1), 3),
               "median_true_rank": float(np.median(ranks)) if ranks else None}
        print(json.dumps(row))
        return row

    rows = []
    # 1. default random-projection codebook
    rows.append(evaluate(np.asarray(vocab_mod._anchors_np()), "random"))
    # 2. codebook trained on descriptors from a DIFFERENT rendered scene
    train_imgs, *_ = synthetic.render_room_sequence(
        n_frames=24, width=320, height=240, fx=260.0, fy=260.0,
        fps=args.fps, seed=11)
    tr = [extract(jnp.asarray(img)) for img in train_imgs]
    tr_signs = np.concatenate([np.asarray(f.signs)[np.asarray(f.mask)]
                               for f in tr])
    trained = vocab_mod.train_vocabulary(tr_signs, seed=0)
    rows.append(evaluate(np.asarray(trained), "trained(held-out scene)"))
    # restore the default so later users of the process see the stock vocab
    vocab_mod.set_vocabulary(np.asarray(vocab_mod._anchors_np()))

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"frames": K, "pos_tol_m": pos_tol,
                       "ang_tol_deg": ang_tol, "results": rows}, f, indent=1)


if __name__ == "__main__":
    main()
