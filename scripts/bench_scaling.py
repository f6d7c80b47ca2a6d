"""Distributed-BA scaling benchmark: BA iterations/s vs mesh size.

North-star metric (BASELINE.md): "BA iterations/s at N hosts ... distributed
VIBA >= 70% scaling efficiency at 2+ hosts". This script measures the
landmark-sharded Schur-complement BA (`parallel/sharded_ba.py`) at mesh
sizes 1, 2, 4, ... over whatever devices exist and reports iterations/s and
strong-scaling efficiency  eff(n) = T(1) / (n * T(n)).

On a real TPU slice this is the headline number. On this container (one
tunneled chip), run with a virtual CPU mesh to exercise the identical
shard_map/collective program:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --landmarks 32768 --poses 64

Virtual CPU devices share host cores, so the efficiency figure there is a
lower bound on real-hardware efficiency: speedup is physically capped at
min(n_devices, host_cores) (this container has 2 cores, so the 8-device
figure mostly measures that the collective program runs, not how it
scales). The communication DESIGN claim — per-iteration traffic is
O(K^2 * 36) bytes from one psum of the reduced camera system, independent
of landmark count — is what makes >= 70% efficiency reachable on a real
slice where each shard owns a chip; see parallel/sharded_ba.py.

Prints one JSON line per mesh size plus a summary line.
"""

import argparse
import json
import os
import sys
import time

# run from anywhere without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=64)
    ap.add_argument("--landmarks", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if "JAX_PLATFORMS" in os.environ:
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orb_slam3_ros2_tpu.backend import ba as ba_mod
    from orb_slam3_ros2_tpu.io import synthetic
    from orb_slam3_ros2_tpu.parallel import mesh as mesh_mod
    from orb_slam3_ros2_tpu.parallel import sharded_ba

    K, L = args.poses, args.landmarks
    fx = fy = 350.0
    cx, cy = 320.0, 240.0
    rng = np.random.default_rng(0)

    # synthetic BA problem: K cameras on an arc observing L points
    sc = synthetic.make_scene(n_frames=K, n_points=min(L, 512),
                              noise_px=0.5, seed=1)
    reps = L // sc.X.shape[0] + 1
    X = np.tile(sc.X, (reps, 1))[:L] + rng.normal(0, 0.05, (L, 3))
    R = sc.R_cw.copy()
    t = sc.t_cw + rng.normal(0, 0.02, sc.t_cw.shape)
    uv = np.tile(sc.uv, (1, reps, 1))[:, :L]
    w = np.tile(sc.vis, (1, reps))[:, :L].astype(np.float32)
    fixed = np.zeros(K, bool)
    fixed[0] = True

    problem = ba_mod.BAProblem(
        R=jnp.asarray(R, jnp.float32), t=jnp.asarray(t, jnp.float32),
        X=jnp.asarray(X, jnp.float32), uv=jnp.asarray(uv, jnp.float32),
        w=jnp.asarray(w), fixed=jnp.asarray(fixed),
        point_valid=jnp.ones(L, bool),
    )

    n_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    results = []
    t1 = None
    for n in sizes:
        mesh = mesh_mod.make_mesh(n)
        ba = sharded_ba.make_sharded_ba(mesh, fx, fy, cx, cy,
                                        n_iters=args.iters)
        p = sharded_ba.shard_problem(problem, mesh)
        out = ba(p)  # compile + warmup
        jax.block_until_ready(out.R)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = ba(p)
            jax.block_until_ready(out.R)
            best = min(best, time.perf_counter() - t0)
        iters_s = args.iters / best
        if t1 is None:
            t1 = best
        eff = t1 / (n * best)
        results.append({"devices": n, "ba_iters_per_s": round(iters_s, 2),
                        "efficiency": round(eff, 3),
                        "final_cost": round(float(out.cost), 2)})
        print(json.dumps(results[-1]))

    summary = {
        "metric": "ba_scaling",
        "poses": K, "landmarks": L,
        "platform": jax.devices()[0].platform,
        "host_cores": os.cpu_count(),
        "max_devices": sizes[-1] if sizes else 0,
        "iters_per_s_at_max": results[-1]["ba_iters_per_s"] if results else 0,
        "efficiency_at_max": results[-1]["efficiency"] if results else 0,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
