"""Map-block-parallel distributed BA over a 2-D ("kf", "lm") device mesh.

SURVEY.md §7 prescribes mesh axes ("kf", "lm"): `parallel/sharded_ba.py`
delivers the "lm" half (landmark-sharded Schur reduction inside ONE bundle
window); this module delivers the "kf" half — *independent map blocks*
(Atlas maps, covisibility-disjoint local windows, per-session submaps)
distributed over the "kf" mesh axis, each block running the landmark-
sharded solver over its "lm" slice concurrently. That is the "map-block
sharding for multi-session Atlas" scale-out of SURVEY §2.4: B blocks on an
(nk, nl) mesh run nk blocks at a time, each nl-way landmark-sharded, with
zero communication between blocks and the usual O(K²·36)-byte psum within
a block's lm slice.

The reference has no counterpart (single-process g2o, one map at a time)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from orb_slam3_ros2_tpu.backend import ba as ba_mod
from orb_slam3_ros2_tpu.parallel import mesh as mesh_mod
from orb_slam3_ros2_tpu.parallel.sharded_ba import _shard_step


def make_block_sharded_ba(mesh, fx, fy, cx, cy, n_iters: int = 10):
    """Build the jitted block×landmark sharded BA.

    Expects a batched BAProblem whose leaves carry a leading block axis B:
    R (B,K,3,3), t (B,K,3), X (B,L,3), uv (B,K,L,2), w (B,K,L), fixed (B,K),
    point_valid (B,L). B must divide by mesh axis "kf", L by axis "lm".
    """
    kf, lm = mesh_mod.KF_AXIS, mesh_mod.LM_AXIS

    def one_block(R, t, X, uv, w, fixed, point_valid):
        def body(carry, _):
            R, t, X, lam = carry
            R, t, X, lam, cost = _shard_step(
                R, t, X, uv, w, fixed, point_valid, lam, fx, fy, cx, cy
            )
            return (R, t, X, lam), cost

        (R, t, X, _), costs = jax.lax.scan(
            body, (R, t, X, jnp.asarray(1e-4, jnp.float32)), None,
            length=n_iters,
        )
        return R, t, X, costs[-1]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(kf), P(kf),  # R, t: blocks sharded, poses replicated in-block
            P(kf, lm),  # X (B, L, 3)
            P(kf, None, lm),  # uv (B, K, L, 2)
            P(kf, None, lm),  # w
            P(kf),  # fixed (B, K)
            P(kf, lm),  # point_valid (B, L)
        ),
        out_specs=(P(kf), P(kf), P(kf, lm), P(kf)),
        check_vma=False,
    )
    def run(R, t, X, uv, w, fixed, point_valid):
        # vmap over the local block batch; psum inside _shard_step reduces
        # over "lm" only, so blocks never communicate
        return jax.vmap(one_block)(R, t, X, uv, w, fixed, point_valid)

    run_jit = jax.jit(run)

    def ba(problem: ba_mod.BAProblem) -> ba_mod.BAResult:
        B, L = problem.X.shape[0], problem.X.shape[1]
        nk, nl = mesh.shape[kf], mesh.shape[lm]
        assert B % nk == 0, f"block count {B} not divisible by kf axis {nk}"
        assert L % nl == 0, f"landmarks {L} not divisible by lm axis {nl}"
        R, t, X, cost = run_jit(
            problem.R, problem.t, problem.X, problem.uv, problem.w,
            problem.fixed, problem.point_valid,
        )
        return ba_mod.BAResult(R=R, t=t, X=X, cost=cost,
                               inlier_w=problem.w)

    return ba


def shard_block_problem(problem: ba_mod.BAProblem, mesh) -> ba_mod.BAProblem:
    """device_put a batched problem with the (kf, lm) layout."""
    kf, lm = mesh_mod.KF_AXIS, mesh_mod.LM_AXIS
    s = lambda *spec: NamedSharding(mesh, P(*spec))
    return ba_mod.BAProblem(
        R=jax.device_put(problem.R, s(kf)),
        t=jax.device_put(problem.t, s(kf)),
        X=jax.device_put(problem.X, s(kf, lm)),
        uv=jax.device_put(problem.uv, s(kf, None, lm)),
        w=jax.device_put(problem.w, s(kf, None, lm)),
        fixed=jax.device_put(problem.fixed, s(kf)),
        point_valid=jax.device_put(problem.point_valid, s(kf, lm)),
    )
