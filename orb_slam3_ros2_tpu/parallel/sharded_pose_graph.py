"""Distributed essential-graph (pose-graph) optimization over a device mesh.

Companion to `parallel/sharded_ba.py` (SURVEY §2.4, BASELINE north star):
EDGES are sharded over the 1-D mesh axis — each device evaluates the Sim3
residuals/Jacobians of its edge shard and scatter-adds the weighted 7x7
blocks into a local dense (K,7,K,7) system; one `psum` over ICI reduces it;
the (7K,7K) solve and the pose update run replicated. Poses are replicated
throughout (K is hundreds — a few MB), so per-iteration communication is
the H/b reduction, independent of the edge count. Edge evaluation — the
O(E) jacfwd work that dominates large covisibility graphs — scales linearly
in devices.

The reference's counterpart is single-process g2o
`OptimizeEssentialGraph` [upstream]; it has no distributed analogue."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.loop import pose_graph as pg
from orb_slam3_ros2_tpu.parallel import mesh as mesh_mod


def make_sharded_pose_graph(mesh, K: int, n_iters: int = 12,
                            fix_scale: bool = False):
    """Build the jitted distributed pose-graph optimizer for a fixed K.

    Returned fn mirrors `loop.pose_graph.optimize_pose_graph` but requires
    the edge-array length E to be divisible by the mesh size (pad with
    edge_valid=False entries)."""
    axis = mesh_mod.LM_AXIS

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),            # R, t, s replicated
            P(axis), P(axis),         # edges_i, edges_j sharded
            P(axis), P(axis), P(axis),  # R_meas, t_meas, s_meas sharded
            P(axis),                  # w_e sharded
            P(),                      # fixed replicated
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def run(R, t, s, edges_i, edges_j, R_meas, t_meas, s_meas, w_e, fixed):
        def gn_step(carry, _):
            R, t, s, lam = carry
            r, Ji, Jj = pg.edge_terms(R, t, s, edges_i, edges_j,
                                      R_meas, t_meas, s_meas)
            cost0 = jax.lax.psum(
                jnp.sum(w_e * jnp.sum(r * r, axis=-1)), axis
            )
            H, b = pg.assemble_system(K, edges_i, edges_j, r, Ji, Jj, w_e)
            H = jax.lax.psum(H, axis)   # <- the only inter-device traffic
            b = jax.lax.psum(b, axis)

            Hf = H.reshape(K * 7, K * 7)
            diag_scale = lam * jnp.abs(jnp.diag(Hf))
            prior = jnp.repeat(jnp.where(fixed, 1e12, 1e-8), 7)
            if fix_scale:
                scale_idx = jnp.arange(K) * 7 + 6
                prior = prior.at[scale_idx].add(1e12)
            Hf = Hf + jnp.diag(diag_scale + prior)
            dx = -jnp.linalg.solve(Hf, b.reshape(-1)).reshape(K, 7)

            dR, dt, ds = lie.sim3_exp(dx)
            R_new, t_new, s_new = lie.sim3_compose(dR, dt, ds, R, t, s)
            r1, _, _ = pg.edge_terms(R_new, t_new, s_new, edges_i, edges_j,
                                     R_meas, t_meas, s_meas)
            cost1 = jax.lax.psum(
                jnp.sum(w_e * jnp.sum(r1 * r1, axis=-1)), axis
            )
            better = cost1 < cost0
            R = jnp.where(better, R_new, R)
            t = jnp.where(better, t_new, t)
            s = jnp.where(better, s_new, s)
            lam = jnp.where(better, lam * 0.5, lam * 4.0).clip(1e-9, 1e3)
            return (R, t, s, lam), cost1

        (R, t, s, _), costs = jax.lax.scan(
            gn_step, (R, t, s, jnp.asarray(1e-6, jnp.float32)), None,
            length=n_iters,
        )
        return R, t, s, costs[-1]

    def optimize(R, t, s, edges_i, edges_j, R_meas, t_meas, s_meas,
                 edge_valid, fixed, edge_weight=None):
        n_shards = mesh.shape[axis]
        E = edges_i.shape[0]
        assert E % n_shards == 0, (
            f"edge count {E} not divisible by mesh size {n_shards}; pad "
            "with edge_valid=False entries"
        )
        w_e = (edge_valid.astype(jnp.float32)
               if edge_weight is None else edge_weight * edge_valid)
        spec_rep = NamedSharding(mesh, P())
        spec_e = NamedSharding(mesh, P(axis))
        args = (
            jax.device_put(R, spec_rep), jax.device_put(t, spec_rep),
            jax.device_put(s, spec_rep),
            jax.device_put(edges_i, spec_e), jax.device_put(edges_j, spec_e),
            jax.device_put(R_meas, spec_e), jax.device_put(t_meas, spec_e),
            jax.device_put(s_meas, spec_e), jax.device_put(w_e, spec_e),
            jax.device_put(fixed, spec_rep),
        )
        R2, t2, s2, cost = jax.jit(run)(*args)
        return pg.PoseGraphResult(R=R2, t=t2, s=s2, cost=cost)

    return optimize
