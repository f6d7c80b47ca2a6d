"""Edge-sharded pose-graph optimization on the 8-device CPU mesh must match
the single-device optimizer and correct loop-closure drift."""

import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.loop import pose_graph as pg
from orb_slam3_ros2_tpu.parallel import mesh as mesh_mod
from orb_slam3_ros2_tpu.parallel import sharded_pose_graph as spg


def _loop_problem(K=24, drift=0.02, seed=0):
    """Circle trajectory with odometry edges + one loop edge; odometry
    measurements exact, initial poses drifted — the loop edge must pull the
    graph closed."""
    rng = np.random.default_rng(seed)
    # groundtruth poses on a circle
    Rg, tg = [], []
    for k in range(K):
        a = 2 * np.pi * k / K
        Rwk = np.array([[np.cos(a), -np.sin(a), 0],
                        [np.sin(a), np.cos(a), 0],
                        [0, 0, 1]])
        cw = np.array([np.cos(a) * 3, np.sin(a) * 3, 0.0])
        R_cw = Rwk.T
        t_cw = -R_cw @ cw
        Rg.append(R_cw)
        tg.append(t_cw)
    Rg, tg = np.asarray(Rg, np.float32), np.asarray(tg, np.float32)
    sg = np.ones(K, np.float32)

    # exact relative Sim3 measurements S_ij = S_i S_j^-1 along odometry +
    # the loop edge (K-1, 0)
    ei, ej, Rm, tm, sm = [], [], [], [], []

    def add_edge(i, j):
        Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(
            jnp.asarray(Rg[j]), jnp.asarray(tg[j]), jnp.asarray(sg[j]))
        Rij, tij, sij = lie.sim3_compose(
            jnp.asarray(Rg[i]), jnp.asarray(tg[i]), jnp.asarray(sg[i]),
            Rj_inv, tj_inv, sj_inv)
        ei.append(i)
        ej.append(j)
        Rm.append(np.asarray(Rij))
        tm.append(np.asarray(tij))
        sm.append(float(sij))

    for k in range(K - 1):
        add_edge(k + 1, k)
    add_edge(0, K - 1)  # loop edge

    E = len(ei)
    pad = (-E) % 8  # make divisible by the 8-device mesh
    for _ in range(pad):
        ei.append(0)
        ej.append(0)
        Rm.append(np.eye(3, dtype=np.float32))
        tm.append(np.zeros(3, np.float32))
        sm.append(1.0)
    valid = np.asarray([True] * E + [False] * pad)

    # drifted initialization: accumulate noise along the chain
    R0, t0, s0 = [Rg[0]], [tg[0]], [1.0]
    for k in range(1, K):
        xi = np.zeros(7, np.float32)
        xi[:3] = rng.normal(0, drift, 3)  # rho
        xi[3:6] = rng.normal(0, drift, 3)  # phi
        xi[6] = rng.normal(0, drift * 0.5)  # sigma
        dR, dt, ds = lie.sim3_exp(jnp.asarray(xi))
        Rk, tk, sk = lie.sim3_compose(
            dR, dt, ds, jnp.asarray(Rg[k]), jnp.asarray(tg[k]),
            jnp.asarray(sg[k]))
        R0.append(np.asarray(Rk))
        t0.append(np.asarray(tk))
        s0.append(float(sk))
    fixed = np.zeros(K, bool)
    fixed[0] = True
    return (
        jnp.asarray(np.asarray(R0, np.float32)),
        jnp.asarray(np.asarray(t0, np.float32)),
        jnp.asarray(np.asarray(s0, np.float32)),
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.asarray(Rm, np.float32)),
        jnp.asarray(np.asarray(tm, np.float32)),
        jnp.asarray(np.asarray(sm, np.float32)),
        jnp.asarray(valid), jnp.asarray(fixed), Rg, tg,
    )


def test_sharded_matches_replicated_and_closes_loop():
    (R0, t0, s0, ei, ej, Rm, tm, sm, valid, fixed, Rg, tg) = _loop_problem()
    K = R0.shape[0]

    ref = pg.optimize_pose_graph(
        R0, t0, s0, ei, ej, Rm, tm, sm, valid, fixed, n_iters=15,
    )
    mesh = mesh_mod.make_mesh(8)
    opt = spg.make_sharded_pose_graph(mesh, K, n_iters=15)
    out = opt(R0, t0, s0, ei, ej, Rm, tm, sm, valid, fixed)

    # sharded == replicated (same math, psum-reduced)
    np.testing.assert_allclose(np.asarray(out.R), np.asarray(ref.R),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               atol=5e-4)

    # and the loop actually closed: camera centers near groundtruth
    def centers(R, t, s):
        return np.stack([
            -(np.asarray(R[k]).T @ np.asarray(t[k])) / np.asarray(s[k])
            for k in range(K)
        ])
    err0 = np.linalg.norm(centers(R0, t0, s0) - centers(Rg, tg,
                                                        np.ones(K)), axis=-1)
    err1 = np.linalg.norm(centers(out.R, out.t, out.s)
                          - centers(Rg, tg, np.ones(K)), axis=-1)
    assert err1.max() < 0.25 * err0.max(), (err0.max(), err1.max())
    assert err1.max() < 0.08, err1.max()
