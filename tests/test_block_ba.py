"""Map-block-parallel BA on the 2-D ("kf", "lm") mesh: every block must
converge to its own scene's groundtruth, matching the per-block distributed
solver run one block at a time (SURVEY §7 mesh-axes design)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.backend import ba as ba_mod
from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.io import synthetic
from orb_slam3_ros2_tpu.parallel import block_ba, mesh as mesh_mod


def _one_problem(seed, K=6, L=64):
    sc = synthetic.make_scene(n_frames=K, n_points=L, noise_px=0.3,
                              seed=seed, fps=2.0)
    rng = np.random.default_rng(seed)
    xi = jnp.asarray(rng.normal(0, 0.02, (K, 6)).astype(np.float32))
    xi = xi.at[0].set(0.0).at[1].set(0.0)
    R0, t0 = lie.se3_retract(jnp.asarray(sc.R_cw), jnp.asarray(sc.t_cw), xi)
    X0 = jnp.asarray(sc.X + rng.normal(0, 0.05, sc.X.shape), jnp.float32)
    p = ba_mod.BAProblem(
        R=R0, t=t0, X=X0, uv=jnp.asarray(sc.uv),
        w=jnp.asarray(sc.vis, jnp.float32),
        fixed=jnp.zeros((K,), bool).at[0].set(True).at[1].set(True),
        point_valid=jnp.ones((L,), bool),
    )
    return sc, p


def test_block_sharded_ba_converges_all_blocks():
    assert len(jax.devices()) == 8
    mesh = mesh_mod.make_mesh(8, axis_names=(mesh_mod.KF_AXIS,
                                             mesh_mod.LM_AXIS))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "kf": 2, "lm": 4
    }

    B = 4  # 4 map blocks on a 2-wide kf axis: two rounds of two blocks
    scenes, problems = zip(*[_one_problem(seed) for seed in range(B)])
    batched = ba_mod.BAProblem(*[
        jnp.stack([getattr(p, f) for p in problems])
        for f in ba_mod.BAProblem._fields
    ])
    sc0 = scenes[0]
    ba = block_ba.make_block_sharded_ba(mesh, sc0.fx, sc0.fy, sc0.cx,
                                        sc0.cy, n_iters=10)
    out = ba(block_ba.shard_block_problem(batched, mesh))

    assert out.R.shape[0] == B
    # every block must reproduce the 1-D landmark-sharded solver run on its
    # problem alone (same math, blocks merely packed over the kf axis)
    from orb_slam3_ros2_tpu.parallel import sharded_ba

    mesh1 = mesh_mod.make_mesh(4)
    ba1 = sharded_ba.make_sharded_ba(mesh1, sc0.fx, sc0.fy, sc0.cx, sc0.cy,
                                     n_iters=10)
    for b, (sc, p) in enumerate(zip(scenes, problems)):
        ref = ba1(sharded_ba.shard_problem(p, mesh1))
        # atol 1e-4: the two paths share the math but differ in vmapped
        # reduction order (and the closed-form 3x3 inverse's rounding);
        # 1e-4 abs on poses is 80x below the scene-noise assert below
        np.testing.assert_allclose(np.asarray(out.t)[b], np.asarray(ref.t),
                                   atol=1e-4, err_msg=f"block {b}")
        t_err = np.linalg.norm(np.asarray(out.t)[b] - sc.t_cw,
                               axis=-1).mean()
        assert t_err < 8e-3, (b, t_err)  # scene noise floor
    assert np.isfinite(np.asarray(out.cost)).all()
