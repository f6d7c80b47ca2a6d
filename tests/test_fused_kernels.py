"""Oracle tests for the fused TPU hot-path kernels (r2 verdict item 1).

Both kernels are exercised through the Pallas interpreter on CPU against
the jnp reference implementations they replace:
- ops/fused_match.match_window  vs  matcher.match + window_gate
- backend/pose_opt_fused.optimize_pose_fused  vs  pose_opt.optimize_pose
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_ros2_tpu.backend import pose_opt, pose_opt_fused
from orb_slam3_ros2_tpu.geom import lie
from orb_slam3_ros2_tpu.ops import chol_small, fused_match, matcher


def _match_case(seed=0, N=300, M=700, planted=True):
    rng = np.random.default_rng(seed)
    sa = np.where(rng.integers(0, 2, (N, 256)), 1.0, -1.0).astype(np.float32)
    sb = np.where(rng.integers(0, 2, (M, 256)), 1.0, -1.0).astype(np.float32)
    uva = rng.uniform(0, 640, (N, 2)).astype(np.float32)
    uvb = rng.uniform(0, 640, (M, 2)).astype(np.float32)
    ma = rng.random(N) > 0.1
    mb = rng.random(M) > 0.1
    if planted:
        # near-duplicates within the window → real matches + ties
        for i in range(0, min(40, N, M // 2)):
            j = 2 * i
            sb[j] = sa[i]
            flips = rng.choice(256, size=rng.integers(0, 8), replace=False)
            sb[j, flips] *= -1.0
            uvb[j] = uva[i] + rng.uniform(-5, 5, 2)
            ma[i] = mb[j] = True
        # exact duplicate pair in B → argmin tie + mutual/second-best edge
        sb[M - 1] = sb[M - 2] = sa[7]
        uvb[M - 1] = uvb[M - 2] = uva[7]
        mb[M - 2] = mb[M - 1] = True
    return (jnp.asarray(sa), jnp.asarray(ma), jnp.asarray(uva),
            jnp.asarray(sb), jnp.asarray(mb), jnp.asarray(uvb))


@pytest.mark.parametrize("ratio,mutual", [(0.9, True), (0.9, False),
                                          (None, True), (None, False)])
def test_fused_match_matches_jnp_oracle(ratio, mutual):
    sa, ma, uva, sb, mb, uvb = _match_case()
    radius = 8.0
    ref = matcher.match(
        sa, ma, sb, mb, max_dist=50.0, ratio=ratio,
        gate=matcher.window_gate(uva, uvb, radius), mutual=mutual,
    )
    got = fused_match.match_window(
        sa, ma, uva, sb, mb, uvb, radius=radius, max_dist=50.0,
        ratio=ratio, mutual=mutual, interpret=True,
    )
    assert int(ref.valid.sum()) > 20  # the case is non-trivial
    np.testing.assert_array_equal(np.asarray(ref.valid),
                                  np.asarray(got.valid))
    np.testing.assert_array_equal(np.asarray(ref.idx), np.asarray(got.idx))
    v = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(ref.dist)[v],
                               np.asarray(got.dist)[v])


def test_fused_match_nonmultiple_shapes():
    # N, M far from the 128/1024 tile sizes exercise the padding path
    sa, ma, uva, sb, mb, uvb = _match_case(seed=3, N=77, M=131)
    ref = matcher.match(
        sa, ma, sb, mb, max_dist=60.0, ratio=0.9,
        gate=matcher.window_gate(uva, uvb, 10.0), mutual=True,
    )
    got = fused_match.match_window(
        sa, ma, uva, sb, mb, uvb, radius=10.0, max_dist=60.0,
        ratio=0.9, mutual=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.idx), np.asarray(got.idx))


def _pose_case(seed=1, N=300, outlier_frac=0.3):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-4, 4, N), rng.uniform(-3, 3, N),
                  rng.uniform(4, 10, N)], -1).astype(np.float32)
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    R_true = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.02])))
    t_true = np.array([0.1, -0.05, 0.2], np.float32)
    xc = X @ R_true.T + t_true
    uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                   fy * xc[:, 1] / xc[:, 2] + cy], -1).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape)
    out = rng.random(N) < outlier_frac
    uv[out] += rng.uniform(-80, 80, (out.sum(), 2))
    mask = rng.random(N) > 0.05
    invs2 = (1.2 ** (-2.0 * rng.integers(0, 8, N))).astype(np.float32)
    return (jnp.eye(3), jnp.zeros(3), jnp.asarray(X), jnp.asarray(uv),
            jnp.asarray(invs2), jnp.asarray(mask), fx, fy, cx, cy,
            R_true, t_true)


def test_fused_pose_opt_matches_jnp_oracle():
    (R0, t0, X, uv, invs2, mask, fx, fy, cx, cy,
     R_true, t_true) = _pose_case()
    ref = pose_opt.optimize_pose(R0, t0, X, uv, invs2, mask, fx, fy, cx, cy)
    got = pose_opt_fused.optimize_pose_fused(
        R0, t0, X, uv, invs2, mask, fx, fy, cx, cy, interpret=True)
    # both converge to the true pose
    assert np.abs(np.asarray(got.R) - R_true).max() < 2e-3
    assert np.abs(np.asarray(got.t) - t_true).max() < 1e-2
    # and agree with each other to float tolerance (identical algorithm)
    np.testing.assert_allclose(np.asarray(ref.R), np.asarray(got.R),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(got.t),
                               atol=5e-4)
    assert int(ref.n_inliers) == int(got.n_inliers)
    np.testing.assert_array_equal(np.asarray(ref.inliers),
                                  np.asarray(got.inliers))


def test_inv3x3_spd_matches_linalg():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(64, 3, 3)).astype(np.float64)
    spd = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(3)
    got = np.asarray(chol_small.inv3x3_spd(jnp.asarray(spd)))
    np.testing.assert_allclose(got, np.linalg.inv(spd), rtol=1e-5,
                               atol=1e-7)
