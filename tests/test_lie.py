"""SO(3)/SE(3)/Sim(3) vs closed forms and scipy.spatial.transform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from orb_slam3_ros2_tpu.geom import lie


def rng_vecs(n, scale=1.0, seed=0, dim=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, dim)) * scale, dtype=jnp.float32)


def test_so3_exp_matches_scipy():
    phi = rng_vecs(64, scale=1.5)
    R = lie.so3_exp(phi)
    R_sc = Rsc.from_rotvec(np.asarray(phi)).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_sc, atol=1e-5)


def test_so3_log_roundtrip():
    # stay on the principal branch: |phi| < pi
    rng = np.random.default_rng(1)
    axes = rng.normal(size=(64, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    mags = rng.uniform(0.0, 3.1, size=(64, 1))
    phi = jnp.asarray((axes * mags).astype(np.float32))
    out = lie.so3_log(lie.so3_exp(phi))
    np.testing.assert_allclose(np.asarray(out), np.asarray(phi), atol=2e-4)


def test_so3_log_small_and_pi():
    # near-identity
    phi = rng_vecs(16, scale=1e-6, seed=2)
    out = lie.so3_log(lie.so3_exp(phi))
    np.testing.assert_allclose(np.asarray(out), np.asarray(phi), atol=1e-7)
    # near pi
    axes = np.array(rng_vecs(16, seed=3))
    axes = axes / np.linalg.norm(axes, axis=-1, keepdims=True)
    phi_pi = jnp.asarray(axes * (np.pi - 1e-4), dtype=jnp.float32)
    out = lie.so3_log(lie.so3_exp(phi_pi))
    # log may return the equivalent rotation; compare matrices
    np.testing.assert_allclose(
        np.asarray(lie.so3_exp(out)), np.asarray(lie.so3_exp(phi_pi)), atol=2e-3
    )


def test_so3_exp_grad_at_zero_is_finite():
    g = jax.jacobian(lambda p: lie.so3_exp(p).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_log_roundtrip():
    # rho free; |phi| < pi to stay on the log principal branch
    rng = np.random.default_rng(4)
    rho = rng.normal(size=(64, 3))
    axes = rng.normal(size=(64, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    phi = axes * rng.uniform(0.0, 3.0, size=(64, 1))
    xi = jnp.asarray(np.concatenate([rho, phi], -1).astype(np.float32))
    R, t = lie.se3_exp(xi)
    out = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xi), atol=5e-4)


def test_se3_compose_inverse():
    xi = rng_vecs(8, scale=0.7, seed=5, dim=6)
    R, t = lie.se3_exp(xi)
    Ri, ti = lie.se3_inverse(R, t)
    Rc, tc = lie.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(
        np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)


def test_se3_left_jacobian_consistency():
    # J_l(phi) @ J_l_inv(phi) == I
    phi = rng_vecs(32, scale=1.2, seed=6)
    J = lie.so3_left_jacobian(phi)
    Ji = lie.so3_left_jacobian_inv(phi)
    prod = J @ Ji
    np.testing.assert_allclose(
        np.asarray(prod), np.broadcast_to(np.eye(3), prod.shape), atol=1e-5
    )


def test_se3_retract_matches_manual():
    xi0 = rng_vecs(4, scale=0.5, seed=7, dim=6)
    R, t = lie.se3_exp(xi0)
    dxi = rng_vecs(4, scale=0.01, seed=8, dim=6)
    R2, t2 = lie.se3_retract(R, t, dxi)
    dR, dt = lie.se3_exp(dxi)
    R_ref, t_ref = lie.se3_compose(dR, dt, R, t)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_ref), atol=1e-6)


@pytest.mark.parametrize("scale_mag", [0.0, 0.3])
def test_sim3_exp_log_roundtrip(scale_mag):
    rng = np.random.default_rng(9)
    xi = np.concatenate(
        [
            rng.normal(size=(16, 3)),
            rng.normal(size=(16, 3)) * 0.8,
            rng.normal(size=(16, 1)) * scale_mag,
        ],
        axis=-1,
    ).astype(np.float32)
    xi = jnp.asarray(xi)
    R, t, s = lie.sim3_exp(xi)
    out = lie.sim3_log(R, t, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xi), atol=2e-3)


def test_sim3_compose_inverse():
    rng = np.random.default_rng(10)
    xi = jnp.asarray(rng.normal(size=(8, 7)).astype(np.float32) * 0.5)
    R, t, s = lie.sim3_exp(xi)
    Ri, ti, si = lie.sim3_inverse(R, t, s)
    Rc, tc, sc = lie.sim3_compose(R, t, s, Ri, ti, si)
    np.testing.assert_allclose(
        np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)


def test_sim3_apply_vs_manual():
    rng = np.random.default_rng(11)
    xi = jnp.asarray(rng.normal(size=(7,)).astype(np.float32) * 0.4)
    R, t, s = lie.sim3_exp(xi)
    x = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    got = lie.sim3_apply(R, t, s, x)
    want = s * (np.asarray(R) @ np.asarray(x).T).T + np.asarray(t)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
