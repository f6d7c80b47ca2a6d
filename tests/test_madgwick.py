"""Madgwick AHRS filter tests (imu_filter_madgwick parity, rtabmap.launch.py:67-84)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_ros2_tpu.geom.lie import so3_exp
from orb_slam3_ros2_tpu.imu.madgwick import (
    MadgwickFilter, madgwick_filter, quat_from_accel, quat_mul,
    quat_to_rotmat,
)


def _static_acc(R_wb):
    """Accelerometer reading (in g) for a static sensor with pose R_wb."""
    return np.asarray(R_wb).T @ np.array([0.0, 0.0, 1.0])


def test_quat_from_accel_recovers_tilt():
    rng = np.random.default_rng(0)
    for _ in range(5):
        phi = rng.normal(size=3) * 0.6
        phi[2] = 0.0  # yaw unobservable from gravity
        R_wb = np.asarray(so3_exp(jnp.asarray(phi, jnp.float32)))
        acc = _static_acc(R_wb) * 9.81
        q = quat_from_accel(jnp.asarray(acc, jnp.float32))
        R_est = np.asarray(quat_to_rotmat(q))
        np.testing.assert_allclose(R_est.T @ [0, 0, 1], acc / 9.81,
                                   atol=1e-5)


def test_static_convergence_to_tilt():
    # start from identity with the sensor actually tilted: the accel
    # correction alone must pull the estimate onto the true gravity dir.
    phi = np.array([0.3, -0.2, 0.0])
    R_wb = np.asarray(so3_exp(jnp.asarray(phi, jnp.float32)))
    acc = _static_acc(R_wb)
    n = 400
    qs = madgwick_filter(
        jnp.zeros((n, 3), jnp.float32),
        jnp.tile(jnp.asarray(acc, jnp.float32), (n, 1)),
        jnp.full((n,), 0.005, jnp.float32),
        jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
        jnp.float32(0.5),
    )
    R_est = np.asarray(quat_to_rotmat(qs[-1]))
    np.testing.assert_allclose(R_est.T @ [0, 0, 1], acc, atol=2e-3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(qs), axis=1), 1.0,
                               atol=1e-5)


def test_beta_zero_matches_gyro_closed_form():
    # constant ω about z, beta=0 → pure integration; compare the rotation
    # angle against ω·t.
    w = 0.7
    n, dt = 200, 0.01
    qs = madgwick_filter(
        jnp.tile(jnp.array([0.0, 0.0, w], jnp.float32), (n, 1)),
        jnp.zeros((n, 3), jnp.float32),  # |acc|≈0 → correction skipped
        jnp.full((n,), dt, jnp.float32),
        jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
        jnp.float32(0.0),
    )
    R = np.asarray(quat_to_rotmat(qs[-1]))
    ang = np.arctan2(R[1, 0], R[0, 0])
    # first-order quaternion integration: error O(dt) per step is tiny here
    assert abs(ang - w * n * dt) < 2e-3


def test_mask_freezes_state():
    n = 10
    mask = jnp.zeros((n,), bool).at[:4].set(True)
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    qs = madgwick_filter(
        jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32), (n, 1)),
        jnp.zeros((n, 3), jnp.float32),
        jnp.full((n,), 0.01, jnp.float32), q0, jnp.float32(0.0),
        mask=mask,
    )
    np.testing.assert_array_equal(np.asarray(qs[4]), np.asarray(qs[-1]))
    assert not np.allclose(np.asarray(qs[3]), np.asarray(q0))


def test_streaming_matches_batch():
    rng = np.random.default_rng(1)
    n = 120
    t = np.arange(n) * 0.005
    gyro = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    acc = (np.array([0.0, 0.0, 1.0]) +
           rng.normal(size=(n, 3)) * 0.02).astype(np.float32)

    f_stream = MadgwickFilter(beta=0.1)
    out = [np.asarray(f_stream.update(gyro[i:i + 30], acc[i:i + 30],
                                      t[i:i + 30]))
           for i in range(0, n, 30)]
    q_stream = np.concatenate(out)

    f_batch = MadgwickFilter(beta=0.1)
    q_batch = np.asarray(f_batch.update(gyro, acc, t))
    np.testing.assert_allclose(q_stream, q_batch, atol=1e-5)
    assert f_stream.rotation is not None


def test_hamilton_product_convention():
    # q ⊗ q* = identity; rotmat of product = product of rotmats
    rng = np.random.default_rng(2)
    q1 = rng.normal(size=4).astype(np.float32)
    q1 /= np.linalg.norm(q1)
    q2 = rng.normal(size=4).astype(np.float32)
    q2 /= np.linalg.norm(q2)
    q12 = quat_mul(jnp.asarray(q1), jnp.asarray(q2))
    R12 = np.asarray(quat_to_rotmat(q12))
    R1 = np.asarray(quat_to_rotmat(jnp.asarray(q1)))
    R2 = np.asarray(quat_to_rotmat(jnp.asarray(q2)))
    np.testing.assert_allclose(R12, R1 @ R2, atol=1e-5)
