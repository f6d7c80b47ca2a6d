"""Driver entry points: entry() compile check + multi-chip dry run."""

import numpy as np
import jax

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    R, t, n_inliers = jax.jit(fn)(*args)
    assert R.shape == (3, 3) and t.shape == (3,)
    assert np.isfinite(np.asarray(R)).all()
    assert np.isfinite(np.asarray(t)).all()
    # the example is a self-consistent solve (landmarks backprojected from
    # the same image's features at identity) — it must actually match
    assert int(n_inliers) > 100
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-3)


def test_dryrun_multichip_small():
    # conftest already forces the 8-device virtual CPU platform; 2 devices
    # keeps the three sharded compiles cheap while exercising the kf/lm
    # mesh paths end-to-end.
    ge.dryrun_multichip(2)


def test_devices_for_rejects_impossible():
    devs = ge._devices_for(4)
    assert len(devs) == 4
