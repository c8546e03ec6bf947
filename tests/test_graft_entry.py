"""Driver interfaces: entry() compile-check and the multi-chip dry run must
keep working — the round driver invokes them directly."""

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, (params3, imu) = ge.entry()
    # compile check identical to the driver's
    compiled = jax.jit(fn).lower(params3, imu).compile()
    assert compiled is not None
    out = np.asarray(fn(params3, imu))
    assert out.shape == (imu.shape[0] * imu.shape[1], 24, 3, 3)
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert jax.device_count() >= 8
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd_device_count():
    """model_par falls back to 1 when n is odd."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(5)
