"""Driver entry points: single-chip forward compile + multichip dryrun."""

import pytest

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    rgb, ins, depth = out
    assert rgb.shape == (1024, 3)
    assert np.isfinite(np.asarray(rgb)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) == 8
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2_and_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
    ge.dryrun_multichip(4)
