"""Driver-contract smoke: __graft_entry__.entry() compiles and runs;
dryrun_multichip covers the sharded train + inference programs."""

import sys

import jax
import numpy as np


def _load():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    return g


def test_entry_forward():
    g = _load()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 28, 28, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    g = _load()
    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    g = _load()
    g.dryrun_multichip(2)
