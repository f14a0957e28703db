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


def test_dryrun_multichip_cold_process():
    """The driver's exact invocation: a fresh process with no XLA_FLAGS /
    platform setup — dryrun_multichip must bootstrap the virtual CPU mesh
    itself (round-1 failure mode: MULTICHIP_r01 ok:false)."""
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip\n"
         "dryrun_multichip(8)\n"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok" in proc.stdout
