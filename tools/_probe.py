"""Shared measurement helpers for the tools/ probes.

One implementation of the tunnel round-trip probe so every tool
measures rtt identically (the copies had already started to multiply:
bn_probe, label_wire_probe, relabel_probe).  bench.py keeps its own
LARGER 512^2 health probe on purpose — it reports compile+execute
health, not just the link floor.
"""

import time

import numpy as np


def rtt(n: int = 4) -> float:
    """Best-of-(n-1) small-matmul round trip in seconds.  The first
    iteration warms the compile and is excluded; each rep uses a fresh
    payload (the runtime memoizes executions on identical inputs) and
    is fenced by the host fetch — the only real fence on this runtime
    (jax.block_until_ready is a no-op here)."""
    import jax.numpy as jnp

    best = float("inf")
    for i in range(n):
        x = jnp.asarray(np.random.RandomState(i).rand(8, 8)
                        .astype(np.float32))
        t0 = time.time()
        np.asarray(x @ x)
        if i:
            best = min(best, time.time() - t0)
    return best
