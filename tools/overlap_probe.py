"""Does an uplink transfer overlap device execution on this runtime?

The fused label-gen pipeline dispatches unit N's device program and then
(on the producer thread) uploads unit N+1's images.  If the runtime's
command stream serializes host->device copies behind queued executions,
the pipeline's per-unit wall clock is upload + exec (matches the
measured 218 img/s); if they overlap, it is max(upload, exec)
(~450 img/s potential).  This probe measures, in ONE process
(interleaved, CLAUDE.md discipline):

  A. exec-only:    N dependent heavy matmul chains behind one fence
  B. upload-only:  an 11 MB host->device put, fenced by a 1-element get
  C. serialized:   dispatch exec, wait for it (fetch), then upload
  D. pipelined:    dispatch exec, upload WHILE it runs, then fence both

If D ~= max(A1, B) the runtime overlaps; if D ~= A1 + B it serializes.
Also probes whether a SECOND thread doing the upload changes anything
(the pipeline's producer-thread topology).
"""

import threading
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    # a device program ~ the fused unit's 0.28 s: chain matmuls
    m = jnp.asarray(rs.rand(4096, 4096).astype(np.float32))

    def exec_chain(x, n=24):
        for _ in range(n):
            x = x @ m
            x = x / jnp.max(jnp.abs(x))
        return x

    exec_chain = jax.jit(exec_chain)
    seed = jnp.asarray(rs.rand(4096, 4096).astype(np.float32))
    np.asarray(exec_chain(seed))[0, 0]  # compile + warm

    # calibrate exec time (one fence over the chain; input varies)
    def fresh():
        return jnp.asarray(rs.rand(4096, 4096).astype(np.float32))

    payload_bytes = 11 * 2 ** 20

    def fresh_payload():
        return rs.randint(0, 255, (payload_bytes,), np.uint8)

    def fence(x):
        np.asarray(x if x.ndim == 0 else x.ravel()[0])

    # interleave the four measurements over several rounds
    res = {k: [] for k in ("exec", "upload", "serial", "pipelined",
                           "pipelined_thread")}
    for r in range(4):
        # A: exec only
        x = fresh()
        fence(x)  # land the input first
        t0 = time.time()
        y = exec_chain(x)
        fence(y)
        res["exec"].append(time.time() - t0)

        # B: upload only
        p = fresh_payload()
        t0 = time.time()
        d = jnp.asarray(p)
        fence(d[:1])
        res["upload"].append(time.time() - t0)

        # C: serial: exec, fence, then upload
        x = fresh()
        p = fresh_payload()
        fence(x)
        t0 = time.time()
        y = exec_chain(x)
        fence(y)
        d = jnp.asarray(p)
        fence(d[:1])
        res["serial"].append(time.time() - t0)

        # D: pipelined same-thread: dispatch exec, then upload, then fence
        x = fresh()
        p = fresh_payload()
        fence(x)
        t0 = time.time()
        y = exec_chain(x)          # enqueue (async dispatch)
        d = jnp.asarray(p)         # upload while (?) it runs
        fence(d[:1])
        fence(y)
        res["pipelined"].append(time.time() - t0)

        # E: pipelined with the upload on a second thread
        x = fresh()
        p = fresh_payload()
        fence(x)
        out = {}

        def up():
            dd = jnp.asarray(p)
            fence(dd[:1])
            out["d"] = dd

        t0 = time.time()
        y = exec_chain(x)
        th = threading.Thread(target=up)
        th.start()
        th.join()
        fence(y)
        res["pipelined_thread"].append(time.time() - t0)

    for k, v in res.items():
        print(f"{k:<18} best {min(v):.3f}s  all "
              f"{[round(t, 3) for t in v]}")
    e, u = min(res["exec"]), min(res["upload"])
    print(f"\nexpect serialized ~{e + u:.3f}s, overlapped ~{max(e, u):.3f}s")


if __name__ == "__main__":
    main()
