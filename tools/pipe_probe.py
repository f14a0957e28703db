"""Interleaved A/B of the label-gen software-pipeline depths.

The flagship fused pipeline is wire-bound (uplink ~24-45 MB/s depending
on tunnel phase; device ~0.28 s/unit): its throughput is set by how well
uploads, executions, and fetches overlap.  This probe sweeps the two
depth knobs — producer lookahead (``prefetch``) and device lookahead
(``in_flight``) — in ONE process, variants interleaved per round
(CLAUDE.md: never A/B across separate runs; the tunnel drifts).

Usage: python tools/pipe_probe.py [rounds]
"""

import sys
import time

import numpy as np


def main(rounds=3):
    sys.path.insert(0, ".")
    from bench import _InMemory, _label_gen_cfg, BATCH, GROUPS

    from spalign_tpu.data.synthetic import SyntheticRoadScenes
    from spalign_tpu.pipeline.direct import make_label_generator

    cfg = _label_gen_cfg("slic")
    n_units = 3
    n_batches = n_units * GROUPS
    ds = SyntheticRoadScenes(n=BATCH * 2, full_shape=(1024, 2048), seed=7)
    gen = make_label_generator(cfg)

    imgs_a, _ = ds.resized_batch(range(BATCH), cfg.resize_shape)
    imgs_b, _ = ds.resized_batch(range(BATCH, 2 * BATCH), cfg.resize_shape)
    mem = _InMemory(np.concatenate([imgs_a, imgs_b]), None,
                    n_batches=n_batches, batch=BATCH)

    orig_finish = gen.finish_batch

    def finish_and_land(prepared, handles, timers):
        out = orig_finish(prepared, handles, timers)
        if "road_packed_np" not in handles:
            np.asarray(handles.get("road_packed"))
        return out

    gen.finish_batch = finish_and_land
    gen.process_dataset(mem, save=False)  # compile + warm

    variants = [(2, 2), (3, 2), (3, 3), (4, 3)]  # (in_flight, prefetch)
    res = {v: [] for v in variants}
    for r in range(rounds):
        for v in variants:
            gen.in_flight, pf = v
            t0 = time.time()
            recs = gen.process_dataset(mem, save=False, prefetch=pf)
            dt = time.time() - t0
            assert len(recs) == n_batches * BATCH
            res[v].append(n_batches * BATCH / dt)
    for v, xs in res.items():
        print(f"in_flight={v[0]} prefetch={v[1]}: best "
              f"{max(xs):6.1f} img/s  all {[round(x, 1) for x in xs]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
