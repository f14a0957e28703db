"""Interleaved A/B of the label-gen fetch-ahead thread.

Transfers on this runtime are PULL-model (perf_playbook §7): the
downlink only moves while a device_get blocks on it.  `_submit_fetch`
puts each unit's combined device_get on a dedicated thread right after
its dispatch, so unit N+1's mask downlink streams under unit N's host
scoring/save work.  This probe measures the end-to-end effect on the
fused SLIC pipeline, unscored and GT-scored (the scored path has
~2.9 ms/img of host confusion work for the downlink to hide under),
variants interleaved per round in ONE process (CLAUDE.md: the tunnel
drifts on an hours scale — never A/B across separate runs).

Usage: python tools/fetch_probe.py [rounds]
"""

import sys
import time

import numpy as np


def run_mode(mode, rounds):
    from bench import _InMemory, _label_gen_cfg, BATCH, GROUPS

    from spalign_tpu.data.synthetic import SyntheticRoadScenes
    from spalign_tpu.pipeline.direct import make_label_generator

    cfg = _label_gen_cfg(mode)
    scored = mode == "slic_scored"
    n_batches = 3 * GROUPS
    ds = SyntheticRoadScenes(n=BATCH * 2, full_shape=(1024, 2048), seed=7)
    gen = make_label_generator(cfg)

    imgs_a, la = ds.resized_batch(range(BATCH), cfg.resize_shape)
    imgs_b, lb = ds.resized_batch(range(BATCH, 2 * BATCH), cfg.resize_shape)
    labels = np.concatenate([la, lb]) if scored else None
    mem = _InMemory(np.concatenate([imgs_a, imgs_b]), None,
                    n_batches=n_batches, batch=BATCH, labels=labels)

    orig_finish = gen.finish_batch

    def finish_and_land(prepared, handles, timers):
        out = orig_finish(prepared, handles, timers)
        if "road_packed_np" not in handles:
            np.asarray(handles.get("road_packed"))
        return out

    gen.finish_batch = finish_and_land
    gen.process_dataset(mem, save=False)  # compile + warm

    res = {True: [], False: []}
    for r in range(rounds):
        for fetch_ahead in (False, True):
            gen.fetch_ahead = fetch_ahead
            t0 = time.time()
            recs = gen.process_dataset(mem, save=False)
            dt = time.time() - t0
            assert len(recs) == n_batches * BATCH
            res[fetch_ahead].append(n_batches * BATCH / dt)
    for fa, xs in res.items():
        print(f"{mode}: fetch_ahead={fa}: best {max(xs):6.1f} img/s  "
              f"all {[round(x, 1) for x in xs]}")


def main(rounds=3):
    sys.path.insert(0, ".")
    for mode in ("slic", "slic_scored"):
        run_mode(mode, rounds)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
