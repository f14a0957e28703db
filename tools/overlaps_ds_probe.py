"""Interleaved A/B of overlaps device-SLIC at full vs half resolution.

The overlaps mode's binding cost on a remote-attached TPU is the
full-resolution frame upload (~3 MB/img at 2 MP even as YUV420).
``SuperpixelConfig.slic_device_downscale=2`` computes the device
superpixels at 1 MP and NN-upsamples the refined mask on device,
quartering that upload.  This probe runs both variants round-robin in
ONE process (CLAUDE.md: never A/B across separate runs; the tunnel
drifts on an hours scale) and reports img/s per variant per round.

Usage: python tools/overlaps_ds_probe.py [rounds]
"""

import sys
import time

import dataclasses

import numpy as np


def main(rounds=3):
    sys.path.insert(0, ".")
    from bench import _InMemory, _label_gen_cfg

    from spalign_tpu.data.synthetic import SyntheticRoadScenes
    from spalign_tpu.pipeline.direct import make_label_generator

    cfg2 = _label_gen_cfg("overlaps_slic")  # downscale=2 (bench config)
    cfg1 = dataclasses.replace(cfg2, superpixel=dataclasses.replace(
        cfg2.superpixel, slic_device_downscale=1))
    bs = cfg2.batchsize
    n_batches = 4
    # every batch gets UNIQUE full-res frames: the runtime memoizes
    # executions on identical inputs, and the device-SLIC program's
    # input is the frame itself (seeds only vary the clustering
    # dispatch) — repeating frames would let later batches shortcut
    # the SLIC execution and inflate the measured rate
    n_frames = bs * n_batches
    ds = SyntheticRoadScenes(n=n_frames, full_shape=(1024, 2048), seed=7)
    imgs, _ = ds.resized_batch(range(n_frames), cfg2.resize_shape)
    fulls = np.stack([ds[i][0] for i in range(n_frames)])
    mem = _InMemory(imgs, fulls, n_batches=n_batches, batch=bs)

    gens = {d: make_label_generator(c)
            for d, c in ((1, cfg1), (2, cfg2))}
    for d, gen in gens.items():
        t0 = time.time()
        gen.process_dataset(mem, save=False)  # warmup/compile
        print(f"warmup d={d}: {time.time() - t0:.1f} s", flush=True)

    best = {1: 0.0, 2: 0.0}
    for r in range(rounds):
        for d, gen in gens.items():
            t0 = time.time()
            records = gen.process_dataset(mem, save=False)
            dt = time.time() - t0
            assert len(records) == n_batches * bs
            rate = n_batches * bs / dt
            best[d] = max(best[d], rate)
            print(f"round {r} downscale={d}: {rate:6.2f} img/s",
                  flush=True)
    print(f"best: d=1 {best[1]:.2f} img/s, d=2 {best[2]:.2f} img/s, "
          f"speedup {best[2] / best[1]:.2f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
