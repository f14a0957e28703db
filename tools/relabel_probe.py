"""Relabel-pass attribution + variant A/B on the real TPU.

The relabel pass (selftrain/relabel.py, reference labels_from_segnet.py)
is the one workload still far from the reference rig in absolute
throughput (README row: 4.2 img/s).  This probe measures, in ONE
process (the tunnel drifts on an hours scale — perf_playbook.md §1):

  part e2e:   relabel_dataset() end-to-end img/s for variants:
                A  current default (u8 uplink, packed preds + ch0 f16
                   network-res score downlink)
                B  A + host-derived preds (no packed fetch; preds from
                   the host-upsampled ch0, see relabel.py)
                C  B + network-res score zip members (rounds-loop wire
                   format; the training reader resizes to input res
                   anyway, so eval-res storage is presentation)
  part stages: isolated costs — host wire prep, upload, device exec,
               fetch, host recon (upsample/ch1/confusion), zip write —
               to attribute whatever e2e shows.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/relabel_probe.py [e2e|stages]
"""

import os
import sys
import tempfile
import time

import numpy as np

H, W = 512, 1024
EVAL_HW = (1024, 2048)
BATCH = 8
N_IMGS = 32  # 4 batches: enough for the software pipeline to reach
# steady state (2-batch runs measure mostly ramp); each 2 MP synthetic
# render costs host seconds, paid once at init, excluded from timing


def main(part: str = "e2e"):
    import jax

    from spalign_tpu.data.cityscapes import (CITYSCAPES_MEAN,
                                             CITYSCAPES_STD)
    from spalign_tpu.data.synthetic import SyntheticRoadScenes
    from spalign_tpu.models import SegNetBasic
    from spalign_tpu.selftrain.relabel import relabel_dataset

    ds_full = SyntheticRoadScenes(n=N_IMGS, full_shape=EVAL_HW, seed=21)

    class RelabelView:
        """(standardized image at input res, full-res gt)."""

        def __init__(self, n=N_IMGS):
            import cv2

            self.n = n
            # ONE render per image (each 2 MP scene costs host seconds;
            # dataset load cost is not the pass under test — the real
            # loader amortizes it behind device time)
            imgs, gts = [], []
            for i in range(n):
                img, lab = ds_full[i]
                imgs.append(cv2.resize(img, (W, H),
                                       interpolation=cv2.INTER_AREA))
                gts.append((lab == 7).astype(np.int32))
            self.imgs = ((np.stack(imgs).astype(np.float32)
                          - CITYSCAPES_MEAN) / CITYSCAPES_STD)
            self.gts = np.stack(gts)

        def __len__(self):
            return self.n

        def image_name(self, i):
            return f"probe_{i:04d}.png"

        def __getitem__(self, i):
            return self.imgs[i], self.gts[i]

    view = RelabelView()
    model = SegNetBasic(n_class=2)
    variables = model.init(jax.random.key(0),
                           np.zeros((1, H, W, 3), np.float32))

    variants = [("A eval-res zip", {})]
    # variant B keys on the relabel_dataset kwarg added this round; the
    # probe stays runnable on the pre-change tree (it just vanishes)
    import inspect

    params = inspect.signature(relabel_dataset).parameters
    if "score_store" in params:
        variants.append(("B net-res zip", {"score_store": "network"}))
    if "score_store" in params and "input_wire" in params:
        # variant C keys on the yuv420 input wire (r5): the pass is
        # uplink-bound at the u8 wire (~85 of ~86 ms/img, playbook §5);
        # 1.5 B/px should roughly halve the budget.  Guarded on its OWN
        # kwarg so the probe stays runnable on a tree that has the
        # network store but not yet the wire.
        variants.append(("C net-res + yuv420",
                         {"score_store": "network",
                          "input_wire": "yuv420"}))

    if part == "e2e":
        results = {name: [] for name, _ in variants}
        with tempfile.TemporaryDirectory() as td:
            # warm every variant (compiles)
            for name, kw in variants:
                relabel_dataset(model, variables, view,
                                os.path.join(td, "warm.zip"),
                                eval_shape=EVAL_HW, batch_size=BATCH,
                                soft_label=True,
                                score_dtype=np.float16, **kw)
            for rnd in range(3):
                for name, kw in variants:
                    t0 = time.time()
                    relabel_dataset(model, variables, view,
                                    os.path.join(td, "out.zip"),
                                    eval_shape=EVAL_HW,
                                    batch_size=BATCH, soft_label=True,
                                    score_dtype=np.float16, **kw)
                    dt = time.time() - t0
                    rate = N_IMGS / dt
                    results[name].append(rate)
                    print(f"round {rnd} {name:<18} {rate:5.2f} img/s "
                          f"({dt:.1f}s)", flush=True)
        print("\n=== best-of-3 ===")
        for name, _ in variants:
            print(f"  {name:<18} {max(results[name]):5.2f} img/s")
        return

    # ---- part "stages": isolated attribution
    import jax.numpy as jnp

    from spalign_tpu.models.segnet import predict_labels
    from spalign_tpu.pipeline.label_gen import (pack_mask_bits,
                                                unpack_mask_bits)
    from spalign_tpu.selftrain.relabel import (NpzShardWriter,
                                               _host_confusion_remapped)

    mean = np.asarray(CITYSCAPES_MEAN, np.float32)
    std = np.asarray(CITYSCAPES_STD, np.float32)
    apply_fn = lambda v, im, train: model.apply(v, im, train=train)

    @jax.jit
    def predict(v, im):
        x = (im.astype(jnp.float32) - mean) / std
        labels, score = predict_labels(apply_fn, v, x,
                                       pred_shape=EVAL_HW,
                                       return_score=True,
                                       return_small_score=True)
        score, score_small = score
        chw = jnp.transpose(score_small, (0, 3, 1, 2)).astype(jnp.float16)
        return {"packed": pack_mask_bits(labels.astype(bool)),
                "score": chw[:, :1]}

    n_b = N_IMGS // BATCH

    def u8_batch(i):
        i = i % n_b
        imgs = view.imgs[i * BATCH:(i + 1) * BATCH]
        return np.clip(np.rint(imgs * std + mean), 0, 255).astype(np.uint8)

    def rtt():
        best = 1e9
        for i in range(3):
            x = jnp.asarray(np.random.RandomState(50 + i)
                            .rand(8, 8).astype(np.float32))
            t0 = time.time()
            np.asarray(x @ x)
            best = min(best, time.time() - t0)
        return best

    out = predict(variables, jnp.asarray(u8_batch(0)))  # compile
    got = jax.device_get(out)
    r = rtt()
    print(f"tunnel rtt {r*1e3:.0f} ms")

    # host wire prep (standardization inversion)
    t0 = time.time()
    for i in range(4):
        u8_batch(i)
    print(f"host u8 prep: {(time.time()-t0)/4/BATCH*1e3:.1f} ms/img",
          flush=True)

    # upload
    for i in range(2):
        b = u8_batch(i)
        b[0, 0, 0, 0] ^= i + 1  # defeat the memoizer
        t0 = time.time()
        d = jnp.asarray(b)
        np.asarray(d[0, 0, 0, 0])
        dt = time.time() - t0 - r
        print(f"upload {b.nbytes/2**20:.1f} MB: {dt*1e3:.0f} ms "
              f"({b.nbytes/2**20/dt:.1f} MB/s)")

    # device exec (chained behind one fence)
    n = 6
    ins = [jnp.asarray(u8_batch(i) ^ (i // n_b + 1)) for i in range(n)]
    np.asarray(ins[-1][0, 0, 0, 0])
    t0 = time.time()
    for x in ins:
        o = predict(variables, x)
    np.asarray(o["packed"]).ravel()[0]
    # the final fetch drags the packed array; subtract its wire cost via
    # a second fetch timing below instead of pretending it's free
    dt = (time.time() - t0 - r) / n
    print(f"device exec+1 packed fetch: {dt*1e3:.0f} ms/batch "
          f"({BATCH/dt:.1f} img/s bound)")

    # combined fetch
    for i in range(2):
        o = predict(variables, ins[i])
        np.asarray(o["packed"]).ravel()[0]
        nbytes = o["packed"].size + o["score"].size * 2
        t0 = time.time()
        got = jax.device_get(o)
        dt = time.time() - t0
        print(f"fetch {nbytes/2**20:.1f} MB: {dt*1e3:.0f} ms "
              f"({nbytes/2**20/dt:.1f} MB/s)")

    # host recon: unpack, upsample ch0 to eval, ch1, threshold, confusion
    import cv2

    t0 = time.time()
    preds_np = unpack_mask_bits(got["packed"], EVAL_HW[1])
    t1 = time.time()
    s = got["score"]  # (B,1,h,w) f16
    ch0 = np.stack([cv2.resize(s[b, 0].astype(np.float32),
                               (EVAL_HW[1], EVAL_HW[0]),
                               interpolation=cv2.INTER_LINEAR)
                    for b in range(BATCH)])
    t2 = time.time()
    scores_np = np.stack([ch0, 1.0 - ch0], 1).astype(np.float16)
    t3 = time.time()
    host_preds = ch0 < 0.5
    t4 = time.time()
    confs = [_host_confusion_remapped(preds_np[b], view.gts[b])
             for b in range(BATCH)]
    t5 = time.time()
    print(f"host recon/img: unpack {(t1-t0)/BATCH*1e3:.1f} | upsample "
          f"{(t2-t1)/BATCH*1e3:.1f} | ch1+f16 {(t3-t2)/BATCH*1e3:.1f} | "
          f"thresh {(t4-t3)/BATCH*1e3:.1f} | confusion "
          f"{(t5-t4)/BATCH*1e3:.1f} ms")
    agree = float((host_preds == preds_np).mean())
    print(f"host-derived preds vs device argmax: agreement {agree:.6f}")

    # zip write (eval-res vs network-res members)
    with tempfile.TemporaryDirectory() as td:
        for tag, sc in (("eval-res", scores_np),
                        ("net-res", np.stack([s[:, 0],
                                              1.0 - s[:, 0].astype(
                                                  np.float32)],
                                             1).astype(np.float16))):
            t0 = time.time()
            wzip = NpzShardWriter(os.path.join(td, f"{tag}.zip"))
            for b in range(BATCH):
                wzip.put(f"im{b}", preds_np[b])
                wzip.put(f"im{b}_scores", sc[b])
            wzip.close()
            sz = os.path.getsize(os.path.join(td, f"{tag}.zip"))
            print(f"zip write {tag}: {sz/2**20:.1f} MB, "
                  f"{(time.time()-t0)/BATCH*1e3:.1f} ms/img")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "e2e")
