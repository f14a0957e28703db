"""Per-stage attribution of the relabel pass on the real TPU.

Times, separately and in ONE process: host load+wire-convert, upload,
device execution (N behind one fence, tunnel rtt subtracted), the
combined fetch (bytes / rate), host reconstruction (unpack + ch1), and
the zip write — to find where the measured ~0.8 img/s actually goes.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from spalign_tpu.data.cityscapes import (CITYSCAPES_MEAN,
                                             CITYSCAPES_STD)
    from spalign_tpu.models import SegNetBasic
    from spalign_tpu.models.segnet import predict_labels
    from spalign_tpu.pipeline.label_gen import (pack_mask_bits,
                                                unpack_mask_bits)

    h, w = 512, 1024
    eval_hw = (1024, 2048)
    batch = 8
    model = SegNetBasic(n_class=2)
    variables = model.init(jax.random.key(0),
                           np.zeros((1, h, w, 3), np.float32))
    apply_fn = lambda v, im, train: model.apply(v, im, train=train)
    mean = np.asarray(CITYSCAPES_MEAN, np.float32)
    std = np.asarray(CITYSCAPES_STD, np.float32)

    @jax.jit
    def predict(v, im):
        x = (im.astype(jnp.float32) - mean) / std
        labels, score = predict_labels(apply_fn, v, x,
                                       pred_shape=eval_hw,
                                       return_score=True)
        chw = jnp.transpose(score, (0, 3, 1, 2)).astype(jnp.float16)
        return {"packed": pack_mask_bits(labels.astype(bool)),
                "score": chw[:, :1]}

    def u8_batch(seed):
        return np.random.RandomState(seed).randint(
            0, 256, (batch, h, w, 3)).astype(np.uint8)

    # warm/compile
    out = predict(variables, jnp.asarray(u8_batch(0)))
    np.asarray(out["score"]).ravel()[0]

    # tunnel rtt
    def rtt():
        best = 1e9
        for i in range(3):
            x = jnp.asarray(np.random.RandomState(50 + i).rand(8, 8)
                            .astype(np.float32))
            t0 = time.time()
            np.asarray(x @ x)
            best = min(best, time.time() - t0)
        return best

    r = rtt()
    print(f"tunnel rtt {r*1e3:.0f} ms")

    # upload-only: 12 MB u8 batch
    for _ in range(3):
        b = u8_batch(np.random.randint(1 << 30))
        t0 = time.time()
        d = jnp.asarray(b)
        np.asarray(d[0, 0, 0, 0])
        print(f"upload {b.nbytes/2**20:.1f} MB: {time.time()-t0:.3f}s "
              f"({b.nbytes/2**20/(time.time()-t0):.1f} MB/s)")

    # device exec: N dependent? they're independent; chain behind 1 fence
    n = 6
    ins = [jnp.asarray(u8_batch(1000 + i)) for i in range(n)]
    np.asarray(ins[-1][0, 0, 0, 0])  # land uploads
    t0 = time.time()
    outs = [predict(variables, x) for x in ins]
    np.asarray(outs[-1]["packed"].ravel()[0])  # fences last exec
    dt = (time.time() - t0 - r) / n
    print(f"device exec: {dt:.3f}s/batch ({batch/dt:.1f} img/s bound)")

    # fetch: the combined handles dict of ONE batch
    for i in range(3):
        o = predict(variables, ins[i])
        np.asarray(o["packed"].ravel()[0])  # ensure exec done
        nbytes = (o["packed"].size * 1 + o["score"].size * 2)
        t0 = time.time()
        got = jax.device_get(o)
        dt = time.time() - t0
        print(f"fetch {nbytes/2**20:.1f} MB: {dt:.3f}s "
              f"({nbytes/2**20/dt:.1f} MB/s)")

    # host recon + zip write
    import tempfile, os
    from spalign_tpu.selftrain.relabel import NpzShardWriter

    t0 = time.time()
    preds_np = unpack_mask_bits(got["packed"], eval_hw[1])
    s = got["score"]
    scores_np = np.concatenate(
        [s, (1.0 - s.astype(np.float32)).astype(s.dtype)], axis=1)
    print(f"host recon: {time.time()-t0:.3f}s")
    with tempfile.TemporaryDirectory() as td:
        wpath = os.path.join(td, "probe.zip")
        t0 = time.time()
        wr = NpzShardWriter(wpath)
        for i in range(batch):
            wr.put(f"im{i}", preds_np[i])
            wr.put(f"im{i}_scores", scores_np[i])
        wr.close()
        print(f"zip write {os.path.getsize(wpath)/2**20:.1f} MB: "
              f"{time.time()-t0:.3f}s")


if __name__ == "__main__":
    main()
