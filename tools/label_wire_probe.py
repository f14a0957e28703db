"""Wire-budget attribution for the flagship fused label-gen pipeline.

VERDICT r4 #3: e2e is 562-573 img/s against 1,576 img/s device-bound —
the claim "the rest is uplink" needs a per-stream budget like the
relabel table (docs/perf_playbook.md §5), not an assertion.  This probe
measures, in ONE process:

  rtt            tunnel round-trip (context for everything below)
  uplink         time to land a unit's image batch on device, per wire
                 format (yuv420 1.5 B/px vs rgb8 3 B/px), via a
                 one-element fetch of the uploaded buffer (the only
                 real fence on this runtime)
  downlink       time to fetch a unit's packed masks (d=1 and d=2
                 sizes) and the per-group diag scalars
  host producer  resize + pack_yuv420 for one 30-image batch (the
                 producer-thread work per dispatch)

Unit = the bench unit: 5 groups x 30 images @224².  Paste the table
into docs/label_profile.md §5.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/label_wire_probe.py
"""

import time

import numpy as np

B, HW = 30, (224, 224)
GROUPS = 5
N_REPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from spalign_tpu.data.synthetic import SyntheticRoadScenes
    from spalign_tpu.pipeline.wire import pack_yuv420

    from tools._probe import rtt  # shared tunnel probe (one impl)

    r = rtt()
    print(f"rtt {r * 1e3:.0f} ms", flush=True)

    ds = SyntheticRoadScenes(n=B, full_shape=(512, 1024), seed=7)
    frames, _ = ds.resized_batch(range(B), HW)  # (B, 224, 224, 3) u8

    def time_upload(arr, label):
        # vary the payload per rep (the runtime memoizes identical
        # inputs); fence by fetching ONE element of the device buffer
        best = float("inf")
        for i in range(N_REPS):
            a = arr.copy()
            a.ravel()[i] ^= 1  # cheap variation
            t0 = time.time()
            d = jnp.asarray(a)
            np.asarray(d.ravel()[0])
            best = min(best, time.time() - t0)
        mb = arr.nbytes / 1e6
        eff = mb / max(best - r, 1e-9)
        print(f"uplink  {label:<28} {mb:7.2f} MB  best {best * 1e3:7.0f} ms"
              f"  ({eff:5.1f} MB/s net of rtt)", flush=True)
        return best

    def time_download(shape, dtype, label):
        # build the buffer ON DEVICE from a varied seed, then fetch it
        n = int(np.prod(shape))
        f = jax.jit(lambda s: (jax.random.bits(
            jax.random.key(s), (n,), jnp.uint32) & 0xFF).astype(
            jnp.uint8).reshape(shape))
        best = float("inf")
        for i in range(N_REPS):
            d = f(jnp.uint32(i))
            np.asarray(d.ravel()[0])  # land execution first
            t0 = time.time()
            np.asarray(d)
            best = min(best, time.time() - t0)
        mb = n / 1e6
        eff = mb / max(best - r, 1e-9)
        print(f"downlink {label:<27} {mb:7.2f} MB  best {best * 1e3:7.0f} ms"
              f"  ({eff:5.1f} MB/s net of rtt)", flush=True)
        return best

    # --- host producer work, per 30-image batch
    best_resize, best_pack = float("inf"), float("inf")
    for _ in range(N_REPS):
        t0 = time.time()
        fr, _ = ds.resized_batch(range(B), HW)
        best_resize = min(best_resize, time.time() - t0)
        t0 = time.time()
        packed = pack_yuv420(fr)
        best_pack = min(best_pack, time.time() - t0)
    print(f"host    resize 30-batch              best "
          f"{best_resize * 1e3:7.0f} ms", flush=True)
    print(f"host    pack_yuv420 30-batch         best "
          f"{best_pack * 1e3:7.0f} ms", flush=True)

    # --- uplink per batch (the pipeline uploads per 30-image batch)
    rgb = np.ascontiguousarray(frames)
    yuv = pack_yuv420(rgb)
    t_yuv = time_upload(yuv, "yuv420 30-batch (1.5 B/px)")
    t_rgb = time_upload(rgb, "rgb8   30-batch (3 B/px)")

    # --- downlink per unit: bit-packed masks for 150 imgs
    t_d1 = time_download((GROUPS * B, HW[0], HW[1] // 8), np.uint8,
                         "packed masks d=1 (150 imgs)")
    t_d2 = time_download((GROUPS * B, HW[0] // 2, HW[1] // 16), np.uint8,
                         "packed masks d=2 (150 imgs)")
    t_diag = time_download((GROUPS, 3), np.uint8, "diag scalars")

    # --- budget arithmetic
    print("\n=== unit budget (5x30 imgs) ===")
    up_unit = t_yuv * GROUPS
    print(f"uplink  yuv420: {up_unit * 1e3:6.0f} ms/unit "
          f"({150 / up_unit:5.0f} img/s uplink-bound)")
    print(f"downlink d=1:   {t_d1 * 1e3:6.0f} ms/unit; "
          f"d=2: {t_d2 * 1e3:6.0f} ms/unit (rides fetcher thread)")
    print(f"host producer:  {(best_resize + best_pack) * GROUPS * 1e3:6.0f}"
          f" ms/unit (overlaps device via producer thread)")
    print("device (label_stage_probe): 169 ms/unit d=1 / 95 ms d=2")


if __name__ == "__main__":
    main()
