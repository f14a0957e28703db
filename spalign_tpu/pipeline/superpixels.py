"""Superpixel frontend: one interface, two engines.

- 'felzenszwalb': native C++ host op (the reference's headline
  configuration, batch_spalign_kmeans.py:301-307; canonical hyperparams
  scale=300 sigma=0.8 min_size=20 from utils/create_val_labels.sh).
  Per-image host work fanned out over a thread pool while the TPU runs
  the feature extractor.
- 'slic': on-device XLA program (kernels/slic.py), vmapped over the
  batch; optional host connectivity pass for skimage parity.

Output convention: (B, H, W) int32 maps with per-image contiguous ids in
[0, n_superpixels[i]), plus the per-image counts — the padded-dense form
the rest of the pipeline consumes.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor  # felzenszwalb fan-out
from functools import lru_cache as _lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from spalign_tpu import native
from spalign_tpu.config import SuperpixelConfig
from spalign_tpu.kernels.slic import slic


@_lru_cache(maxsize=None)
def _batched_slic(n_segments: int, compactness: float, n_iter: int,
                  narrow: bool):
    """Module-cached jit program: one compile per SLIC configuration
    (a per-call jax.jit object would recompile every batch)."""
    return jax.jit(jax.vmap(lambda im: slic(
        im, n_segments=n_segments, compactness=compactness,
        n_iter=n_iter).astype(jnp.uint8 if narrow else jnp.int32)))


@_lru_cache(maxsize=None)
def batched_slic_device(n_segments: int, compactness: float,
                        n_iter: int):
    """Device-resident variant: int32 label maps that STAY on device
    (consumers like the overlaps refine never need them on host, so no
    downlink at all)."""
    return jax.jit(jax.vmap(lambda im: slic(
        im, n_segments=n_segments, compactness=compactness,
        n_iter=n_iter)))


@_lru_cache(maxsize=None)
def batched_slic_device_yuv(n_segments: int, compactness: float,
                            n_iter: int, hw: tuple):
    """``batched_slic_device`` consuming YUV420-packed batches
    (pipeline/wire.py): the overlaps mode uploads FULL-resolution
    images for its device superpixels — at 2 MP that upload IS the
    pipeline (~6 MB/img raw); the wire format halves it and the decode
    runs in-program before the RGB->LAB conversion."""
    from spalign_tpu.pipeline.wire import decode_yuv420

    return jax.jit(lambda packed: jax.vmap(lambda im: slic(
        im.astype(jnp.float32), n_segments=n_segments,
        compactness=compactness, n_iter=n_iter))(
        decode_yuv420(packed, hw)))


def _host_workers(cap: int = 8) -> int:
    """Thread count for host superpixel passes.  The native ops release
    the GIL, so threads scale on multi-core hosts — but MORE threads
    than cores actively hurts: on this 1-core box 8 threads measured
    504-541 ms/img of 2 MP felzenszwalb vs 460-478 single-threaded
    (cache/scheduler thrash), ~10% of the overlaps mode's entire
    budget."""
    return max(1, min(cap, os.cpu_count() or 1))


def _felzenszwalb_batch(images_hwc: np.ndarray, cfg: SuperpixelConfig,
                        workers: int = 0):
    workers = workers or _host_workers()
    def one(img):
        return native.felzenszwalb(
            img.astype(np.float32) / 255.0,
            scale=cfg.felzenszwalb_scale,
            sigma=cfg.felzenszwalb_sigma,
            min_size=cfg.felzenszwalb_min_size)

    if len(images_hwc) == 1:
        maps = [one(images_hwc[0])]
    else:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            maps = list(ex.map(one, images_hwc))
    return np.stack(maps)


def _slic_batch(images_hwc, cfg: SuperpixelConfig, device_images=None,
                workers: int = 0):
    """Device SLIC + host connectivity enforcement.

    Measured on this TPU v5e setup: the union-find post-pass costs ~1 ms
    per image in C++ but ~25 ms in a gather-based device formulation
    (kernels/experimental/ccl.py), so the host op wins; the
    pipeline hides this host work behind device compute of the next
    batch (LabelGeneratorBase prefetching)."""
    from spalign_tpu.kernels.slic import slic_grid_size

    src = device_images if device_images is not None \
        else jnp.asarray(images_hwc)
    h, w = src.shape[1:3]
    min_size = max(1, (h * w) // (cfg.n_slic_segments * 4))
    # ship labels down at the narrowest lossless width (the downlink
    # runs ~25 MB/s on remote-attached TPUs: int32 label maps cost 4x
    # what the uint8 cast does)
    narrow = slic_grid_size(h, w, cfg.n_slic_segments) < 2 ** 8
    f = _batched_slic(cfg.n_slic_segments, cfg.slic_compactness,
                      cfg.slic_iters, narrow)
    labels = np.asarray(jax.device_get(f(src))).astype(np.int32)
    if not cfg.slic_enforce_connectivity:
        # TPU-native mode: grid labels are contiguous [0, K) already
        return labels
    with ThreadPoolExecutor(max_workers=workers or _host_workers()) as ex:
        out = list(ex.map(
            lambda l: native.enforce_connectivity(l, min_size=min_size),
            labels))
    return np.stack(out)


def compute_superpixels(images_hwc, cfg: SuperpixelConfig,
                        device_images=None):
    """images_hwc: (B, H, W, 3) uint8/float RGB (host).

    device_images: optional already-uploaded copy of the same batch —
    the SLIC engine consumes it directly, avoiding a second transfer.

    Returns (superpixels (B, H, W) int32 contiguous per image,
             counts (B,) int32).
    """
    images_hwc = np.asarray(images_hwc)
    if cfg.method == "felzenszwalb":
        maps = _felzenszwalb_batch(images_hwc, cfg)
    elif cfg.method == "slic":
        maps = _slic_batch(images_hwc, cfg, device_images=device_images)
    else:
        raise ValueError(f"unknown superpixel method: {cfg.method!r}")
    counts = maps.max(axis=(1, 2)) + 1
    if counts.max() > cfg.max_superpixels:
        raise ValueError(
            f"image produced {counts.max()} superpixels > bound "
            f"{cfg.max_superpixels}; raise SuperpixelConfig.max_superpixels")
    return maps.astype(np.int32), counts.astype(np.int32)
