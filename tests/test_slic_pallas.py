"""Pallas SLIC assignment kernel vs the XLA reference (interpret mode on
the CPU mesh; the compiled path runs in bench.py on real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from spalign_tpu.kernels.slic import rgb_to_lab, _init_centers
from spalign_tpu.kernels.experimental.slic_pallas import (pack_centers, pack_pixels,
                                             slic_assign_pallas, TILE)


def xla_assign(pix, centers, step, ratio):
    scale = np.array([1, 1, 1, ratio, ratio], np.float32)
    ps = pix * scale
    cs = centers * scale
    d2 = ((ps[:, None, :] - cs[None, :, :]) ** 2).sum(-1)
    dy = np.abs(pix[:, 3:4] - centers[None, :, 3])
    dx = np.abs(pix[:, 4:5] - centers[None, :, 4])
    in_win = (dy <= 2 * step) & (dx <= 2 * step)
    d2 = np.where(in_win, d2, np.inf)
    d2 = np.where(in_win.any(1, keepdims=True), d2,
                  ((ps[:, None, :] - cs[None, :, :]) ** 2).sum(-1))
    return np.argmin(d2, axis=1).astype(np.int32)


def test_pallas_assignment_matches_xla(rng):
    h = w = 64  # HW = 4096 = 8 * TILE
    img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    lab = np.asarray(rgb_to_lab(jnp.asarray(img / 255.0)))
    centers_yx, step = _init_centers(h, w, 40)
    k = centers_yx.shape[0]
    c_lab = lab[np.clip(centers_yx[:, 0].astype(int), 0, h - 1),
                np.clip(centers_yx[:, 1].astype(int), 0, w - 1)]
    centers = np.concatenate([c_lab, centers_yx], axis=-1).astype(
        np.float32)

    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.concatenate([lab.reshape(-1, 3),
                          yy.reshape(-1, 1), xx.reshape(-1, 1)],
                         axis=-1).astype(np.float32)

    ratio = 10.0 / step
    want = xla_assign(pix, centers, step, ratio)

    k_pad = -(-k // 128) * 128
    pix8 = pack_pixels(jnp.asarray(lab), ratio)
    c8 = pack_centers(jnp.asarray(centers), ratio, k_pad)
    got = np.asarray(slic_assign_pallas(
        pix8, c8, k_real=k, window=float(2 * step), interpret=True))
    got = got[: h * w]

    # identical up to distance ties
    mismatch = got != want
    if mismatch.any():
        # allow only exact-tie mismatches
        scale = np.array([1, 1, 1, ratio, ratio], np.float32)
        ps = pix * scale
        cs = centers * scale
        d_got = ((ps[mismatch] - cs[got[mismatch]]) ** 2).sum(-1)
        d_want = ((ps[mismatch] - cs[want[mismatch]]) ** 2).sum(-1)
        np.testing.assert_allclose(d_got, d_want, rtol=1e-4, atol=1e-4)
    assert mismatch.mean() < 0.01


def test_padded_pixels_get_some_label(rng):
    """HW not multiple of TILE: padded rows must not crash and real rows
    keep valid labels in [0, k)."""
    h, w = 48, 56  # 2688 -> pad to 3072
    img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    lab = np.asarray(rgb_to_lab(jnp.asarray(img / 255.0)))
    centers_yx, step = _init_centers(h, w, 12)
    k = centers_yx.shape[0]
    c_lab = lab[np.clip(centers_yx[:, 0].astype(int), 0, h - 1),
                np.clip(centers_yx[:, 1].astype(int), 0, w - 1)]
    centers = np.concatenate([c_lab, centers_yx], -1).astype(np.float32)
    pix8 = pack_pixels(jnp.asarray(lab), 10.0 / step)
    assert pix8.shape[0] % TILE == 0
    c8 = pack_centers(jnp.asarray(centers), 10.0 / step, 128)
    got = np.asarray(slic_assign_pallas(pix8, c8, k_real=k,
                                        window=float(2 * step),
                                        interpret=True))
    assert (got[: h * w] >= 0).all() and (got[: h * w] < k).all()
