"""SLIC superpixels as an on-device XLA program.

The reference computes superpixels on the CPU with scikit-image's Cython
SLIC (reference batch_spalign_kmeans.py:308-311) — a host detour in the
middle of the GPU pipeline.  SLIC is a local k-means on a grid: fixed
iteration count, fixed shapes, distance computations that map onto the
TPU's vector/matrix units — so here it runs on device, inside the same
jit program as the feature extractor.

skimage-compatible conventions:
  * RGB inputs are converted to CIELAB (convert2lab=True default),
  * centers initialized on a regular grid,
  * distance D^2 = d_lab^2 + (d_xy / S)^2 * compactness^2 with
    S = sqrt(HW / K) the grid interval,
  * pixels only compete among centers within a 2S x 2S window — here
    expressed as a distance mask so the program stays dense/fixed-shape.

Strict connectivity (skimage's enforce_connectivity post-pass) is
sequential union-find; it stays a host post-op
(spalign_tpu.native.enforce_connectivity) applied outside the jit
program when requested.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB (0..1, (..., 3)) -> CIELAB (D65), standard colorimetry."""
    rgb = jnp.clip(rgb, 0.0, 1.0)
    lin = jnp.where(rgb > 0.04045,
                    ((rgb + 0.055) / 1.055) ** 2.4,
                    rgb / 12.92)
    r, g, b = lin[..., 0], lin[..., 1], lin[..., 2]
    # sRGB D65 matrix
    x = 0.412453 * r + 0.357580 * g + 0.180423 * b
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    # normalize by white point
    xn, yn, zn = 0.950456, 1.0, 1.088754
    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t),
                         7.787 * t + 16.0 / 116.0)
    fx, fy, fz = f(x / xn), f(y / yn), f(z / zn)
    L = jnp.where(y / yn > 0.008856, 116.0 * fy - 16.0, 903.3 * y / yn)
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)
    return jnp.stack([L, a, bb], axis=-1)


def _init_centers(h: int, w: int, n_segments: int):
    """Regular-grid center positions (static, python-time).

    Returns (centers_yx (gy*gx, 2) row-major, step, gy, gx) — the grid
    dims travel WITH the centers so consumers (the own-cell fallback,
    the cell-windowed variant) cannot desynchronize from this rounding.
    """
    import numpy as np

    step = (h * w / n_segments) ** 0.5
    gy = max(1, int(round(h / step)))
    gx = max(1, int(round(w / step)))
    ys = (np.arange(gy) + 0.5) * (h / gy)
    xs = (np.arange(gx) + 0.5) * (w / gx)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return (np.stack([yy.ravel(), xx.ravel()], axis=-1).astype("float32"),
            step, gy, gx)


def slic_grid_size(h: int, w: int, n_segments: int) -> int:
    """The EXACT number of superpixels :func:`slic` produces for an
    (h, w) image — the regular-grid center count (close to n_segments).
    Static, so fused pipelines can size their padded shapes to it."""
    return _init_centers(h, w, n_segments)[0].shape[0]


def _use_pallas_default() -> bool:
    # Measured on TPU v5e: XLA fuses the masked-distance + argmin pattern
    # into ~2 ms/img, while the Pallas variant pays per-block dispatch
    # overheads (13 ms/img).  The kernel is demoted to
    # kernels/experimental/ (see its __init__ for the numbers) and is
    # opt-in only.  (The fully-fused Lloyd kernel — kernels/slic_fused —
    # is a different design and IS the default where eligible.)
    return False


def _fused_eligible(h: int, w: int, k: int) -> bool:
    # Measured on TPU v5e (tools/label_probe shapes, 150x224^2 k=100):
    # the whole-loop kernel runs 184 ms vs 110 ms for the XLA loop —
    # its skinny matmuls (contraction-8 distance dots, (8, 128)-output
    # update dots) are MXU-latency-bound.  Off by default until a
    # VPU-distance formulation beats the XLA loop; opt in with
    # slic(..., use_fused=True).
    del h, w, k
    return False


@partial(jax.jit, static_argnames=("n_segments", "compactness", "n_iter",
                                   "use_pallas", "use_fused",
                                   "use_cellwin"))
def slic(image: jnp.ndarray, n_segments: int = 100,
         compactness: float = 10.0, n_iter: int = 10,
         use_pallas: bool | None = None,
         use_fused: bool | None = None,
         use_cellwin: bool | None = None) -> jnp.ndarray:
    """SLIC superpixels of one (H, W, 3) image (values 0..255).

    Returns an (H, W) int32 label map with ids in [0, K) where K is the
    actual grid size (close to n_segments).  Labels are NOT guaranteed
    4-connected; call native.enforce_connectivity for strict parity.

    use_cellwin: cell-windowed Lloyd (opt-in; measured SLOWER than the
    dense sweep on TPU v5e — see the gate below) — pixels are blocked
    by grid cell and compete only among the 5x5 neighboring cells'
    centers, materializing (HW, 25) distances instead of (HW, K).
    Same masked-window semantics; see _slic_cellwin.
    use_fused: run the whole Lloyd loop as one Pallas kernel
    (kernels/slic_fused.py) — default on TPU when K <= 128 and the
    packed pixels fit VMEM; ~50x less HBM traffic than the XLA loop.
    use_pallas: fuse only the assignment step into the experimental
    Pallas kernel (kernels/experimental/slic_pallas.py) — opt-in; the
    XLA path measured faster (see kernels/experimental/__init__.py).
"""
    h, w, _ = image.shape
    centers_yx_np, step, gy, gx = _init_centers(h, w, n_segments)
    k = centers_yx_np.shape[0]

    img01 = image.astype(jnp.float32) / 255.0
    lab = rgb_to_lab(img01)  # (H, W, 3)

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    # feature per pixel: (L, a, b, y, x)
    pix = jnp.concatenate(
        [lab.reshape(-1, 3),
         jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)], axis=-1)

    # initial centers: sample LAB at grid positions
    cy = jnp.asarray(centers_yx_np[:, 0])
    cx = jnp.asarray(centers_yx_np[:, 1])
    c_lab = lab[jnp.clip(cy.astype(jnp.int32), 0, h - 1),
                jnp.clip(cx.astype(jnp.int32), 0, w - 1)]
    centers = jnp.concatenate([c_lab, jnp.stack([cy, cx], axis=-1)],
                              axis=-1)  # (K, 5)

    ratio2 = (compactness / step) ** 2
    scale = jnp.asarray([1.0, 1.0, 1.0, ratio2 ** 0.5, ratio2 ** 0.5],
                        jnp.float32)

    if use_fused is None:
        use_fused = not use_pallas and _fused_eligible(h, w, k)
    if use_fused:
        from spalign_tpu.kernels.slic_fused import (pack_centers_fused,
                                                    pack_pixels_fused,
                                                    slic_lloyd_fused)

        ratio = float(ratio2 ** 0.5)
        P = pack_pixels_fused(lab, ratio)
        c0 = pack_centers_fused(c_lab, cy, cx, ratio)
        labels = slic_lloyd_fused(P, c0, k_real=k,
                                  window=float(2.0 * step),
                                  n_iter=n_iter)
        return labels[: h * w].reshape(h, w)

    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from spalign_tpu.kernels.experimental.slic_pallas import (pack_centers,
                                                     pack_pixels,
                                                     slic_assign_pallas)

        ratio = float(ratio2 ** 0.5)
        k_pad = -(-k // 128) * 128
        pix8 = pack_pixels(lab, ratio)

        def assign(centers):
            c8 = pack_centers(centers, ratio, k_pad)
            labels = slic_assign_pallas(pix8, c8, k_real=k,
                                        window=float(2.0 * step))
            return labels[: h * w]

        def body(_, carry):
            return _update(pix, assign(carry), carry, k, h * w)

        centers = jax.lax.fori_loop(0, n_iter, body, centers)
        return assign(centers).reshape(h, w)

    if use_cellwin is None:
        # Measured on TPU v5e at the bench unit shape (150 x 224^2,
        # K=100, 10 iters): dense 109 ms vs cell-windowed 228 ms
        # (einsum distances) / 205 ms (pure-broadcast distances).  The
        # traffic arithmetic favored the window (25 vs 100 candidate
        # columns) but the blocked (gy, gx, P, 25) layout defeats XLA's
        # fusion of the one big matmul + mask + argmin sweep the dense
        # form gets.  Dense stays the default; the windowed path is
        # kept opt-in with an agreement test.  (On TPU the two differ
        # at region boundaries: the dense distance matmul executes in
        # bf16 on the MXU, the windowed broadcasts in exact f32.)
        use_cellwin = False
    if use_cellwin and (gy < 5 or gx < 5 or h / gy < step - 1e-6
                        or w / gx < step - 1e-6):
        # the 5x5 candidate window provably covers the dense rule only
        # when cells are at least `step` wide (a 2*step window then
        # spans <= 2 cells); grid rounding can make cells smaller, and
        # thin grids have no real window to exploit — use dense
        use_cellwin = False
    if use_cellwin:
        return _slic_cellwin(lab, centers, gy, gx, k, step, scale,
                             n_iter).reshape(h, w)

    # (bf16-packing the sweep's pixel features was tried and measured
    # NOTHING — 88.0 vs 88.1 ms/unit — because the distance matmul
    # already executes as one bf16 MXU pass on f32 inputs; the win that
    # experiment appeared to show was actually the fallback fix below.)
    # static own-cell id per pixel: the no-center-in-window fallback
    # target.  The PREVIOUS fallback re-read the unmasked d2_raw, which
    # kept a second (HW, K) tensor alive across the masked argmin and
    # blocked XLA from fusing the whole sweep into one pass — measured
    # 110 -> 84 ms/unit (150 x 224^2, K=100) from this change alone.
    # The fallback itself cannot fire on a regular grid (every pixel's
    # own-cell center starts within step/2); if centers ever drifted
    # that far, the own-cell id is the sane answer anyway.
    own_i = jnp.clip((yy * gy / h).astype(jnp.int32), 0, gy - 1)
    own_j = jnp.clip((xx * gx / w).astype(jnp.int32), 0, gx - 1)
    own_cell = (own_i * gx + own_j).reshape(-1)

    def assign(centers):
        ps = pix * scale[None, :]
        cs = centers * scale[None, :]
        d2 = (jnp.sum(ps * ps, -1, keepdims=True)
              - 2.0 * ps @ cs.T
              + jnp.sum(cs * cs, -1)[None, :])
        # window mask: only centers within 2*step in y and x compete
        dy = jnp.abs(pix[:, 3:4] - centers[None, :, 3])
        dx = jnp.abs(pix[:, 4:5] - centers[None, :, 4])
        in_win = (dy <= 2.0 * step) & (dx <= 2.0 * step)
        sel = jnp.argmin(jnp.where(in_win, d2, jnp.inf), axis=-1)
        return jnp.where(jnp.any(in_win, axis=1), sel,
                         own_cell).astype(jnp.int32)

    def body(_, carry):
        return _update(pix, assign(carry), carry, k, h * w)

    centers = jax.lax.fori_loop(0, n_iter, body, centers)
    labels = assign(centers)
    return labels.reshape(h, w)


def _slic_cellwin(lab, centers0, gy, gx, k, step, scale, n_iter):
    """Cell-windowed SLIC Lloyd: identical masked-window semantics to
    the dense sweep, restricted to the 25 candidate centers of the 5x5
    grid-cell neighborhood.

    Correctness: the dense sweep masks to centers whose CURRENT position
    is within the 2*step Chebyshev window of the pixel.  A center
    reaching pixel p therefore sits within ~2 cells of p, and SLIC
    centers stay near their origin cell (each update averages pixels
    from the <=2*step window), so every center that could win under the
    dense rule is inside p's 5x5 initial-cell neighborhood.  The same
    current-position window mask is applied to the 25 candidates, so
    label maps match the dense program's.

    Why: the dense sweep's cost is HBM traffic — (HW, K) distance +
    one-hot tensors per iteration (~20 MB/img at 224^2, K=100); the
    windowed form materializes (HW, 25) instead, ~K/25 less.
    """
    h, w, _ = lab.shape
    ch, cw = -(-h // gy), -(-w // gx)  # cell size, image padded to fit
    hp, wp = gy * ch, gx * cw
    yy = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 1)
    lab_p = jnp.pad(lab, ((0, hp - h), (0, wp - w), (0, 0)))
    pix = jnp.concatenate([lab_p, yy[..., None], xx[..., None]], -1)
    valid = ((yy < h) & (xx < w))  # padding pixels: excluded everywhere
    # (gy, gx, P, 5) cell blocks, P = ch*cw
    cells = pix.reshape(gy, ch, gx, cw, 5).transpose(0, 2, 1, 3, 4)
    cells = cells.reshape(gy, gx, ch * cw, 5)
    vcell = valid.reshape(gy, ch, gx, cw).transpose(0, 2, 1, 3).reshape(
        gy, gx, ch * cw)

    # static candidate-id table: cell (i,j) -> the 25 center ids of its
    # 5x5 neighborhood (-1 out of grid)
    import numpy as np

    ids = np.full((gy + 4, gx + 4), -1, np.int32)
    ids[2:-2, 2:-2] = np.arange(gy * gx, dtype=np.int32).reshape(gy, gx)
    cand_ids = np.stack([ids[2 + di:2 + di + gy, 2 + dj:2 + dj + gx]
                         for di in (-2, -1, 0, 1, 2)
                         for dj in (-2, -1, 0, 1, 2)],
                        axis=-1)  # (gy, gx, 25)
    cand_ids_j = jnp.asarray(cand_ids)
    cand_ok = cand_ids_j >= 0  # (gy, gx, 25)

    ps = cells * scale[None, None, None, :]

    def windows(grid):
        """(gy+4, gx+4, D) padded grid -> (gy, gx, 25, D) shifted views."""
        return jnp.stack([grid[2 + di:2 + di + gy, 2 + dj:2 + dj + gx]
                          for di in (-2, -1, 0, 1, 2)
                          for dj in (-2, -1, 0, 1, 2)], axis=2)

    def assign25(centers):
        cgrid = jnp.pad(centers.reshape(gy, gx, 5),
                        ((2, 2), (2, 2), (0, 0)))
        cand = windows(cgrid)  # (gy, gx, 25, 5)
        cs = cand * scale[None, None, None, :]
        # (gy, gx, P, 25) distances as PURE broadcasts (an einsum here
        # decomposes into 15k MXU-tile-padded tiny matmuls, measured 2x
        # slower than even the dense sweep): 5 fused multiply-adds that
        # XLA folds into the argmin's producer loop
        d2 = sum((ps[..., :, None, d] - cs[..., None, :, d]) ** 2
                 for d in range(5))
        dy = jnp.abs(cells[..., 3][..., None] - cand[..., 3][:, :, None, :])
        dx = jnp.abs(cells[..., 4][..., None] - cand[..., 4][:, :, None, :])
        in_win = ((dy <= 2.0 * step) & (dx <= 2.0 * step)
                  & cand_ok[:, :, None, :])
        d2 = jnp.where(in_win, d2, jnp.inf)
        sel = jnp.argmin(d2, axis=-1)  # (gy, gx, P) in [0, 25)
        # safety net (mirrors the dense path's fallback): a pixel whose
        # window is empty takes its OWN cell's center (index 12)
        sel = jnp.where(jnp.any(in_win, axis=-1), sel, 12)
        return sel

    def update25(sel, centers):
        onehot = ((sel[..., None] == jnp.arange(25)[None, None, None, :])
                  & vcell[..., None]).astype(jnp.float32)
        sums25 = jnp.einsum("abpk,abpd->abkd", onehot, cells,
                            preferred_element_type=jnp.float32)
        cnts25 = jnp.sum(onehot, axis=2)  # (gy, gx, 25)
        sums = jnp.zeros((gy + 4, gx + 4, 5), jnp.float32)
        cnts = jnp.zeros((gy + 4, gx + 4), jnp.float32)
        ki = 0
        for di in (-2, -1, 0, 1, 2):
            for dj in (-2, -1, 0, 1, 2):
                # cell (i,j)'s candidate ki is center (i+di, j+dj)
                sums = sums.at[2 + di:2 + di + gy,
                               2 + dj:2 + dj + gx].add(sums25[:, :, ki])
                cnts = cnts.at[2 + di:2 + di + gy,
                               2 + dj:2 + dj + gx].add(cnts25[:, :, ki])
                ki += 1
        sums = sums[2:-2, 2:-2].reshape(k, 5)
        cnts = cnts[2:-2, 2:-2].reshape(k)
        return jnp.where(cnts[:, None] > 0,
                         sums / jnp.maximum(cnts[:, None], 1.0), centers)

    def body(_, centers):
        return update25(assign25(centers), centers)

    centers = jax.lax.fori_loop(0, n_iter, body, centers0)
    sel = assign25(centers)  # (gy, gx, P)
    labels25 = jnp.take_along_axis(
        jnp.broadcast_to(cand_ids_j[:, :, None, :],
                         (gy, gx, ch * cw, 25)),
        sel[..., None], axis=-1)[..., 0]
    lab_map = labels25.reshape(gy, gx, ch, cw).transpose(0, 2, 1, 3)
    lab_map = lab_map.reshape(hp, wp)[:h, :w]
    return lab_map.astype(jnp.int32)


def _update(pix, labels, centers, k, n):
    """Segment-mean center update; empty clusters keep their CURRENT
    position.

    One-hot MATMUL instead of segment_sum: scatter-add lowers to a
    serialized scatter on TPU (~10 ms/img/sweep); the (HW, K) x (HW, 5)
    contraction rides the MXU and fuses with the assignment step
    (measured 10x on the 30-image fused batch: 300 -> 30 ms)."""
    onehot = (labels[:, None] == jnp.arange(k)[None, :]).astype(
        jnp.float32)  # (HW, K)
    sums = jnp.einsum("nk,nd->kd", onehot, pix,
                      preferred_element_type=jnp.float32)
    cnts = jnp.sum(onehot, axis=0)
    return jnp.where(cnts[:, None] > 0,
                     sums / jnp.maximum(cnts[:, None], 1.0), centers)
