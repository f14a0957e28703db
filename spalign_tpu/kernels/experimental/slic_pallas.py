"""Pallas TPU kernel for the SLIC assignment step.

The XLA formulation (kernels/slic.py) materializes several (HW, K)
float temporaries per iteration (distances, window masks) — ~25 MB per
image per sweep of pure HBM traffic.  This kernel fuses the whole
assignment into one VMEM-resident pass per pixel tile:

    d2[t, k] = ||p_t - c_k||^2  (5 features: L, a, b, y*r, x*r)
    masked to the 2S x 2S window around each center, argmin over k

writing only the (HW,) labels back to HBM.  Distances ride the MXU as a
(T, 8) x (8, K) contraction; window masks and the argmin stay on the VPU.

Layout: pixels are packed as (HW, 8) rows [L, a, b, y*r, x*r, y, x, 0];
centers as (8, K_pad).  K is padded to a lane multiple (128); padded
centers are masked out of the argmin.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # pixels per grid step (8 x 256 output rows per block)
_OUT_W = 256


def _assign_kernel(pix_ref, cent_ref, out_ref, *, k_real: int,
                   window: float):
    a = pix_ref[:]  # (T, 8)
    c = cent_ref[:]  # (8, K)
    t, k = a.shape[0], c.shape[1]

    # rows 0..4 (L, a, b, y*r, x*r) participate in the distance
    mask_row = (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
                < 5).astype(jnp.float32)
    mask_col = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                < 5).astype(jnp.float32)
    ad = a * mask_row  # zero the unscaled y/x rows for the distance
    cd = c * mask_col

    # ||p||^2 broadcast along k via a ones-matmul (keeps everything MXU)
    ones = jnp.ones((8, k), jnp.float32)
    p2 = jnp.dot(ad * ad, ones, preferred_element_type=jnp.float32)
    cross = jnp.dot(ad, cd, preferred_element_type=jnp.float32)
    c2 = jnp.sum(cd * cd, axis=0, keepdims=True)  # (1, K)
    d2 = p2 - 2.0 * cross + c2  # (T, K)

    # window mask on the unscaled coordinates (rows 5=y, 6=x)
    y = jnp.broadcast_to(a[:, 5:6], (t, k))
    x = jnp.broadcast_to(a[:, 6:7], (t, k))
    cy = jnp.broadcast_to(c[5:6, :], (t, k))
    cx = jnp.broadcast_to(c[6:7, :], (t, k))
    in_win = (jnp.abs(y - cy) <= window) & (jnp.abs(x - cx) <= window)

    kk = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    valid = in_win & (kk < k_real)
    big = jnp.asarray(jnp.inf, jnp.float32)
    d2m = jnp.where(valid, d2, big)
    # fall back to the unmasked distance if no center is in the window
    # (cannot happen on a regular grid; keeps the kernel total)
    any_win = jnp.any(valid, axis=1, keepdims=True)
    d2f = jnp.where(any_win, d2m, jnp.where(kk < k_real, d2, big))

    # argmin via min + masked index-min (Mosaic lowers plain reductions;
    # lane-axis argmin does not legalize) — ties resolve to the lowest k,
    # matching argmin semantics
    dmin = jnp.min(d2f, axis=1, keepdims=True)
    idx = jnp.min(jnp.where(d2f <= dmin, kk, jnp.int32(2 ** 30)), axis=1)

    out_ref[:] = idx.astype(jnp.int32).reshape(t // _OUT_W, _OUT_W)


@partial(jax.jit, static_argnames=("k_real", "window", "interpret"))
def slic_assign_pallas(pix: jnp.ndarray, centers: jnp.ndarray,
                       k_real: int, window: float,
                       interpret: bool = False) -> jnp.ndarray:
    """pix: (HW, 8) packed pixels; centers: (8, K_pad) packed centers.

    Returns (HW,) int32 labels.  HW must be a multiple of TILE (pad
    upstream; SLIC images are fixed-size)."""
    hw = pix.shape[0]
    assert hw % TILE == 0, hw
    k_pad = centers.shape[1]
    rows_per_block = TILE // _OUT_W  # 8: satisfies the (8, 128) tiling
    grid = (hw // TILE,)
    out = pl.pallas_call(
        partial(_assign_kernel, k_real=k_real, window=window),
        out_shape=jax.ShapeDtypeStruct((hw // _OUT_W, _OUT_W), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_block, _OUT_W),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pix, centers)
    return out.reshape(hw)


def pack_pixels(lab: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """(H, W, 3) LAB -> (HW_pad, 8) rows [L,a,b,y*r,x*r,y,x,0]."""
    h, w, _ = lab.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    flat = lab.reshape(-1, 3)
    pix = jnp.concatenate([
        flat, (yy * ratio)[:, None], (xx * ratio)[:, None],
        yy[:, None], xx[:, None], jnp.zeros_like(yy)[:, None]], axis=-1)
    hw = pix.shape[0]
    pad = (-hw) % TILE
    if pad:
        # padded pixels: coordinates far outside every window; they get
        # arbitrary labels and are dropped on reshape
        filler = jnp.full((pad, 8), 1e9, pix.dtype)
        pix = jnp.concatenate([pix, filler], axis=0)
    return pix


def pack_centers(centers: jnp.ndarray, ratio: float,
                 k_pad: int) -> jnp.ndarray:
    """(K, 5) [L,a,b,y,x] -> (8, K_pad) packed/padded."""
    k = centers.shape[0]
    rows = jnp.concatenate([
        centers[:, :3],
        centers[:, 3:4] * ratio, centers[:, 4:5] * ratio,
        centers[:, 3:4], centers[:, 4:5],
        jnp.zeros((k, 1), centers.dtype)], axis=-1).T  # (8, K)
    if k_pad > k:
        rows = jnp.pad(rows, ((0, 0), (0, k_pad - k)),
                       constant_values=-1e9)
    return rows.astype(jnp.float32)
