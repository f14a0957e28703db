"""Fully-fused SLIC Lloyd loop as ONE Pallas TPU kernel.

The XLA formulation (kernels/slic.py) materializes (HW, K) float
temporaries — distances, window masks, one-hots — in HBM every sweep:
~40 MB per 224^2 image per iteration, ~400 MB for the standard 10-sweep
run.  This kernel keeps the WHOLE Lloyd loop on-chip:

  * pixels are packed feature-major as (8, HW): 5 distance features
    (L, a, b, y*ratio, x*ratio), raw (y, x) for the window test, and a
    validity/ones row — HW on the 128-lane axis, features on sublanes;
  * the grid is (n_iter + 1,); the pixel block uses a constant index
    map, so Pallas loads P into VMEM ONCE and revisits it every sweep;
  * distances ride the MXU as a (128, 8) x (8, T) contraction per pixel
    tile; |c|^2 is folded into the matmul through the pixels' ones-row
    (center row 7 carries -|c|^2 / 2, so d2 = -2 * dot) — no transposes
    on the hot path;
  * the argmin one-hot feeds a second MXU contraction
    (8, T) x (T, 128)-> per-center feature sums accumulated in VMEM
    scratch; the ones-row makes sums[7] the member count for free;
  * centers live in (8, 128) scratch and update on-chip; empty clusters
    keep their position (kernels/slic.py:_update semantics);
  * only the final (1, HW) int32 label row ever returns to HBM.

HBM traffic per image drops from ~400 MB to ~2 MB (P + labels).
Semantics match kernels/slic.py's loop: n_iter update sweeps, then one
final assignment with the updated centers; ties resolve to the lowest
center id.  Floating-point association differs (the XLA path adds
|p|^2, constant per pixel), so labels can differ on exact near-ties —
quality-equivalent, and gated by the structural SLIC tests.

Eligibility (slic.py auto-selects): K <= 128 centers and P fits VMEM
(HW <= ~200k, i.e. working resolutions; full-res 2MP stays on the XLA
path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # pixels per inner block: (128, 2048) f32 distance tile = 1 MB
K_PAD = 128
# P (8, hw_pad) f32 must fit VMEM alongside ~4 MB of distance-tile
# temporaries; 200k pixels * 32 B = 6.4 MB is a safe ceiling on 16 MB.
MAX_FUSED_PIXELS = 200_000


def _lloyd_kernel(P_ref, c0_ref, labels_ref, cent_ref, acc_ref, *,
                  k_real: int, window: float, n_blocks: int,
                  n_iter: int):
    it = pl.program_id(0)

    @pl.when(it == 0)
    def _init():
        cent_ref[:] = c0_ref[:]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    c = cent_ref[:]  # (8, 128) rows: L,a,b,y*r,x*r,y,x,unused
    # distance view of the centers: rows 0..4 kept, 5..6 zeroed, row 7 =
    # -|c|^2/2 so the pixels' ones-row folds |c|^2 into the matmul
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    cdist = jnp.where(row < 5, c, 0.0)
    c2 = jnp.sum(cdist * cdist, axis=0, keepdims=True)  # (1, 128)
    cdist = jnp.where(row == 7, -0.5 * c2, cdist)
    # center coords on the sublane axis for the window test
    cy = jnp.transpose(c[5:6, :])  # (128, 1)
    cx = jnp.transpose(c[6:7, :])
    kk = jax.lax.broadcasted_iota(jnp.int32, (K_PAD, 1), 0)
    kvalid = kk < k_real
    big = jnp.asarray(2 ** 30, jnp.int32)

    def block(b, _):
        off = pl.multiple_of(b * TILE, TILE)
        Pb = P_ref[:, pl.ds(off, TILE)]  # (8, T)
        # d2/(-2) = p.c - |c|^2/2 ; argmin(d2) == argmax(dot)
        dot = jax.lax.dot_general(
            cdist, Pb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (128, T)
        py = Pb[5:6, :]  # (1, T)
        px = Pb[6:7, :]
        in_win = ((jnp.abs(py - cy) <= window)
                  & (jnp.abs(px - cx) <= window) & kvalid)
        neg = jnp.asarray(-jnp.inf, jnp.float32)
        score = jnp.where(in_win, dot, neg)
        # no-center-in-window fallback: unmasked distance (cannot happen
        # on a regular grid; keeps the kernel total)
        any_win = jnp.any(in_win, axis=0, keepdims=True)  # (1, T)
        score = jnp.where(any_win, score, jnp.where(kvalid, dot, neg))
        smax = jnp.max(score, axis=0, keepdims=True)  # (1, T)
        lab = jnp.min(jnp.where(score >= smax, kk, big), axis=0,
                      keepdims=True)  # (1, T) lowest id wins ties
        labels_ref[:, pl.ds(off, TILE)] = lab
        onehot = (kk == lab).astype(jnp.float32)  # (128, T)
        acc_ref[:] += jax.lax.dot_general(
            Pb, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (8, 128)
        return 0

    jax.lax.fori_loop(0, n_blocks, block, 0)

    @pl.when(it < n_iter)
    def _update():
        acc = acc_ref[:]
        cnt = acc[7:8, :]  # ones-row sums = member counts (1, 128)
        mean = acc / jnp.maximum(cnt, 1.0)
        # rows 3,4 are sums of y*ratio, x*ratio -> means are already the
        # scaled coords; rows 5,6 the raw ones.  Row 7 becomes 1: unused.
        cent_ref[:] = jnp.where(cnt > 0.0, mean, cent_ref[:])


@partial(jax.jit, static_argnames=("k_real", "window", "n_iter",
                                   "interpret"))
def slic_lloyd_fused(P: jnp.ndarray, c0: jnp.ndarray, *, k_real: int,
                     window: float, n_iter: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Run the full SLIC Lloyd loop on-chip.

    P: (8, HW_pad) packed pixels (see pack_pixels_fused); HW_pad a
    multiple of TILE.  c0: (8, K_PAD) packed initial centers.
    Returns (HW_pad,) int32 labels from the final assignment.
    """
    hw_pad = P.shape[1]
    assert hw_pad % TILE == 0, hw_pad
    assert c0.shape == (8, K_PAD), c0.shape
    assert 0 < k_real <= K_PAD, k_real
    labels = pl.pallas_call(
        partial(_lloyd_kernel, k_real=k_real, window=float(window),
                n_blocks=hw_pad // TILE, n_iter=n_iter),
        grid=(n_iter + 1,),
        out_shape=jax.ShapeDtypeStruct((1, hw_pad), jnp.int32),
        in_specs=[
            pl.BlockSpec((8, hw_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, K_PAD), jnp.float32),  # centers
            pltpu.VMEM((8, K_PAD), jnp.float32),  # per-sweep sums
        ],
        interpret=interpret,
    )(P, c0)
    return labels.reshape(hw_pad)


def pack_pixels_fused(lab: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """(H, W, 3) CIELAB -> (8, HW_pad) f32 feature-major pixels.

    Rows: L, a, b, y*ratio, x*ratio, y, x, 1.  Padding columns are all
    zero: the ones-row excludes them from every center sum, and their
    labels are sliced away by the caller.
    """
    h, w, _ = lab.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(1, -1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(1, -1)
    flat = jnp.transpose(lab.reshape(-1, 3))  # (3, HW)
    P = jnp.concatenate([flat, yy * ratio, xx * ratio, yy, xx,
                         jnp.ones_like(yy)], axis=0)  # (8, HW)
    pad = (-P.shape[1]) % TILE
    if pad:
        P = jnp.pad(P, ((0, 0), (0, pad)))
    return P.astype(jnp.float32)


def pack_centers_fused(c_lab: jnp.ndarray, cy: jnp.ndarray,
                       cx: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """(K, 3) LAB samples + (K,) grid coords -> (8, K_PAD) centers."""
    k = c_lab.shape[0]
    rows = jnp.stack([c_lab[:, 0], c_lab[:, 1], c_lab[:, 2],
                      cy * ratio, cx * ratio, cy, cx,
                      jnp.zeros_like(cy)], axis=0)  # (8, K)
    if k < K_PAD:
        # padded centers sit far outside every window and are masked by
        # k_real; zero-count updates keep them parked
        rows = jnp.pad(rows, ((0, 0), (0, K_PAD - k)),
                       constant_values=-1e9)
    return rows.astype(jnp.float32)
