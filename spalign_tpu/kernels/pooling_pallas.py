"""Pallas TPU kernels for SegNet's 2x2 argmax pool / index unpool.

Reference semantics: models/segnet_basic.py:48-76 (Chainer
F.MaxPooling2D(2, 2) with stored indexes + F.upsampling_2d).

** MEASURED SLOWER THAN THE XLA FORM — kept as the documented
experiment, gated off by default (ops/pooling.py POOL_IMPL). **
tools/pool_pallas_probe.py, real TPU, FULL SegNetBasic train step
(B=8 512x1024), interleaved A/B in one process: f32 345 vs 337
ms/step, bf16 261 vs 240.  The isolated pool family probes at ~65 ms
of the step, which made streaming kernels look attractive — but under
jit XLA FUSES ops/pooling.py's reshape-native form into the adjacent
BN/relu/conv elementwise chains, so its marginal cost is far below its
isolated cost, and a custom call severs exactly those fusions (same
lesson as kernels/slic_fused.py: on this workload XLA's fusion beats
hand-scheduling).  The bf16 gap is wider because these kernels upcast
to f32 in-VMEM (Mosaic v5e rejects cmpf on packed bf16 vectors).

The design, for the record — streaming the computation at the NHWC
layout with every shape cast lane-legal:

  With C a multiple of 64, FOUR HORIZONTAL PIXELS form one 4C-lane
  group (>= 2 full 128-lane tiles) of a (.., W/4, 4C) view — a pure
  reshape of the contiguous input.  The two 2x2 windows inside a group
  reduce via lane-subrange max/select, results concatenate back to a
  2C-lane (128-multiple) minor dim, and every shape cast keeps the
  minor dimension a multiple of 128 (Mosaic rejects merges of
  sub-128-lane minors — measured, not theoretical).

Three streaming kernels cover the train step:
  pool   : x -> (pooled, idx)        [forward]
  scatter: (g_pooled, idx) -> dx     [pool backward == unpool forward]
  gather : (g_out, idx) -> dx        [unpool backward]
(the scatter kernel IS index-unpooling, so pool-bwd and unpool-fwd share
one implementation; Chainer's tie rule — first max in (dy, dx) window
order — is preserved exactly, as is the route-to-argmax-only gradient.)

All kernels grid 2-D over the (N*H, W*C) flattening: row-pair blocks
x group-aligned column chunks (_tiles), sized so the block PLUS the
kernel's scoped-VMEM temporaries stay under the 16 MB stack limit.
Eligibility: even H, W % 4 == 0, C % 64 == 0, f32/bf16.
ops/pooling.py dispatches here only under SPALIGN_POOL_IMPL=pallas.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# f32-counted bytes of the BIG-side (unpooled) block per grid step.
# Mosaic allocates the kernel's temporaries (the f32 upcast copy, the
# window slices, the concats) on the scoped-VMEM stack alongside the
# double-buffered blocks: a (16, 65536) f32 block measured ~22.5 MB of
# scoped VMEM against the 16 MB limit, so full rows of the train
# step's first level (W*C = 65536) must split into column chunks.
_BIG_BLOCK_BYTES = 3 * 512 * 1024


def _tiles(pairs: int, big_row_elems: int, group: int):
    """(row-pairs, big-side column elements) per grid step.

    Row-pairs stay a multiple of 8 (the pooled-side R-row blocks need
    8-sublane divisibility); columns split into `group`-aligned chunks
    (window groups never straddle a chunk, so blocks are independent)
    whenever a 16-row block of full rows would exceed the budget.  Both
    grid dims are cdiv-masked: tail blocks read garbage out of bounds
    and their stores are clipped, so results are exact."""
    if pairs < 8:  # tiny arrays (interpret-mode tests): single block
        return int(pairs), big_row_elems
    if 16 * big_row_elems * 4 <= _BIG_BLOCK_BYTES:
        r = (_BIG_BLOCK_BYTES // (big_row_elems * 8 * 8)) * 8
        return int(min(max(8, r), pairs)), big_row_elems
    g = max(1, _BIG_BLOCK_BYTES // (16 * 4 * group))
    return 8, int(min(g * group, big_row_elems))


def _pool_kernel(x_ref, pooled_ref, idx_ref, *, c: int):
    r2, wc = x_ref.shape  # (2R, W*C)
    r, w4 = r2 // 2, wc // (4 * c)
    # bf16 compute upcasts to f32: Mosaic v5e has no cmpf on packed
    # bf16 vectors, and bf16->f32 is exact so results stay bit-equal
    v = x_ref[...].astype(jnp.float32).reshape(r, 2, w4, 4 * c)
    top, bot = v[:, 0], v[:, 1]
    # window 0 = pixels (0, 1), window 1 = pixels (2, 3) of each group
    m00a, m01a = top[..., :c], top[..., c:2 * c]
    m10a, m11a = bot[..., :c], bot[..., c:2 * c]
    m00b, m01b = top[..., 2 * c:3 * c], top[..., 3 * c:]
    m10b, m11b = bot[..., 2 * c:3 * c], bot[..., 3 * c:]

    dt = v.dtype  # index math stays in the COMPUTE dtype (f32): mixing
    # an i8 select with a float-layout mask needs a mask relayout Mosaic
    # rejects; the int8 cast happens once, on the 2D lane-aligned result

    def win(m00, m01, m10, m11):
        mx = jnp.maximum(jnp.maximum(m00, m01), jnp.maximum(m10, m11))
        # Chainer tie rule: FIRST max in (dy, dx) window scan order
        idx = jnp.where(
            m00 == mx, jnp.zeros((), dt),
            jnp.where(m01 == mx, jnp.ones((), dt),
                      jnp.where(m10 == mx, jnp.full((), 2, dt),
                                jnp.full((), 3, dt))))
        return mx, idx

    mxa, ida = win(m00a, m01a, m10a, m11a)
    mxb, idb = win(m00b, m01b, m10b, m11b)
    # concat to a 2C-lane (128-multiple) minor, then merge — legal cast
    pooled_ref[...] = jnp.concatenate([mxa, mxb], axis=-1).reshape(
        r, w4 * 2 * c).astype(pooled_ref.dtype)
    idx_ref[...] = jnp.concatenate([ida, idb], axis=-1).reshape(
        r, w4 * 2 * c).astype(jnp.int8)


def _scatter_kernel(x_ref, idx_ref, out_ref, *, c: int):
    """(R, w*C) values + window codes -> (2R, 2w*C) zeros-elsewhere."""
    r, wc = x_ref.shape
    w2 = wc // (2 * c)  # pooled-pixel PAIRS per row
    # f32 compute (exact for routing): packed-bf16 cmpf is unsupported
    x = x_ref[...].astype(jnp.float32).reshape(r, w2, 2 * c)
    # codes to the compute dtype ONCE, on the 2D lane-aligned load (an
    # i8 compare feeding a float select needs a relayout Mosaic rejects)
    idx = idx_ref[...].astype(jnp.float32).reshape(r, w2, 2 * c)
    x0, x1 = x[..., :c], x[..., c:]
    i0, i1 = idx[..., :c], idx[..., c:]
    z = jnp.zeros_like(x0)

    def row(code_l, code_r):
        cl = jnp.full((), code_l, x.dtype)
        cr = jnp.full((), code_r, x.dtype)
        # 4 output px / group: [x0@l | x0@r | x1@l | x1@r]
        return jnp.concatenate(
            [jnp.where(i0 == cl, x0, z),
             jnp.where(i0 == cr, x0, z),
             jnp.where(i1 == cl, x1, z),
             jnp.where(i1 == cr, x1, z)], axis=-1)  # (r, w2, 4c)

    top = row(0, 1).reshape(r, w2 * 4 * c)
    bot = row(2, 3).reshape(r, w2 * 4 * c)
    # rows interleave top/bottom: (R, 2, 2w*C) -> (2R, 2w*C)
    out_ref[...] = jnp.stack([top, bot], axis=1).reshape(
        2 * r, w2 * 4 * c).astype(out_ref.dtype)


def _gather_kernel(g_ref, idx_ref, out_ref, *, c: int):
    """(2R, 2w*C) upstream grads + (R, w*C) codes -> (R, w*C) grads of
    the pooled tensor (the argmax element's grad only)."""
    r2, wc2 = g_ref.shape
    r, w2 = r2 // 2, wc2 // (4 * c)
    # f32 compute (exact for routing): packed-bf16 cmpf is unsupported
    g = g_ref[...].astype(jnp.float32).reshape(r, 2, w2, 4 * c)
    gt, gb = g[:, 0], g[:, 1]
    idx = idx_ref[...].astype(jnp.float32).reshape(r, w2, 2 * c)
    i0, i1 = idx[..., :c], idx[..., c:]
    dt = g.dtype

    def win(i, g00, g01, g10, g11):
        return jnp.where(i == jnp.zeros((), dt), g00,
                         jnp.where(i == jnp.ones((), dt), g01,
                                   jnp.where(i == jnp.full((), 2, dt),
                                             g10, g11)))

    o0 = win(i0, gt[..., :c], gt[..., c:2 * c],
             gb[..., :c], gb[..., c:2 * c])
    o1 = win(i1, gt[..., 2 * c:3 * c], gt[..., 3 * c:],
             gb[..., 2 * c:3 * c], gb[..., 3 * c:])
    out_ref[...] = jnp.concatenate([o0, o1], axis=-1).reshape(
        r, w2 * 2 * c).astype(out_ref.dtype)


def pallas_pool_eligible(shape, dtype) -> bool:
    if len(shape) != 4:
        return False
    _, h, w, ch = shape
    return (h % 2 == 0 and w % 4 == 0 and ch % 64 == 0
            and jnp.dtype(dtype) in (jnp.dtype(jnp.float32),
                                     jnp.dtype(jnp.bfloat16)))


@partial(jax.jit, static_argnames=("interpret",))
def pool2x2_pallas(x: jnp.ndarray, interpret: bool = False):
    """(N, H, W, C) -> (pooled (N, H/2, W/2, C), idx int8 in [0, 4))."""
    n, h, w, c = x.shape
    if h % 2 or w % 4 or c % 64:
        raise ValueError(f"pool2x2_pallas needs H%2==0, W%4==0, "
                         f"C%64==0; got {x.shape}")
    rows = n * h // 2
    r, cb = _tiles(rows, w * c, 4 * c)
    pooled, idx = pl.pallas_call(
        partial(_pool_kernel, c=c),
        grid=(pl.cdiv(rows, r), pl.cdiv(w * c, cb)),
        in_specs=[pl.BlockSpec((2 * r, cb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((r, cb // 2), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((r, cb // 2), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rows, w * c // 2), x.dtype),
                   jax.ShapeDtypeStruct((rows, w * c // 2), jnp.int8)),
        interpret=interpret,
    )(x.reshape(n * h, w * c))
    return (pooled.reshape(n, h // 2, w // 2, c),
            idx.reshape(n, h // 2, w // 2, c))


@partial(jax.jit, static_argnames=("interpret",))
def scatter2x2_pallas(x: jnp.ndarray, idx: jnp.ndarray,
                      interpret: bool = False):
    """(N, h, w, C) values to the idx positions of (N, 2h, 2w, C)."""
    n, h, w, c = x.shape
    if w % 2 or c % 64:
        raise ValueError(f"scatter2x2_pallas needs w%2==0, C%64==0; "
                         f"got {x.shape}")
    rows = n * h  # each input row becomes an output row-PAIR
    r, cb = _tiles(rows, 2 * w * c, 4 * c)
    out = pl.pallas_call(
        partial(_scatter_kernel, c=c),
        grid=(pl.cdiv(rows, r), pl.cdiv(2 * w * c, cb)),
        in_specs=[pl.BlockSpec((r, cb // 2), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((r, cb // 2), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * r, cb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * rows, 2 * w * c), x.dtype),
        interpret=interpret,
    )(x.reshape(rows, w * c), idx.reshape(rows, w * c))
    return out.reshape(n, 2 * h, 2 * w, c)


@partial(jax.jit, static_argnames=("interpret",))
def gather2x2_pallas(g: jnp.ndarray, idx: jnp.ndarray,
                     interpret: bool = False):
    """(N, 2h, 2w, C) grads -> (N, h, w, C): each output element takes
    the upstream grad at its recorded window position."""
    n, h2, w2, c = g.shape
    h, w = h2 // 2, w2 // 2
    if w2 % 4 or c % 64:
        raise ValueError(f"gather2x2_pallas needs W%4==0, C%64==0; "
                         f"got {g.shape}")
    rows = n * h
    r, cb = _tiles(rows, 2 * w * c, 4 * c)
    out = pl.pallas_call(
        partial(_gather_kernel, c=c),
        grid=(pl.cdiv(rows, r), pl.cdiv(2 * w * c, cb)),
        in_specs=[pl.BlockSpec((2 * r, cb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((r, cb // 2), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, cb // 2), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, w * c), g.dtype),
        interpret=interpret,
    )(g.reshape(n * h2, 2 * w * c), idx.reshape(rows, w * c))
    return out.reshape(n, h, w, c)


# ---- differentiable wrappers (Chainer's route-to-argmax semantics) ----

@jax.custom_vjp
def max_pool_argmax_2x2_pallas(x):
    return pool2x2_pallas(x)


def _pool_fwd(x):
    pooled, idx = pool2x2_pallas(x)
    return (pooled, idx), idx


def _pool_bwd(idx, g):
    g_pooled, _ = g  # idx (int8) gets no cotangent
    return (scatter2x2_pallas(g_pooled, idx),)


max_pool_argmax_2x2_pallas.defvjp(_pool_fwd, _pool_bwd)


@jax.custom_vjp
def max_unpool_2x2_pallas(x, idx):
    return scatter2x2_pallas(x, idx)


def _unpool_fwd(x, idx):
    return scatter2x2_pallas(x, idx), idx


def _unpool_bwd(idx, g):
    return (gather2x2_pallas(g, idx),
            np.zeros(idx.shape, jax.dtypes.float0))


max_unpool_2x2_pallas.defvjp(_unpool_fwd, _unpool_bwd)
