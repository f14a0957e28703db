"""Connected-component labeling + small-fragment absorption, on device.

The skimage-parity post-pass for SLIC (split non-contiguous label
regions, absorb fragments below min_size) is sequential union-find on
the host (native/felzenszwalb.cpp).  That costs a device->host->device
round trip per batch in the middle of the pipeline.  This module keeps
it on device:

  1. connected components by min-index propagation: every pixel starts
     as its own component (its flat index); iterate {4-neighbor min
     within the same input label} + {pointer jumping comp <- comp[comp]}
     — pointer jumping makes convergence logarithmic in the component
     diameter;
  2. compact ids by sorting the root array (rank of first occurrence);
  3. fragment absorption: components smaller than min_size adopt the
     smallest-id adjacent component, repeated a few sweeps so chains of
     fragments collapse;
  4. final contiguous relabel.

Differences from the host op (documented): absorption picks the
lowest-id neighbor rather than the largest; tie cases produce slightly
different (still valid) partitions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2 ** 30)


def _neighbor_min(comp, lab):
    """Min component id among the 4-neighbors sharing the input label."""
    out = comp

    def take(shifted_comp, shifted_lab, pad_spec):
        same = shifted_lab == lab
        return jnp.where(same, shifted_comp, _BIG)

    up_c = jnp.pad(comp[1:], ((0, 1), (0, 0)), constant_values=_BIG)
    up_l = jnp.pad(lab[1:], ((0, 1), (0, 0)), constant_values=-1)
    down_c = jnp.pad(comp[:-1], ((1, 0), (0, 0)), constant_values=_BIG)
    down_l = jnp.pad(lab[:-1], ((1, 0), (0, 0)), constant_values=-1)
    left_c = jnp.pad(comp[:, 1:], ((0, 0), (0, 1)), constant_values=_BIG)
    left_l = jnp.pad(lab[:, 1:], ((0, 0), (0, 1)), constant_values=-1)
    right_c = jnp.pad(comp[:, :-1], ((0, 0), (1, 0)), constant_values=_BIG)
    right_l = jnp.pad(lab[:, :-1], ((0, 0), (1, 0)), constant_values=-1)

    out = jnp.minimum(out, take(up_c, up_l, None))
    out = jnp.minimum(out, take(down_c, down_l, None))
    out = jnp.minimum(out, take(left_c, left_l, None))
    out = jnp.minimum(out, take(right_c, right_l, None))
    return out


def _components(lab, n_iter):
    """(H, W) labels -> (H, W) component root ids (flat pixel indices)."""
    h, w = lab.shape
    comp = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w \
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def body(_, comp):
        comp = _neighbor_min(comp, lab)
        flat = comp.reshape(-1)
        flat = jnp.minimum(flat, flat[flat])  # pointer jump
        flat = jnp.minimum(flat, flat[flat])
        return flat.reshape(h, w)

    return jax.lax.fori_loop(0, n_iter, body, comp)


def _compact_ids(roots_flat):
    """Root pixel-ids -> contiguous component ids ordered by root value
    (= first raster occurrence).  Returns (ids_flat, n_components)."""
    n = roots_flat.shape[0]
    order = jnp.argsort(roots_flat)
    sorted_roots = roots_flat[order]
    first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (sorted_roots[1:] != sorted_roots[:-1]).astype(jnp.int32)])
    ranks = jnp.cumsum(first) - 1  # compact id per sorted position
    ids = jnp.zeros((n,), jnp.int32).at[order].set(ranks)
    return ids, ranks[-1] + 1


@partial(jax.jit, static_argnames=("min_size", "n_iter", "n_absorb",
                                   "max_components"))
def enforce_connectivity_device(labels: jnp.ndarray, min_size: int = 1,
                                n_iter: int = 16, n_absorb: int = 3,
                                max_components: int = 1 << 15):
    """(B, H, W) or (H, W) int32 label maps -> connectivity-enforced,
    min_size-absorbed, contiguous (per image) label maps, fully on
    device."""
    single = labels.ndim == 2
    if single:
        labels = labels[None]

    def one(lab):
        h, w = lab.shape
        n = h * w
        roots = _components(lab, n_iter).reshape(-1)
        ids, _ = _compact_ids(roots)

        for _ in range(n_absorb if min_size > 1 else 0):
            sizes = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), ids,
                                        num_segments=max_components)
            px_size = sizes[ids]
            id2d = ids.reshape(h, w)
            size2d = px_size.reshape(h, w)
            # per pixel: smallest adjacent id belonging to a LARGE comp
            cand = jnp.full((h, w), _BIG, jnp.int32)

            def nb(c_sh, s_sh):
                ok = (s_sh >= min_size)
                return jnp.where(ok, c_sh, _BIG)

            up = (jnp.pad(id2d[1:], ((0, 1), (0, 0)),
                          constant_values=_BIG),
                  jnp.pad(size2d[1:], ((0, 1), (0, 0))))
            down = (jnp.pad(id2d[:-1], ((1, 0), (0, 0)),
                            constant_values=_BIG),
                    jnp.pad(size2d[:-1], ((1, 0), (0, 0))))
            left = (jnp.pad(id2d[:, 1:], ((0, 0), (0, 1)),
                            constant_values=_BIG),
                    jnp.pad(size2d[:, 1:], ((0, 0), (0, 1))))
            right = (jnp.pad(id2d[:, :-1], ((0, 0), (1, 0)),
                             constant_values=_BIG),
                     jnp.pad(size2d[:, :-1], ((0, 0), (1, 0))))
            for c_sh, s_sh in (up, down, left, right):
                cand = jnp.minimum(cand, nb(c_sh, s_sh))

            # adopt: per small component, min candidate over its pixels
            comp_cand = jax.ops.segment_min(
                cand.reshape(-1), ids, num_segments=max_components)
            small = sizes < min_size
            adopt = small & (comp_cand < _BIG)
            new_of = jnp.where(adopt, comp_cand,
                               jnp.arange(max_components, dtype=jnp.int32))
            ids = new_of[ids]

        ids, _ = _compact_ids(ids)
        return ids.reshape(h, w)

    out = jax.vmap(one)(labels)
    return out[0] if single else out
