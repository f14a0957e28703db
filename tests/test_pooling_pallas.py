"""Pallas streaming pool/unpool kernels (kernels/pooling_pallas.py).

Must be BIT-equal to the XLA formulation in ops/pooling.py — same
Chainer tie rule (first max in window order, reference
models/segnet_basic.py:48-76) and same route-to-argmax-only gradient.
Run in interpreter mode on the CPU mesh; the compiled path is exercised
by the real-TPU benchmarks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spalign_tpu.kernels import pooling_pallas as pp
from spalign_tpu.ops.pooling import max_pool_argmax_2x2, max_unpool_2x2


@pytest.fixture
def x_ties(rng):
    x = rng.randn(2, 8, 12, 64).astype(np.float32)
    # exact ties are the norm after relu: zero out a band to create them
    x[np.abs(x) < 0.4] = 0.0
    return jnp.asarray(x)


class TestForward:
    def test_pool_matches_xla(self, x_ties):
        p_ref, i_ref = max_pool_argmax_2x2(x_ties)
        p_pal, i_pal = pp.pool2x2_pallas(x_ties, interpret=True)
        np.testing.assert_array_equal(np.asarray(p_ref),
                                      np.asarray(p_pal))
        np.testing.assert_array_equal(
            np.asarray(i_ref).astype(np.int8), np.asarray(i_pal))

    def test_unpool_matches_xla(self, x_ties, rng):
        _, idx = pp.pool2x2_pallas(x_ties, interpret=True)
        y = jnp.asarray(rng.randn(2, 4, 6, 64).astype(np.float32))
        u_ref = max_unpool_2x2(y, idx)
        u_pal = pp.scatter2x2_pallas(y, idx, interpret=True)
        np.testing.assert_array_equal(np.asarray(u_ref),
                                      np.asarray(u_pal))

    def test_bf16_and_c128(self, rng):
        x = jnp.asarray(rng.randn(1, 6, 12, 128)).astype(jnp.bfloat16)
        p_ref, i_ref = max_pool_argmax_2x2(x)
        p_pal, i_pal = pp.pool2x2_pallas(x, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(p_ref, np.float32), np.asarray(p_pal, np.float32))
        np.testing.assert_array_equal(
            np.asarray(i_ref).astype(np.int8), np.asarray(i_pal))

    def test_ragged_tail_rows(self, rng):
        """Row-pair count not divisible by the block height: the cdiv
        grid's masked tail must still produce exact results."""
        x = jnp.asarray(rng.randn(3, 10, 8, 64).astype(np.float32))
        p_ref, i_ref = max_pool_argmax_2x2(x)
        p_pal, i_pal = pp.pool2x2_pallas(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(p_ref),
                                      np.asarray(p_pal))
        np.testing.assert_array_equal(
            np.asarray(i_ref).astype(np.int8), np.asarray(i_pal))

    def test_column_blocking(self, rng, monkeypatch):
        """Rows longer than the VMEM budget split into group-aligned
        column chunks (incl. a ragged column tail); all three kernels
        must stay exact across chunk boundaries."""
        monkeypatch.setattr(pp, "_BIG_BLOCK_BYTES", 16 * 4 * 4 * 64)
        x = rng.randn(2, 16, 24, 64).astype(np.float32)
        x[np.abs(x) < 0.4] = 0.0
        x = jnp.asarray(x)
        r, cb = pp._tiles(16, 24 * 64, 4 * 64)
        assert cb < 24 * 64 and cb % (4 * 64) == 0  # blocking active
        p_ref, i_ref = max_pool_argmax_2x2(x)
        p_pal, i_pal = pp.pool2x2_pallas(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(p_ref),
                                      np.asarray(p_pal))
        np.testing.assert_array_equal(
            np.asarray(i_ref).astype(np.int8), np.asarray(i_pal))
        y = jnp.asarray(rng.randn(2, 8, 12, 64).astype(np.float32))
        u_ref = max_unpool_2x2(y, i_pal)
        u_pal = pp.scatter2x2_pallas(y, i_pal, interpret=True)
        np.testing.assert_array_equal(np.asarray(u_ref),
                                      np.asarray(u_pal))
        g = jnp.asarray(rng.randn(2, 16, 24, 64).astype(np.float32))
        g_ref = jax.vjp(lambda v: max_unpool_2x2(v, i_pal), y)[1](g)[0]
        g_pal = pp.gather2x2_pallas(g, i_pal, interpret=True)
        np.testing.assert_array_equal(np.asarray(g_ref),
                                      np.asarray(g_pal))


class TestGradients:
    def test_pool_bwd_routes_to_argmax_only(self, x_ties, rng):
        _, idx = pp.pool2x2_pallas(x_ties, interpret=True)
        w = jnp.asarray(rng.randn(2, 4, 6, 64).astype(np.float32))
        g_ref = jax.grad(
            lambda v: jnp.sum(max_pool_argmax_2x2(v)[0] * w))(x_ties)
        g_pal = pp.scatter2x2_pallas(w, idx, interpret=True)
        np.testing.assert_array_equal(np.asarray(g_ref),
                                      np.asarray(g_pal))

    def test_unpool_bwd_gathers_at_idx(self, x_ties, rng):
        _, idx = pp.pool2x2_pallas(x_ties, interpret=True)
        y = jnp.asarray(rng.randn(2, 4, 6, 64).astype(np.float32))
        g_up = jnp.asarray(rng.randn(2, 8, 12, 64).astype(np.float32))
        g_ref = jax.vjp(lambda v: max_unpool_2x2(v, idx), y)[1](g_up)[0]
        g_pal = pp.gather2x2_pallas(g_up, idx, interpret=True)
        np.testing.assert_array_equal(np.asarray(g_ref),
                                      np.asarray(g_pal))


class TestDispatch:
    def test_eligibility(self):
        f32 = jnp.float32
        assert pp.pallas_pool_eligible((2, 8, 12, 64), f32)
        assert pp.pallas_pool_eligible((2, 8, 12, 128), jnp.bfloat16)
        assert not pp.pallas_pool_eligible((2, 7, 12, 64), f32)  # odd H
        assert not pp.pallas_pool_eligible((2, 8, 10, 64), f32)  # W%4
        assert not pp.pallas_pool_eligible((2, 8, 12, 48), f32)  # C%64
        assert not pp.pallas_pool_eligible((2, 8, 12, 64), jnp.int32)
        assert not pp.pallas_pool_eligible((8, 12, 64), f32)

    def test_default_dispatch_is_xla(self, rng):
        """The Pallas kernels measured SLOWER in the full train step
        (module docstring); the dispatcher must default to the XLA
        form and only switch under SPALIGN_POOL_IMPL=pallas."""
        from spalign_tpu.ops import pooling

        assert not pooling._use_pallas((2, 8, 12, 64), jnp.float32)
        orig = pooling.POOL_IMPL
        try:
            pooling.POOL_IMPL = "pallas"
            assert pooling._use_pallas((2, 8, 12, 64), jnp.float32)
            assert not pooling._use_pallas((2, 8, 10, 64), jnp.float32)
        finally:
            pooling.POOL_IMPL = orig
