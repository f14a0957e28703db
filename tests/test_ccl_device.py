"""Device CCL (kernels/experimental/ccl.py) vs the native C++ reference op."""

import numpy as np
import jax.numpy as jnp

from spalign_tpu import native
from spalign_tpu.kernels.experimental.ccl import enforce_connectivity_device


def partition_equal(a, b):
    """Same partition up to renaming."""
    pa = set(zip(a.ravel().tolist(), b.ravel().tolist()))
    return (len(pa) == len({p[0] for p in pa})
            == len({p[1] for p in pa}))


class TestDeviceCCL:
    def test_splits_disconnected(self):
        lab = np.zeros((12, 12), np.int32)
        lab[:, 8:] = 1
        lab[5:7, 2:4] = 1  # island, same id as the right strip
        out = np.asarray(enforce_connectivity_device(
            jnp.asarray(lab), min_size=1))
        ref = native.enforce_connectivity(lab, min_size=1)
        assert out.max() == ref.max() == 2
        assert partition_equal(out, ref)
        # contiguous ids by first occurrence
        assert out[0, 0] == 0

    def test_absorbs_small(self):
        lab = np.zeros((12, 12), np.int32)
        lab[5, 5] = 1
        out = np.asarray(enforce_connectivity_device(
            jnp.asarray(lab), min_size=4))
        assert out.max() == 0

    def test_chain_of_fragments(self):
        """Adjacent small fragments collapse over absorb sweeps."""
        lab = np.zeros((8, 16), np.int32)
        lab[4, 4] = 1
        lab[4, 5] = 2
        lab[4, 6] = 3
        out = np.asarray(enforce_connectivity_device(
            jnp.asarray(lab), min_size=3))
        assert out.max() == 0

    def test_matches_native_on_random_maps(self, rng):
        """Partitions identical to the C++ op pre-absorption on noisy
        label maps (absorption may differ in adoption choice)."""
        for _ in range(3):
            lab = rng.randint(0, 5, size=(24, 32)).astype(np.int32)
            out = np.asarray(enforce_connectivity_device(
                jnp.asarray(lab), min_size=1, n_iter=24))
            ref = native.enforce_connectivity(lab, min_size=1)
            assert partition_equal(out, ref), "partition mismatch"
            assert out.max() == ref.max()

    def test_batch_and_min_size(self, rng):
        lab = rng.randint(0, 4, size=(2, 16, 16)).astype(np.int32)
        out = np.asarray(enforce_connectivity_device(
            jnp.asarray(lab), min_size=6, n_iter=24))
        assert out.shape == (2, 16, 16)
        for b in range(2):
            ids, counts = np.unique(out[b], return_counts=True)
            assert (ids == np.arange(len(ids))).all()
