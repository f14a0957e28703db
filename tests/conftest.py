"""Test env: force an 8-device virtual CPU mesh.

This makes data-parallel / sync-BN paths testable without TPU hardware
(an upgrade over the reference, which had no multi-device tests at all —
SURVEY.md §4.5).

Note: this image's sitecustomize imports jax and registers the axon TPU
plugin at interpreter startup, so JAX_PLATFORMS env vars set here are too
late — we must update jax.config directly (before first backend use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1111)
