"""Test config: force an 8-device virtual CPU mesh BEFORE jax initializes.

Mirrors the reference's only viable no-hardware strategy (SURVEY.md §4):
exactness makes every sharded run a bit-comparison against the
single-device result.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the site config pins JAX_PLATFORMS=axon at interpreter start; the env var
# alone does not stick, so force the platform through the config API too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


def random_int_matrix(rng, n, density, vmax=4):
    a = (rng.random((n, n)) < density).astype(np.int64)
    return a * rng.integers(1, vmax + 1, (n, n))


def random_float_matrix(rng, n, density):
    a = (rng.random((n, n)) < density).astype(np.float64)
    return a * rng.random((n, n)) * 5.0
