"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (parallel/) is validated here on CPU; the real-TPU path
is exercised by bench.py and the driver's dryrun/compile checks.
"""

import os

# The environment ships JAX_PLATFORMS=axon (TPU-over-tunnel) and this jax
# build ignores the env var — force CPU through the config API before any
# backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ["OOVREC_DISABLE_TENSORBOARD"] = "1"  # no event files per test

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.Generator(np.random.PCG64(1234))
