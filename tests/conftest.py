"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU (1 chip) is reserved for bench.py; tests exercise the same code
paths (including sharding) on `--xla_force_host_platform_device_count=8`.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's axon sitecustomize force-registers the remote-TPU PJRT
# plugin and sets JAX_PLATFORMS=axon before any of our code runs; route tests
# to the virtual CPU mesh instead (the real chip is reserved for bench.py).
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent on-disk XLA compile cache: the suite traces hundreds of small
# prover graphs; cache them once across all test processes/runs.
from libiop_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
