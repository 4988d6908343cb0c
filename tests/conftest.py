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

# Persistent on-disk XLA compile cache: no-op on the CPU backend (this
# jaxlib's executable (de)serialization segfaults there — see
# utils/compile_cache.py), kept for any non-CPU test runs.
from libiop_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

# O(1)-graph scan butterflies for every NTT in the suite: the unrolled path
# inlined into the collapsed prover-phase graphs makes XLA-CPU (LLVM)
# compiles take minutes per graph on small hosts.  The scan/unrolled paths
# compute bit-identical results; test_fft.py pins the unrolled path
# explicitly so both stay covered.
import libiop_tpu.algebra.fft as _fftmod  # noqa: E402
_fftmod._SCAN_THRESHOLD = 1 << 6

# Same reasoning for binary-field multiplies: the parallel CLMUL-emulation
# inlines ~(k/16)^2 ops per mul; the k-step scan keeps prover-phase graphs
# small.  Bit-identical results (pinned by test_binary_fields.py).
import libiop_tpu.fields.binary as _binmod  # noqa: E402
_binmod._MUL_MODE = "scan"

# Same reasoning for prime-field Montgomery muls: compile-light scanned limb
# loops (bit-identical; ~7x smaller graphs).  tests/test_compile_modes.py
# pins scan==unrolled equivalence so the TPU-default unrolled path stays
# covered.  Opt out per-run with LIBIOP_TPU_TEST_HEAVY=1.
if os.environ.get("LIBIOP_TPU_TEST_HEAVY") != "1":
    import libiop_tpu.fields.prime as _primemod  # noqa: E402
    _primemod.COMPILE_LIGHT = True

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: compile-heaviest cases (zk/gf192/poseidon full-prover "
        "matrices); excluded from the default run, exercised via "
        "`pytest tests/ -m heavy` (the driver's separate tier)")


def pytest_collection_modifyitems(config, items):
    # default run excludes the heavy tier so ONE `pytest tests/` invocation
    # stays under the CI budget; an explicit -m expression takes precedence
    if config.option.markexpr:
        return
    skip = pytest.mark.skip(reason="heavy tier: run with -m heavy")
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _bounded_executable_cache():
    """Clear jax's in-process executable caches after each test module: a
    single full-suite invocation otherwise accumulates hundreds of live CPU
    executables and this jaxlib intermittently SIGSEGVs in
    backend_compile_and_load late in the run (observed at ~62%, and again at
    module 2 of the round-5 suite once the fused-DAG/device-tree graphs
    landed).  The framework's own process-global jit registries hold strong
    references to compiled executables, so they are dropped too — every
    wrapper transparently recompiles, costing only cross-module reuse."""
    yield
    from libiop_tpu.algebra import fft as _fft
    from libiop_tpu.algebra import generic as _gen
    from libiop_tpu.bcs import common as _bcs_common
    from libiop_tpu.iop import runtime as _rt
    from libiop_tpu.protocols import fri as _fri
    from libiop_tpu.protocols import ligero as _lig
    from libiop_tpu.protocols import lincheck as _lc
    from libiop_tpu.fields import autojit as _aj
    for cache in (_rt._FUSED_DAG_JITS, _fft._jit_cache,
                  _bcs_common._DEVICE_LEAF_JIT, _fri._FOLD_FN_CACHE,
                  _fri._COSET_INTERP_CONSTS, _lig._HORNER_JITS,
                  _lc._HORNER_PAIR_JITS, _gen._DEVICE_ARRAY_MEMO,
                  _aj._CACHE):
        cache.clear()
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
