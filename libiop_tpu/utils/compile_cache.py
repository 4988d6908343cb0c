"""Persistent XLA compilation cache for the framework's entry points.

The reference is a header-only C++ library — compilation happens once at
build time.  Here every process that traces a prover pays XLA compilation
(seconds on CPU, 30-500s per graph through the axon remote-TPU compile
service), so the test suite, `bench.py`'s subprocess children, and the
instrument CLI all enable a shared on-disk cache: a graph is compiled once
per (backend, shape signature) ever, not once per process.

Opt-in by entry point rather than forced at import so that library users
keep control of their own jax config.
"""
from __future__ import annotations

import os

# outside the repo so worktree cleaning between rounds keeps the cache warm
_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "libiop_tpu_jax")


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point jax's persistent compilation cache at `cache_dir` (default:
    ~/.cache/libiop_tpu_jax/<platform>-<ndev>-<jaxver>).  Safe to call
    multiple times / before any jax op.

    The directory is partitioned by (platform, device count, jax version):
    executables serialized for one backend topology can crash (SIGSEGV in the
    deserializer) when loaded under another, and a shared flat directory lets
    a killed writer corrupt entries other configurations then read.
    """
    import jax

    base = cache_dir or os.environ.get("LIBIOP_TPU_JAX_CACHE", _DEFAULT_DIR)
    try:
        plat = jax.default_backend()
        ndev = jax.device_count()
    except Exception:  # backend not initializable yet; fall back to env hints
        plat = os.environ.get("JAX_PLATFORMS", "auto").split(",")[0] or "auto"
        ndev = 0
    if plat == "cpu" and os.environ.get("LIBIOP_TPU_FORCE_CACHE") != "1":
        # This jaxlib's executable (de)serialization SIGSEGVs intermittently
        # on the host-CPU backend (observed in both put_executable_and_time
        # and get_executable_and_time under --xla_force_host_platform_
        # device_count=8).  CPU compiles are seconds; the cache only pays for
        # itself against the 30-500s remote-TPU compile service, so skip it.
        return ""
    path = os.path.join(base, f"{plat}-{ndev}-{jax.__version__}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: the prover traces hundreds of small graphs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # flag renamed across jax versions; best effort
        pass
    return path
