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
    <repo>/.jax_cache).  Safe to call multiple times / before any jax op."""
    import jax

    path = cache_dir or os.environ.get("LIBIOP_TPU_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: the prover traces hundreds of small graphs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # flag renamed across jax versions; best effort
        pass
    return path
