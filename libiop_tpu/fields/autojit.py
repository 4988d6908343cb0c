"""Auto-jit for eager field-method calls.

The prover's hot phases run as a handful of consolidated jitted graphs, but
host orchestration (transcript assembly, query replay, small per-round glue)
still calls field methods eagerly.  Eagerly, every jnp primitive inside a
method like :meth:`PrimeField.mul` (~60 pads/multiplies/shifts for L=12)
dispatches as its OWN tiny XLA computation, compiled once per distinct shape
— a dim-4 Aurora prove was measured at 373 XLA compilations, ~240 s of its
309 s wall on a 2-core host, and each graph is a 30-500 s round-trip through
the axon remote-TPU compile service.

This decorator makes every *eager* call (no tracer arguments) route through a
cached ``jax.jit`` of the whole method, keyed by (field, method, static args,
array shapes/dtypes, trace-time mode globals): one compilation per
method/shape/mode ever, reused across call sites, rounds, and prover
instances.  Traced calls (already inside a jitted phase) inline exactly as
before — zero behavior change under jit.

The cached closure captures only the *static* (non-array) argument values —
never the caller's device buffers — so cache entries do not pin HBM.
"""
from __future__ import annotations

import functools
import operator
import sys

import jax
import jax.numpy as jnp
import numpy as np

_CACHE: dict = {}


def _field_key(self) -> tuple:
    # fields with identical parameters are functionally identical, so key by
    # value (not id): cache entries survive field-object re-creation in tests
    return (type(self).__name__, getattr(self, "name", None),
            getattr(self, "p", None), getattr(self, "k", None))


def _mode_key() -> tuple:
    """Trace-time mode globals that change the lowering (not the math).

    Included in the cache key so toggling a mode mid-process retraces
    instead of silently reusing graphs traced under the other mode."""
    pm = sys.modules.get("libiop_tpu.fields.prime")
    bm = sys.modules.get("libiop_tpu.fields.binary")
    return (getattr(pm, "COMPILE_LIGHT", None),
            getattr(bm, "_MUL_MODE", None))


def _as_static(a):
    """Normalize 0-d integer scalars (np.integer, 0-d int ndarray) to Python
    ints so they classify as static — int-only code like bin(e) in pow_static
    must not see a tracer."""
    if isinstance(a, np.integer):
        return operator.index(a)
    if isinstance(a, np.ndarray) and a.shape == () and \
            np.issubdtype(a.dtype, np.integer):
        return int(a)
    return a


def autojit(method):
    """Wrap a field arithmetic method: eager calls go through a cached jit.

    Array arguments (anything with .shape/.dtype, except 0-d integer numpy
    scalars; lists/tuples of arrays are NOT supported) are traced; everything
    else (ints, bools) is treated as static and baked into the cache key.
    """
    name = method.__name__

    @functools.wraps(method)
    def wrapper(self, *args, **kwargs):
        if kwargs or any(isinstance(a, jax.core.Tracer) for a in args):
            return method(self, *args, **kwargs)
        args = tuple(_as_static(a) for a in args)
        arr_idx = tuple(i for i, a in enumerate(args)
                        if hasattr(a, "shape") and hasattr(a, "dtype"))
        if not arr_idx:
            return method(self, *args)
        arrs = [jnp.asarray(args[i]) for i in arr_idx]
        try:
            static = tuple(args[i] for i in range(len(args))
                           if i not in arr_idx)
            key = (_field_key(self), name, static, _mode_key(),
                   tuple((a.shape, a.dtype.name) for a in arrs))
            hash(key)
        except TypeError:  # unhashable static arg: fall back to eager
            return method(self, *args)
        fn = _CACHE.get(key)
        if fn is None:
            # capture ONLY static values + positions — no caller arrays —
            # so the cache never pins device buffers
            arr_pos = set(arr_idx)
            nargs = len(args)
            static_vals = static

            def call(*arr_args):
                ai = iter(arr_args)
                si = iter(static_vals)
                full = [next(ai) if i in arr_pos else next(si)
                        for i in range(nargs)]
                return method(self, *full)

            fn = _CACHE[key] = jax.jit(call)
        return fn(*arrs)

    return wrapper
