"""Device-mesh utilities: shard codewords over a 1-D mesh.

The reference is single-threaded (SURVEY.md §0); scaling here is TPU-native:
codewords (the (L, N) limb arrays) shard over their evaluation axis via
``jax.sharding``; XLA/GSPMD inserts the all-to-alls for NTT butterflies and
the collectives for Merkle/rowcheck reductions.  Limbs stay replicated
(PartitionSpec(None, 'cw')) so every field op is purely local.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CODEWORD_AXIS = "cw"


def make_codeword_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (CODEWORD_AXIS,))


def codeword_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the trailing (evaluation) axis; replicate limbs."""
    return NamedSharding(mesh, P(None, CODEWORD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# global sharding hook: the IOP engine shards every submitted oracle over the
# codeword axis while a mesh context is active, so the WHOLE prover (witness
# encode, lincheck, FRI folds, leaf serialization) runs GSPMD-sharded with
# zero protocol-code changes — and its transcript must stay byte-identical
# to the single-device proof (SURVEY §7.2 step-13 gate)
# ---------------------------------------------------------------------------
import contextlib

_ACTIVE_MESH: Mesh | None = None


@contextlib.contextmanager
def codeword_sharding_context(mesh: Mesh):
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


def device_fetch(arr) -> "np.ndarray":
    """device->host that also handles multi-process GLOBAL arrays (shards on
    other hosts): fully-replicated arrays read the local replica; sharded
    ones allgather so every process holds the identical full value — the
    invariant the replicated host-side protocol code depends on."""
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        if arr.is_fully_replicated:
            return np.asarray(arr.addressable_data(0))
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(jax.device_get(arr))


_COL_FETCH_CACHE: dict = {}


def fetch_column(ev, position: int):
    """ev[:, position:position+1] for possibly-global arrays: a plain eager
    slice when addressable; a jitted dynamic-slice with replicated output
    (one compile per shape, position traced) across processes."""
    if not (isinstance(ev, jax.Array) and not ev.is_fully_addressable):
        return ev[:, position:position + 1]
    import jax.lax as lax
    mesh = _ACTIVE_MESH
    key = (ev.shape, str(ev.dtype), id(mesh))
    fn = _COL_FETCH_CACHE.get(key)
    if fn is None:
        out_sh = NamedSharding(mesh, P()) if mesh is not None else None
        fn = _COL_FETCH_CACHE[key] = jax.jit(
            lambda a, p: lax.dynamic_slice_in_dim(a, p, 1, axis=1),
            out_shardings=out_sh)
    return fn(ev, position)


def _mesh_is_multiprocess(mesh: Mesh) -> bool:
    procs = {d.process_index for d in mesh.devices.flat}
    return len(procs) > 1


def maybe_shard_codeword(arr):
    """device_put an (L, N) limb array with the codeword axis sharded when a
    mesh context is active and N divides evenly; replicate otherwise.

    Multi-process meshes: a committed single-device jax.Array cannot be
    resharded across processes, so pull it to host first (the replicated
    host-side protocol code guarantees every process passes the identical
    value) and device_put the numpy."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return arr
    if _mesh_is_multiprocess(mesh) and isinstance(arr, jax.Array):
        if not arr.is_fully_addressable:
            return arr  # already global on this mesh topology
        arr = np.asarray(jax.device_get(arr))
    n_dev = mesh.devices.size
    if arr.ndim >= 2 and arr.shape[-1] % n_dev == 0:
        spec = P(*([None] * (arr.ndim - 1) + [CODEWORD_AXIS]))
        return jax.device_put(arr, NamedSharding(mesh, spec))
    return jax.device_put(arr, NamedSharding(mesh, P()))
