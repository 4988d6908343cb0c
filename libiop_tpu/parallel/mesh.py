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


def maybe_shard_codeword(arr):
    """device_put an (L, N) limb array with the codeword axis sharded when a
    mesh context is active and N divides evenly; replicate otherwise."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return arr
    n_dev = mesh.devices.size
    if arr.ndim >= 2 and arr.shape[-1] % n_dev == 0:
        spec = P(*([None] * (arr.ndim - 1) + [CODEWORD_AXIS]))
        return jax.device_put(arr, NamedSharding(mesh, spec))
    return jax.device_put(arr, NamedSharding(mesh, P()))
