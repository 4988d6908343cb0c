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
