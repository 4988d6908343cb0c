"""Multi-host scale-out: jax.distributed runtime + global codeword meshes.

The reference is a single-threaded C++ library (SURVEY.md §0) — this module
is the TPU-native subsystem with no reference counterpart (SURVEY.md §5
"distributed communication backend"): one process per host, a global device
mesh over all hosts, codewords sharded over the mesh's codeword axis so the
NTT all-to-alls and Merkle reductions ride ICI within a pod and DCN across
hosts.

Design contract (mirrors the single-host `mesh.py` hook):

* every process runs the SAME host-side protocol code (registration,
  hashchain, transcript assembly are deterministic and tiny, so they are
  replicated rather than distributed);
* device arrays are globally sharded `jax.Array`s built from process-local
  shards (`host_local_to_global`), so XLA/GSPMD inserts the cross-host
  collectives;
* anything that must be materialized on the host (Merkle leaf blocks, query
  responses) is gathered with `process_allgather`, after which every process
  holds identical bytes and produces an identical transcript — the
  multi-host analogue of the single-vs-multi-device proof bit-identity gate
  (`__graft_entry__.dryrun_multichip`).

Tested as a "fake cluster": N local processes, each with a slice of a
virtual CPU mesh, coordinated over localhost (tests/test_multihost.py) —
the reference has no distributed testing at all (SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import CODEWORD_AXIS


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, local_device_ids=None) -> None:
    """Join the jax.distributed runtime.  Call once per process, before any
    jax computation.  On real multi-host TPU pods the three arguments come
    from the scheduler's environment; on a fake cluster they are explicit."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_global_codeword_mesh() -> Mesh:
    """1-D mesh over ALL global devices (every host's chips), ordered by
    (process_index, local id) so that the codeword axis is contiguous per
    host — intra-host NTT stages stay on ICI, only the coarsest butterfly
    exchanges cross DCN."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (CODEWORD_AXIS,))


def codeword_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the trailing (evaluation) axis; replicate limb axes."""
    return NamedSharding(mesh, P(*([None] * (ndim - 1) + [CODEWORD_AXIS])))


def host_local_to_global(mesh: Mesh, local_shard: np.ndarray) -> jax.Array:
    """Assemble a globally-sharded array from this process's slice of the
    trailing axis.  Every process passes its own contiguous chunk (in mesh
    order); the result is one logical (L, N_global) codeword."""
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        local_shard, mesh, P(*([None] * (local_shard.ndim - 1)
                               + [CODEWORD_AXIS])))


def global_to_host_local(mesh: Mesh, arr: jax.Array) -> np.ndarray:
    """Inverse of host_local_to_global: this process's chunk as numpy."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.global_array_to_host_local_array(
        arr, mesh, P(*([None] * (arr.ndim - 1) + [CODEWORD_AXIS]))))


def allgather_host_bytes(local_blocks: list) -> list:
    """Gather per-process lists of host bytes objects so every process ends
    with the full, identically-ordered list (process order).  Used for
    Merkle leaf blocks / query responses before transcript assembly."""
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return list(local_blocks)
    # serialize to uint8 with a length header per block; pad to equal size
    payload = b"".join(len(b).to_bytes(4, "little") + b for b in local_blocks)
    sizes = multihost_utils.process_allgather(
        np.array([len(payload)], dtype=np.int64))
    max_len = int(sizes.max())
    buf = np.zeros(max_len, dtype=np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    gathered = multihost_utils.process_allgather(buf)  # (P, max_len)
    out = []
    for pi in range(gathered.shape[0]):
        data = gathered[pi, :int(sizes[pi])].tobytes()
        off = 0
        while off < len(data):
            n = int.from_bytes(data[off:off + 4], "little")
            off += 4
            out.append(data[off:off + n])
            off += n
    return out


def assert_same_on_all_processes(digest: bytes) -> None:
    """Bit-identity gate across hosts: every process must have produced the
    same transcript digest (the multi-host analogue of the single-vs-multi
    device proof equality assertion)."""
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return
    arr = np.frombuffer(digest, dtype=np.uint8)
    gathered = multihost_utils.process_allgather(arr)
    if not (gathered == gathered[0]).all():
        raise AssertionError("multi-host transcript divergence")
