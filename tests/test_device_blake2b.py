"""Device-BLAKE2b pins: bit-identical to hashlib for every message shape the
BCS layer produces, and the full device leaf pipeline reproduces the host
serialize+hash path exactly (golden transcripts must not change)."""
import hashlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libiop_tpu.bcs.device_blake2b import (blake2b_words, leaf_words_layout,
                                           prefix_tag_words)
from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.fields.binary import gf64


@pytest.mark.parametrize("msg_bytes,digest_bytes", [
    (0, 32), (4, 8), (124, 32), (128, 32), (132, 64), (385, 32)])
def test_blake2b_words_matches_hashlib(msg_bytes, digest_bytes, rng):
    n = 5
    nw = -(-msg_bytes // 4)
    msgs = [bytes(rng.integers(0, 256, size=msg_bytes, dtype=np.uint8))
            for _ in range(n)]
    rows = np.zeros((n, max(nw, 1)), dtype=np.uint32)
    for k, m in enumerate(msgs):
        padded = m + b"\x00" * (max(nw, 1) * 4 - msg_bytes)
        rows[k] = np.frombuffer(padded, dtype="<u4")
    got = np.asarray(jax.jit(
        lambda w: blake2b_words(w, msg_bytes, digest_bytes))(jnp.asarray(rows)))
    for k, m in enumerate(msgs):
        want = hashlib.blake2b(m, digest_size=digest_bytes).digest()
        assert np.ascontiguousarray(got[k].astype("<u4")).view(
            np.uint8).tobytes() == want


def test_unrolled_compression_matches_hashlib(rng, monkeypatch):
    """The accelerator-selected unrolled compression (no scan, static SIGMA)
    must be bit-identical to hashlib — pinned here on CPU with a tiny batch
    (the auto-switch picks scan on CPU, so force the unrolled path)."""
    import libiop_tpu.bcs.device_blake2b as dev
    monkeypatch.setattr(dev, "_UNROLL_ENV", "1")
    for msg_bytes, digest_bytes in [(4, 32), (128, 32), (196, 32), (385, 64)]:
        nw = max(1, -(-msg_bytes // 4))
        msgs = [bytes(rng.integers(0, 256, size=msg_bytes, dtype=np.uint8))
                for _ in range(3)]
        rows = np.zeros((3, nw), dtype=np.uint32)
        for k, m in enumerate(msgs):
            padded = m + b"\x00" * (nw * 4 - msg_bytes)
            rows[k] = np.frombuffer(padded, dtype="<u4")
        got = np.asarray(blake2b_words(jnp.asarray(rows), msg_bytes,
                                       digest_bytes))
        for k, m in enumerate(msgs):
            want = hashlib.blake2b(m, digest_size=digest_bytes).digest()
            assert np.ascontiguousarray(got[k].astype("<u4")).view(
                np.uint8).tobytes() == want


def test_prefix_tag_words(rng):
    raw = bytes(rng.integers(0, 256, size=20, dtype=np.uint8))
    w = jnp.asarray(np.frombuffer(raw, dtype="<u4").reshape(1, 5))
    tagged = np.asarray(prefix_tag_words(w, 0x01))
    stream = np.ascontiguousarray(tagged[0].astype("<u4")).view(np.uint8)
    assert stream[:21].tobytes() == b"\x01" + raw
    assert (stream[21:] == 0).all()


@pytest.mark.parametrize("F_fn,kind", [(edwards_fr, "mult"),
                                       (gf64, "additive")])
@pytest.mark.parametrize("coset_size", [1, 4])
def test_device_leaf_digests_match_host_path(F_fn, kind, coset_size, rng):
    from libiop_tpu.bcs.common import device_leaf_digests, serialize_leaf_blocks
    from libiop_tpu.bcs.hashing import Blake2bHashing
    from libiop_tpu.algebra.generic import make_domain, element_outside_of_subset

    F = F_fn()
    dim = 5
    if kind == "mult":
        dom = make_domain(F, dim, shift=element_outside_of_subset(F, dim))
    else:
        dom = make_domain(F, dim)
    N = dom.num_elements()
    evals = [F.from_ints([int(x) for x in rng.integers(0, 1 << 60, size=N)])
             for _ in range(3)]
    hasher = Blake2bHashing(128)
    host_blocks = serialize_leaf_blocks(F, evals, dom, coset_size)
    out = device_leaf_digests(F, evals, dom, coset_size, hasher.digest_bytes)
    assert out is not None
    digests, dev_blocks = out
    assert len(digests) == len(host_blocks) == N // coset_size
    for j in range(len(host_blocks)):
        assert digests[j] == hasher.leaf_hash(host_blocks[j])
    # queried-leaf byte fetch == host serialization
    picks = [0, len(host_blocks) - 1, 3 % len(host_blocks)]
    fetched = dev_blocks.gather(picks)
    for b, j in zip(fetched, picks):
        assert b == host_blocks[j]
    assert dev_blocks[1] == host_blocks[1]


@pytest.mark.parametrize("F_fn,kind", [(edwards_fr, "mult"),
                                       (gf64, "additive")])
def test_device_leaf_digests_zk_salts_match_host_path(F_fn, kind, rng):
    """zk trees through the device path: leaf digest = H(tag||block||salt)
    with host-generated salts, bit-identical to hashing the salted block on
    the host (merkle_tree.tcc:37-67 semantics)."""
    from libiop_tpu.bcs.common import device_leaf_digests, serialize_leaf_blocks
    from libiop_tpu.bcs.hashing import Blake2bHashing
    from libiop_tpu.algebra.generic import make_domain, element_outside_of_subset

    F = F_fn()
    dim, coset_size = 5, 2
    if kind == "mult":
        dom = make_domain(F, dim, shift=element_outside_of_subset(F, dim))
    else:
        dom = make_domain(F, dim)
    N = dom.num_elements()
    evals = [F.from_ints([int(x) for x in rng.integers(0, 1 << 60, size=N)])
             for _ in range(2)]
    hasher = Blake2bHashing(128)
    nl = N // coset_size
    sb = hasher.salt_bytes
    salt_blob = bytes(rng.integers(0, 256, size=nl * sb, dtype=np.uint8))
    host_blocks = serialize_leaf_blocks(F, evals, dom, coset_size)
    out = device_leaf_digests(F, evals, dom, coset_size,
                              hasher.digest_bytes, salts=salt_blob)
    assert out is not None
    digests, dev_blocks = out
    for j in range(nl):
        salt = salt_blob[j * sb:(j + 1) * sb]
        assert digests[j] == hasher.leaf_hash(host_blocks[j] + salt)
    # revealed blocks stay UNSALTED (salts travel separately in the proof)
    assert dev_blocks[0] == host_blocks[0]


def test_chunked_leaf_pipeline_matches_host(rng, monkeypatch):
    """The HBM-bounded chunked leaf pipeline (8 slices; engaged above
    _CHUNK_LEAF_THRESHOLD leaves) must reproduce the host serialize+hash
    tree exactly, both families."""
    import libiop_tpu.bcs.common as bcs_common
    from libiop_tpu.bcs.common import device_leaf_digests, serialize_leaf_blocks
    from libiop_tpu.bcs.hashing import Blake2bHashing
    from libiop_tpu.bcs.merkle import MerkleTree
    from libiop_tpu.algebra.generic import make_domain, element_outside_of_subset
    monkeypatch.setattr(bcs_common, "_CHUNK_LEAF_THRESHOLD", 8)
    for F, kind in ((edwards_fr(), "mult"), (gf64(), "additive")):
        dim, coset_size = 6, 2
        if kind == "mult":
            dom = make_domain(F, dim, shift=element_outside_of_subset(F, dim))
        else:
            dom = make_domain(F, dim)
        N = dom.num_elements()
        evals = [F.from_ints([int(x) for x in rng.integers(0, 1 << 60, size=N)])
                 for _ in range(2)]
        hasher = Blake2bHashing(128)
        host_blocks = serialize_leaf_blocks(F, evals, dom, coset_size)
        host_mt = MerkleTree(hasher, host_blocks)
        out = device_leaf_digests(F, evals, dom, coset_size,
                                  hasher.digest_bytes, build_tree=True)
        root, heap_dev, dev_blocks = out
        assert root == host_mt.root, kind
        assert dev_blocks[3] == host_blocks[3]


def test_device_merkle_heap_matches_host_tree(rng):
    """Full device tree build (merkle_heap_words): every heap node equals the
    host MerkleTree's, and the lazy multi-proof equals the host multi-proof
    + passes validate_multi_proof."""
    from libiop_tpu.bcs.common import device_leaf_digests, serialize_leaf_blocks
    from libiop_tpu.bcs.hashing import Blake2bHashing
    from libiop_tpu.bcs.merkle import MerkleTree, validate_multi_proof
    from libiop_tpu.algebra.generic import make_domain, element_outside_of_subset

    F = edwards_fr()
    dim, coset_size = 5, 2
    dom = make_domain(F, dim, shift=element_outside_of_subset(F, dim))
    N = dom.num_elements()
    evals = [F.from_ints([int(x) for x in rng.integers(0, 1 << 60, size=N)])
             for _ in range(2)]
    hasher = Blake2bHashing(128)
    host_blocks = serialize_leaf_blocks(F, evals, dom, coset_size)
    host_mt = MerkleTree(hasher, host_blocks)
    out = device_leaf_digests(F, evals, dom, coset_size, hasher.digest_bytes,
                              build_tree=True)
    assert out is not None
    root, heap_dev, dev_blocks = out
    nl = N // coset_size
    dev_mt = MerkleTree.from_device_heap(hasher, nl, heap_dev, root)
    assert dev_mt.root == host_mt.root
    picks = [0, 3, nl - 1]
    lazy_proof = dev_mt.multi_proof(picks)   # device-gather path
    assert lazy_proof == host_mt.multi_proof(picks)
    assert validate_multi_proof(
        hasher, dev_mt.root, nl, picks, [host_blocks[p] for p in picks],
        lazy_proof)
    assert dev_mt.materialize_nodes()[1:] == host_mt.nodes[1:]
