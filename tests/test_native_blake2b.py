"""Native batched BLAKE2b vs hashlib ground truth."""
import hashlib

from libiop_tpu.bcs import native_blake2b
from libiop_tpu.bcs.hashing import Blake2bHashing
from libiop_tpu.bcs.merkle import MerkleTree, validate_multi_proof


def test_native_matches_hashlib():
    if not native_blake2b.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    blocks = [bytes([i, i + 1, 7]) * 11 for i in range(64)]
    for dlen in (32, 64):
        got = native_blake2b.hash_batch(blocks, dlen)
        want = [hashlib.blake2b(b, digest_size=dlen).digest() for b in blocks]
        assert got == want
    digests = native_blake2b.hash_batch(blocks, 32)
    layer = native_blake2b.tree_layer(digests, 32)
    want = [hashlib.blake2b(digests[2 * i] + digests[2 * i + 1],
                            digest_size=32).digest() for i in range(32)]
    assert layer == want


def test_merkle_uses_batched_path():
    hasher = Blake2bHashing(128)
    leaves = [bytes([i] * 24) for i in range(64)]
    mt = MerkleTree(hasher, leaves)
    # root must equal the reference sequential construction
    nodes = [hasher.leaf_hash(b) for b in leaves]
    while len(nodes) > 1:
        nodes = [hasher.two_to_one(nodes[2 * i], nodes[2 * i + 1])
                 for i in range(len(nodes) // 2)]
    assert mt.root == nodes[0]
    aux = mt.multi_proof([5])
    assert validate_multi_proof(hasher, mt.root, 64, [5], [leaves[5]], aux)


def test_native_pow_solve_matches_python():
    """The OpenMP grind returns the SAME (lowest) nonce as the sequential
    Python loop — transcripts must stay byte-identical."""
    from libiop_tpu.bcs.pow import PowParameters
    if not native_blake2b.available():
        pytest.skip("native toolchain unavailable")
    for bits, seed in [(6, 0), (10, 1), (13, 2)]:
        challenge = hashlib.blake2b(bytes([seed]), digest_size=32).digest()
        p = PowParameters(work_bits=bits)
        native = native_blake2b.pow_solve(challenge, bits)
        assert native is not None
        nonce = 0
        while not p._ok(challenge, nonce):
            nonce += 1
        assert native == nonce
        assert p.verify(challenge, native)
        assert p.solve(challenge) == nonce
