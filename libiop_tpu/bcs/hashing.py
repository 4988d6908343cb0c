"""Hashing for the BCS transformation: BLAKE2b leaf/2-to-1 hashes and the
Fiat–Shamir hashchain.

Counterpart of libiop/bcs/hashing/{hashing.hpp,blake2b.*,hash_enum.*}:
* digests are ``2*(security_bits/8)`` bytes (bcs_common.tcc:405);
* the hashchain absorbs MT roots and zero-prefixed prover-message blocks and
  squeezes verifier field elements / query positions with a per-state squeeze
  counter (blake2b.cpp:28-60 semantics, own byte-level spec — the C++
  reference cannot be built here, so golden vectors are self-generated; see
  tests/test_bcs.py).

The hashchain is strictly sequential host-side work on tiny data — the right
place for it is the CPU, while leaf hashing over 2^20-leaf trees is batched
(native/ C++ kernel, with a hashlib fallback).

Field elements are always serialized CANONICALLY (little-endian 16-bit limbs,
``field.elem_bytes`` per element) — never in Montgomery form.
"""
from __future__ import annotations

import hashlib
from typing import List, Sequence

from ..fields.prime import PrimeField

DOMAIN_SEP = b"libiop-tpu/bcs/v1/"


def blake2b(data: bytes, digest_size: int) -> bytes:
    return hashlib.blake2b(data, digest_size=digest_size).digest()


#: domain-separation tags: a leaf input can never collide with an inner-node
#: input (2-digest concat) even when their lengths coincide
LEAF_TAG = b"\x00"
NODE_TAG = b"\x01"


class Blake2bHashing:
    """Hash suite: leaf hash, 2-to-1 compression, zk salting."""

    name = "blake2b"
    algebraic = False

    def __init__(self, security_bits: int = 128):
        self.security_bits = security_bits
        self.digest_bytes = 2 * (security_bits // 8)
        self.salt_bytes = 2 * (security_bits // 8)

    def leaf_hash(self, data: bytes) -> bytes:
        return blake2b(LEAF_TAG + data, self.digest_bytes)

    def two_to_one(self, left: bytes, right: bytes) -> bytes:
        return blake2b(NODE_TAG + left + right, self.digest_bytes)

    # batched variants (native C++ with OpenMP; hashlib fallback)
    def leaf_hash_batch_array(self, arr):
        """Hash a contiguous (n, block_len) uint8 array of leaf blocks;
        None if the native kernel is unavailable (caller falls back)."""
        from . import native_blake2b
        return native_blake2b.hash_batch_array(arr, self.digest_bytes,
                                               tag=LEAF_TAG)

    def leaf_hash_batch(self, blocks):
        from . import native_blake2b
        out = native_blake2b.hash_batch(list(blocks), self.digest_bytes,
                                        tag=LEAF_TAG)
        if out is not None:
            return out
        return [self.leaf_hash(b) for b in blocks]

    def tree_layer(self, digests):
        from . import native_blake2b
        out = native_blake2b.tree_layer(list(digests), self.digest_bytes,
                                        tag=NODE_TAG)
        if out is not None:
            return out
        return [self.two_to_one(digests[2 * i], digests[2 * i + 1])
                for i in range(len(digests) // 2)]


class Blake2bHashchain:
    """Sequential Fiat–Shamir state.  absorb(x): state <- H(state || x).
    squeeze counter resets on every absorb (so squeezes are deterministic
    functions of the absorb history).  Field-generic: works over prime fields
    (uniform mod-p sampling with 128 slack bits) and binary fields (exact
    k-bit extraction)."""

    def __init__(self, field, security_bits: int = 128):
        self.F = field
        self.digest_bytes = 2 * (security_bits // 8)
        self.state = blake2b(DOMAIN_SEP + b"hashchain-init", self.digest_bytes)
        self._squeeze_ctr = 0
        if hasattr(field, "p"):  # prime field: add modular-reduction slack
            self._sample_bytes = min(64, field.elem_bytes + 16)
        else:                    # binary field: exact width is uniform
            self._sample_bytes = min(64, field.elem_bytes)

    def absorb_bytes(self, data: bytes):
        self.state = blake2b(self.state + data, self.digest_bytes)
        self._squeeze_ctr = 0

    def absorb_root(self, root: bytes):
        self.absorb_bytes(b"root" + root)

    def absorb_field_elements(self, values: Sequence[int]):
        """Zero-prefixed concatenation (role of bcs_common.tcc:577-584)."""
        eb = self.F.elem_bytes
        data = b"\x00" * eb + b"".join(
            self.F.sample_int(int(v)).to_bytes(eb, "little") for v in values)
        self.absorb_bytes(b"msgs" + data)

    def _squeeze_block(self, nbytes: int) -> bytes:
        out = blake2b(self.state + b"squeeze" + self._squeeze_ctr.to_bytes(8, "little"),
                      min(64, nbytes))
        self._squeeze_ctr += 1
        return out

    def squeeze_field_elements(self, n: int) -> List[int]:
        """n uniform field elements of the chain's field."""
        return [self.F.sample_int(
            int.from_bytes(self._squeeze_block(self._sample_bytes), "little"))
            for _ in range(n)]

    def squeeze_query_positions(self, n: int, domain_size: int) -> List[int]:
        """n positions in [0, domain_size); domain_size must be a power of two
        (mask extraction, blake2b.cpp:50-60 semantics)."""
        assert domain_size & (domain_size - 1) == 0
        return [int.from_bytes(self._squeeze_block(8), "little") & (domain_size - 1)
                for _ in range(n)]
