"""Fiat–Shamir proof-of-work grinding (libiop/bcs/pow.{hpp,tcc} semantics):
after the final round, the prover finds a nonce whose hash with the current
hashchain state clears ``work_bits`` leading zero bits; this lets the query
phase run with fewer FRI queries (aurora_iop.tcc:74-77).
"""
from __future__ import annotations

from .hashing import blake2b


class PowParameters:
    def __init__(self, work_bits: int = 0, digest_bytes: int = 32):
        assert 0 <= work_bits < 60
        self.work_bits = work_bits
        self.digest_bytes = digest_bytes

    def _ok(self, challenge: bytes, nonce: int) -> bool:
        h = blake2b(b"pow" + challenge + nonce.to_bytes(8, "little"), 8)
        return int.from_bytes(h, "little") < (1 << (64 - self.work_bits))

    def solve(self, challenge: bytes) -> int:
        if self.work_bits == 0:
            return 0
        from . import native_blake2b
        nonce = native_blake2b.pow_solve(challenge, self.work_bits)
        if nonce is not None:
            return nonce
        nonce = 0
        while not self._ok(challenge, nonce):
            nonce += 1
        return nonce

    def verify(self, challenge: bytes, nonce: int) -> bool:
        if self.work_bits == 0:
            return True
        return self._ok(challenge, nonce)
