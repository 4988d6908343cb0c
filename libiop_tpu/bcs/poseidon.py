"""Poseidon permutation + algebraic sponge hashing for the BCS layer.

Counterpart of libiop/bcs/hashing/{poseidon,algebraic_sponge}.{hpp,tcc} +
hash_enum, with **reference-exact semantics**, validated against the
reference's known-answer vectors (tests/snark/test_poseidon.cpp:45-119):

* permutation (poseidon.tcc:241-297): R_F/2 full rounds, R_P partial
  rounds, R_F/2 full rounds; each round adds the round-key row to the whole
  state *before* the S-box; full rounds S-box every lane, partial rounds
  S-box only the **last** lane (poseidon.tcc:266); then the mix layer
  (full MDS mat-vec, or the near-MDS add-only forms for state size 3/4,
  poseidon.tcc:196-239).
* sponge (algebraic_sponge.tcc:19-102): absorb adds rate-sized chunks into
  state[0:rate] with a permutation between chunks and between separate
  absorb calls; squeeze permutes whenever the unread window is empty and
  reads from state[0:rate].
* leaf hash = absorb + squeeze(1) (algebraic_sponge.tcc:224-231); zk leaf
  hash appends the salt as one extra field element (tcc:233-246);
  two-to-one *sets* state[0]=left, state[1]=right and squeezes
  (tcc:263-272) — one permutation per tree node.

Parameter presets are the reference's concrete alt_bn128_Fr instantiations
(`poseidon_presets.py`): the enum `poseidon` maps to
default_128_bit_altbn_poseidon_params (alpha=5, 8 full + 56 partial, full
MDS) and `poseidon_high_alpha` to high_alpha_128_bit_altbn_poseidon_params
(alpha=17, near-MDS, 8 full + 29 partial) when the field is alt_bn128_Fr —
matching hash_enum.tcc:13-50.  For other prime fields (the reference only
wires Poseidon for altbn, hash_enum.tcc:35-38) constants are derived from a
pinned BLAKE2b stream with round counts from the interpolation bound, which
reproduces the reference's alpha=5 table value 56.
"""
from __future__ import annotations

import hashlib
import math
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.prime import PrimeField
from . import poseidon_presets as presets


def _stream(seed: bytes, p: int):
    """Deterministic field-element stream via BLAKE2b expansion (for fields
    with no reference preset)."""
    ctr = 0
    nbytes = (p.bit_length() + 7) // 8 + 16
    while True:
        out = hashlib.blake2b(seed + ctr.to_bytes(8, "little"),
                              digest_size=min(64, nbytes)).digest()
        ctr += 1
        yield int.from_bytes(out, "little") % p


def choose_alpha(p: int, minimum: int = 3) -> int:
    """Smallest odd alpha >= minimum with gcd(alpha, p-1) == 1 — x^alpha is
    a permutation of F_p only then.  The reference hardcodes alpha per field
    (5 for alt_bn128, hash_enum.tcc:35-38); fields like edwards_Fr have
    5 | p-1, so the derived path picks the nearest valid exponent."""
    a = minimum | 1
    while math.gcd(a, p - 1) != 1:
        a += 2
    return a


def derived_partial_rounds(alpha: int, state_size: int, security: int,
                           p_bits: int) -> int:
    """Interpolation-attack bound from the Poseidon paper (the role of the
    reference's "copied from the paper's table" counts, poseidon.tcc:312-320):
    the interpolated polynomial after R rounds has degree alpha^R, so
    R_P >= ceil(log_alpha(2) * min(sec, p_bits/2)) + ceil(log_alpha(t)).
    For alpha=5, t=3, sec=128 over BN254 this derives 56 — exactly the
    reference's table value."""
    M = min(security, p_bits // 2)
    return (math.ceil(math.log(2) / math.log(alpha) * M)
            + math.ceil(math.log(state_size) / math.log(alpha)))


class PoseidonParams:
    """Permutation parameters: explicit (preset) or stream-derived."""

    def __init__(self, F: PrimeField, state_size: int = 3, rate: int = 2,
                 alpha: Optional[int] = None, full_rounds: int = 8,
                 partial_rounds: Optional[int] = None,
                 security_bits: int = 128,
                 near_mds: bool = False,
                 ark: Optional[List[List[int]]] = None,
                 mds: Optional[List[List[int]]] = None):
        assert rate < state_size
        self.F = F
        self.p = F.p
        self.state_size = state_size
        self.rate = rate
        self.capacity = state_size - rate
        if alpha is None:
            alpha = choose_alpha(self.p, 3)
        self.alpha = alpha
        # alpha must be coprime to p-1 for x^alpha to permute F_p
        assert math.gcd(alpha, self.p - 1) == 1, \
            f"x^{alpha} is not a permutation of {F.name}"
        self.full_rounds = full_rounds
        if partial_rounds is None:
            partial_rounds = derived_partial_rounds(
                alpha, state_size, security_bits, F.p.bit_length())
        self.partial_rounds = partial_rounds
        self.near_mds = near_mds
        total = full_rounds + partial_rounds
        if ark is not None:
            assert len(ark) == total, "ark matrix of wrong dimension"
            self.round_constants = [[v % self.p for v in row] for row in ark]
        else:
            gen = _stream(b"libiop-tpu/poseidon/rc/" + F.name.encode(), self.p)
            self.round_constants = [[next(gen) for _ in range(state_size)]
                                    for _ in range(total)]
        if mds is not None:
            self.mds = [[v % self.p for v in row] for row in mds]
        elif near_mds:
            assert state_size in (3, 4)
            self.mds = ([[1, 0, 1], [1, 1, 0], [0, 1, 1]] if state_size == 3
                        else [[0, 1, 1, 1], [1, 0, 1, 1],
                              [1, 1, 0, 1], [1, 1, 1, 0]])
        else:
            # Cauchy MDS matrix: M[i][j] = 1/(x_i + y_j) with distinct x, y
            xs = list(range(state_size))
            ys = list(range(state_size, 2 * state_size))
            self.mds = [[pow((xi + yj) % self.p, self.p - 2, self.p)
                         for yj in ys] for xi in xs]

    # -- reference presets (alt_bn128_Fr) -----------------------------------
    @classmethod
    def from_preset(cls, F: PrimeField, preset: dict) -> "PoseidonParams":
        assert F.p == presets.ALT_BN128_R, \
            "reference Poseidon presets are alt_bn128_Fr instantiations"
        return cls(F, state_size=preset["state_size"], rate=preset["rate"],
                   alpha=preset["alpha"], full_rounds=preset["full_rounds"],
                   partial_rounds=preset["partial_rounds"],
                   near_mds=preset["near_mds"],
                   ark=preset["ark"], mds=preset["mds"])

    @classmethod
    def for_field(cls, F: PrimeField, variant: str,
                  security_bits: int = 128) -> "PoseidonParams":
        """hash_enum dispatch (hash_enum.tcc:13-50 role): reference presets
        for alt_bn128_Fr, stream-derived constants elsewhere."""
        high = variant == "poseidon_high_alpha"
        if F.p == presets.ALT_BN128_R:
            return cls.from_preset(F, presets.ALTBN_HIGH_ALPHA_T3 if high
                                   else presets.ALTBN_DEFAULT_128)
        if high:
            return cls.high_alpha(F, security_bits)
        return cls(F, security_bits=security_bits)

    @classmethod
    def high_alpha(cls, F: PrimeField, security_bits: int = 128
                   ) -> "PoseidonParams":
        """High-alpha variant for fields without a preset: alpha=17,
        near-MDS mix, 8 full rounds; partial rounds from the interpolation
        bound (33 here vs the reference's altbn 29 — strictly more
        conservative)."""
        return cls(F, state_size=3, rate=2, alpha=choose_alpha(F.p, 17),
                   full_rounds=8, partial_rounds=None,
                   security_bits=security_bits, near_mds=True)

    # -- host-int permutation (reference-exact, poseidon.tcc:241-297) -------
    def _mix(self, s: List[int]) -> List[int]:
        p, t = self.p, self.state_size
        if self.near_mds and t == 3:
            # [[1,0,1],[1,1,0],[0,1,1]] (poseidon.tcc:198-212)
            return [(s[0] + s[2]) % p, (s[0] + s[1]) % p, (s[1] + s[2]) % p]
        if self.near_mds and t == 4:
            # complete-sum complement form (poseidon.tcc:213-226)
            tot = sum(s) % p
            return [(tot - v) % p for v in s]
        return [sum(self.mds[i][j] * s[j] for j in range(t)) % p
                for i in range(t)]

    def permute(self, state: List[int]) -> List[int]:
        p = self.p
        t = self.state_size
        s = [v % p for v in state]
        half = self.full_rounds // 2
        r = 0
        for _ in range(half):
            rc = self.round_constants[r]
            s = [pow((v + c) % p, self.alpha, p) for v, c in zip(s, rc)]
            s = self._mix(s)
            r += 1
        for _ in range(self.partial_rounds):
            rc = self.round_constants[r]
            s = [(v + c) % p for v, c in zip(s, rc)]
            s[t - 1] = pow(s[t - 1], self.alpha, p)  # last lane, tcc:266
            s = self._mix(s)
            r += 1
        for _ in range(half):
            rc = self.round_constants[r]
            s = [pow((v + c) % p, self.alpha, p) for v, c in zip(s, rc)]
            s = self._mix(s)
            r += 1
        return s


def salt_to_field_elem(salt: bytes, p: int) -> int:
    """Reference zk-salt parse (algebraic_sponge.tcc:109-126): the salt is
    read as 64-bit little-endian words placed big-endian-first into the
    bigint, i.e. word i scales 2^(64*(num_words-1-i))."""
    nw = len(salt) // 8
    val = 0
    for i in range(nw):
        val += int.from_bytes(salt[8 * i:8 * i + 8], "little") \
            << (64 * (nw - 1 - i))
    return val % p


class AlgebraicSponge:
    """Rate/capacity sponge, reference-exact state machine
    (algebraic_sponge.tcc:19-102)."""

    def __init__(self, params: PoseidonParams):
        self.params = params
        self.state = [0] * params.state_size
        self.next_unsqueezed = 0
        self.absorbing = False

    def reset(self):
        self.state = [0] * self.params.state_size
        self.next_unsqueezed = 0
        self.absorbing = False

    def absorb(self, values: Sequence[int]):
        p = self.params
        if self.absorbing:
            self.state = p.permute(self.state)
        vals = [int(v) % p.p for v in values]
        # rate-sized chunks; permute BETWEEN chunks, not after the last
        for start in range(0, max(len(vals), 1), p.rate):
            if start > 0:
                self.state = p.permute(self.state)
            chunk = vals[start:start + p.rate]
            for i, v in enumerate(chunk):
                self.state[i] = (self.state[i] + v) % p.p
        self.absorbing = True

    def squeeze(self, n: int) -> List[int]:
        p = self.params
        if self.absorbing:
            self.next_unsqueezed = 0
            self.absorbing = False
        out: List[int] = []
        while len(out) < n:
            if self.next_unsqueezed == 0:
                self.state = p.permute(self.state)
            while self.next_unsqueezed < p.rate and len(out) < n:
                out.append(self.state[self.next_unsqueezed])
                self.next_unsqueezed += 1
            if len(out) < n:
                self.next_unsqueezed = 0
        return out


class BatchedPoseidon:
    """Device-batched Poseidon permutation over (L, t, n) Montgomery limb
    tensors — the TPU replacement for the reference's per-leaf sequential
    hashing (poseidon.md: "when it is deployed, it is the bottleneck in time
    for the entire prover").  One `lax.scan` per round phase; every field op
    runs at full batch width n (all Merkle leaves of a layer at once)."""

    def __init__(self, params: PoseidonParams):
        self.params = params
        F = params.F
        self.F = F
        t = params.state_size
        # round constants, Montgomery form, (rounds, L, t, 1) for scanning
        rc = F.from_ints_np(
            np.array(params.round_constants, dtype=object))  # (L, rounds, t)
        self._rc = np.ascontiguousarray(
            np.moveaxis(rc, 1, 0))[..., None]                # (rounds, L, t, 1)
        if not params.near_mds:
            self._mds = F.from_ints_np(
                np.array(params.mds, dtype=object))          # (L, t, t)
        self._jit_cache = {}

    # -- traced building blocks -------------------------------------------
    def _sbox(self, x):
        """x^alpha by square-and-multiply unrolled over the (static) alpha."""
        F = self.F
        acc = x
        for b in bin(self.params.alpha)[3:]:
            acc = F.square(acc)
            if b == "1":
                acc = F.mul(acc, x)
        return acc

    def _mix(self, s):
        """s: (L, t, n).  Near-MDS forms are pure adds (poseidon.tcc:196-226);
        full MDS is a t x t field mat-vec."""
        F = self.F
        t = self.params.state_size
        if self.params.near_mds and t == 3:
            return jnp.stack([F.add(s[:, 0], s[:, 2]),
                              F.add(s[:, 0], s[:, 1]),
                              F.add(s[:, 1], s[:, 2])], axis=1)
        if self.params.near_mds and t == 4:
            tot = F.add(F.add(s[:, 0], s[:, 1]), F.add(s[:, 2], s[:, 3]))
            return jnp.stack([F.sub(tot, s[:, i]) for i in range(4)], axis=1)
        mds = jnp.asarray(self._mds)
        rows = []
        for i in range(t):
            acc = F.mul(mds[:, i, 0, None], s[:, 0])
            for j in range(1, t):
                acc = F.add(acc, F.mul(mds[:, i, j, None], s[:, j]))
            rows.append(acc)
        return jnp.stack(rows, axis=1)

    def permute(self, state):
        """(L, t, n) -> (L, t, n), pure jnp (callable under jit/shard_map)."""
        F = self.F
        t = self.params.state_size
        half = self.params.full_rounds // 2
        rc = jnp.asarray(self._rc)

        def full_body(s, rcs):
            s = F.add(s, jnp.broadcast_to(rcs, s.shape).astype(jnp.uint32))
            s = self._sbox(s.reshape(F.L, -1)).reshape(s.shape)
            return self._mix(s), None

        def partial_body(s, rcs):
            s = F.add(s, jnp.broadcast_to(rcs, s.shape).astype(jnp.uint32))
            last = self._sbox(s[:, t - 1])
            s = jnp.concatenate([s[:, :t - 1], last[:, None]], axis=1)
            return self._mix(s), None

        r0, r1 = half, half + self.params.partial_rounds
        state, _ = jax.lax.scan(full_body, state, rc[:r0])
        state, _ = jax.lax.scan(partial_body, state, rc[r0:r1])
        state, _ = jax.lax.scan(full_body, state, rc[r1:])
        return state

    # -- jitted drivers ----------------------------------------------------
    def _get(self, key, builder):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = jax.jit(builder())
        return fn

    def hash_columns(self, cols):
        """cols: (L, k, n) Montgomery elements (k per leaf, n leaves) ->
        (L, n) digests.  Reference sponge semantics: rate-sized chunks
        added into state[0:rate] with a permutation between chunks, one
        final permutation for the squeeze."""
        k = cols.shape[1]
        rate = self.params.rate
        t = self.params.state_size

        def builder():
            def run(c):
                n = c.shape[-1]
                state = jnp.zeros((self.F.L, t, n), dtype=jnp.uint32)
                for start in range(0, k, rate):
                    if start > 0:
                        state = self.permute(state)
                    chunk = c[:, start:start + rate]
                    w = chunk.shape[1]
                    state = jnp.concatenate(
                        [self.F.add(state[:, :w], chunk), state[:, w:]],
                        axis=1)
                state = self.permute(state)  # squeeze
                return state[:, 0]
            return run

        return self._get(("leaf", k, cols.shape[-1]), builder)(cols)

    def two_to_one_columns(self, left, right):
        """left/right: (L, n) digests -> (L, n) parents (SET state[0..1],
        one permutation, algebraic_sponge.tcc:263-272)."""
        t = self.params.state_size

        def builder():
            def run(l, r):
                n = l.shape[-1]
                pad = jnp.zeros((self.F.L, t - 2, n), dtype=jnp.uint32)
                state = jnp.concatenate([l[:, None], r[:, None], pad], axis=1)
                return self.permute(state)[:, 0]
            return run

        return self._get(("node", left.shape[-1]), builder)(left, right)


class PoseidonHashing:
    """Bytes-interface hash suite (duck-type peer of Blake2bHashing): digests
    are canonically-serialized field elements, little-endian."""

    algebraic = True

    #: below this many leaves the host-int path avoids device compiles
    _BATCH_MIN = 64

    def __init__(self, F: PrimeField, security_bits: int = 128,
                 variant: str = "poseidon"):
        self.F = F
        self.params = PoseidonParams.for_field(F, variant, security_bits)
        self.name = variant
        self.security_bits = security_bits
        self.digest_bytes = F.elem_bytes
        self.salt_bytes = F.elem_bytes
        self._batched: Optional[BatchedPoseidon] = None

    def _bytes_to_elements(self, data: bytes) -> List[int]:
        eb = self.F.elem_bytes
        if len(data) % eb:
            data = data + b"\x00" * (eb - len(data) % eb)
        return [int.from_bytes(data[i:i + eb], "little") % self.F.p
                for i in range(0, len(data), eb)]

    def _elem_to_bytes(self, v: int) -> bytes:
        return int(v).to_bytes(self.F.elem_bytes, "little")

    def hash_elements(self, values: Sequence[int]) -> int:
        """Leaf hash over field elements (algebraic_leafhash::hash,
        algebraic_sponge.tcc:224-231)."""
        sponge = AlgebraicSponge(self.params)
        sponge.absorb(values)
        return sponge.squeeze(1)[0]

    def leaf_hash(self, data: bytes) -> bytes:
        return self._elem_to_bytes(self.hash_elements(
            self._bytes_to_elements(data)))

    def two_to_one(self, left: bytes, right: bytes) -> bytes:
        """One permutation per node (algebraic_two_to_one_hash::hash,
        algebraic_sponge.tcc:263-272): SET state[0..1], squeeze."""
        l_val = int.from_bytes(left, "little") % self.F.p
        r_val = int.from_bytes(right, "little") % self.F.p
        out = self.params.permute([l_val, r_val]
                                  + [0] * (self.params.state_size - 2))
        return self._elem_to_bytes(out[0])

    # -- device-batched layer hashing (TPU hot path) ------------------------
    def _batch(self) -> BatchedPoseidon:
        if self._batched is None:
            self._batched = BatchedPoseidon(self.params)
        return self._batched

    def _blocks_to_mont(self, blocks: Sequence[bytes]):
        """Equal-length leaf blocks -> (L, k, n) Montgomery device array.
        Leaf bytes ARE canonical little-endian limbs (our serialization
        format), so the parse is one vectorized frombuffer + one device
        mul by R^2 — no per-element Python bigint work."""
        F = self.F
        eb = F.elem_bytes
        blen = len(blocks[0])
        if blen % eb:
            pad = eb - blen % eb
            blocks = [b + b"\x00" * pad for b in blocks]
            blen += pad
        k = blen // eb
        raw = b"".join(blocks)
        arr = np.frombuffer(raw, dtype="<u2").reshape(len(blocks), k, F.L)
        limbs = jnp.asarray(
            np.ascontiguousarray(arr.transpose(2, 1, 0)).astype(np.uint32))
        return self._mont_in(limbs)

    @property
    def _mont_in(self):
        fn = getattr(self, "_mont_in_fn", None)
        if fn is None:
            fn = self._mont_in_fn = jax.jit(self.F.from_canonical_limbs)
        return fn

    def _digests_to_bytes(self, digests) -> List[bytes]:
        """(L, n) Montgomery digests -> list of canonical digest bytes."""
        F = self.F
        canon = getattr(self, "_canon_fn", None)
        if canon is None:
            canon = self._canon_fn = jax.jit(F.to_canonical_limbs)
        raw = F.canonical_to_bytes(canon(digests))
        eb = F.elem_bytes
        return [raw[i * eb:(i + 1) * eb] for i in range(digests.shape[-1])]

    #: batch widths are bucketed (powers of 4, capped) so each op compiles
    #: at most len(_BUCKETS) times total instead of once per tree layer
    _BUCKETS = (64, 256, 1024, 4096, 16384)

    def _chunks(self, n: int):
        """Yield (start, count, padded_width) covering [0, n)."""
        cap = self._BUCKETS[-1]
        start = 0
        while start < n:
            count = min(cap, n - start)
            width = next(b for b in self._BUCKETS if count <= b)
            yield start, count, width
            start += count

    def leaf_hash_batch(self, blocks: Sequence[bytes]) -> List[bytes]:
        if len(blocks) < self._BATCH_MIN or \
                any(len(b) != len(blocks[0]) for b in blocks):
            return [self.leaf_hash(b) for b in blocks]
        cols = self._blocks_to_mont(blocks)               # (L, k, n)
        n = cols.shape[-1]
        bp = self._batch()
        out: List[bytes] = []
        for start, count, width in self._chunks(n):
            chunk = cols[:, :, start:start + count]
            if width != count:
                chunk = jnp.pad(chunk, [(0, 0), (0, 0), (0, width - count)])
            out.extend(self._digests_to_bytes(
                bp.hash_columns(chunk))[:count])
        return out

    def tree_layer(self, digests: Sequence[bytes]) -> List[bytes]:
        if len(digests) < 2 * self._BATCH_MIN:
            return [self.two_to_one(digests[2 * i], digests[2 * i + 1])
                    for i in range(len(digests) // 2)]
        F = self.F
        raw = b"".join(digests)
        arr = np.frombuffer(raw, dtype="<u2").reshape(len(digests), F.L)
        limbs = jnp.asarray(
            np.ascontiguousarray(arr.T).astype(np.uint32))    # (L, n)
        mont = self._mont_in(limbs)
        left, right = mont[:, 0::2], mont[:, 1::2]
        n = left.shape[-1]
        bp = self._batch()
        out: List[bytes] = []
        for start, count, width in self._chunks(n):
            l = left[:, start:start + count]
            r = right[:, start:start + count]
            if width != count:
                l = jnp.pad(l, [(0, 0), (0, width - count)])
                r = jnp.pad(r, [(0, 0), (0, width - count)])
            out.extend(self._digests_to_bytes(
                bp.two_to_one_columns(l, r))[:count])
        return out


class PoseidonHashchain:
    """Fiat–Shamir hashchain over the algebraic sponge (algebraic_hashchain,
    algebraic_sponge.tcc:137-210 — same method surface as Blake2bHashchain)."""

    def __init__(self, F: PrimeField, security_bits: int = 128,
                 variant: str = "poseidon"):
        self.F = F
        self.params = PoseidonParams.for_field(F, variant, security_bits)
        self.sponge = AlgebraicSponge(self.params)
        self.digest_bytes = F.elem_bytes

    @property
    def state(self) -> bytes:
        return b"".join(int(v).to_bytes(self.F.elem_bytes, "little")
                        for v in self.sponge.state)

    def absorb_bytes(self, data: bytes):
        eb = self.F.elem_bytes
        vals = [int.from_bytes(data[i:i + eb], "little") % self.F.p
                for i in range(0, len(data), eb)]
        if not vals:
            vals = [0]
        self.sponge.absorb(vals)

    def absorb_root(self, root: bytes):
        self.sponge.absorb([int.from_bytes(root, "little") % self.F.p])

    def absorb_field_elements(self, values: Sequence[int]):
        self.sponge.absorb([0] + [int(v) % self.F.p for v in values])

    def squeeze_field_elements(self, n: int) -> List[int]:
        return self.sponge.squeeze(n)

    def squeeze_query_positions(self, n: int, domain_size: int) -> List[int]:
        """Least-significant 64-bit word of each squeezed element, reduced
        mod the range (algebraic_sponge.tcc:188-205 +
        libff get_word_of_field_elem semantics)."""
        mask = (1 << 64) - 1
        return [(v & mask) % domain_size for v in self.sponge.squeeze(n)]
