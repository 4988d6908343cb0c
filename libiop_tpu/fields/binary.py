"""Binary extension fields GF(2^k), k in {64, 128, 192, 256}.

Counterpart of libff's gf64/gf128/gf192/gf256 (SURVEY.md §2.1) with the
standard low-weight reduction pentanomials:
    gf64 : x^64  + x^4  + x^3 + x + 1
    gf128: x^128 + x^7  + x^2 + x + 1
    gf192: x^192 + x^7  + x^2 + x + 1
    gf256: x^256 + x^10 + x^5 + x^2 + 1

TPU-native design: an element batch is a ``uint32`` array of shape
``(W, *batch)`` (words-first, W = k/32, bit j of word i = coefficient of
x^{32i+j}).  TPUs have no carry-less multiply, so:

* ``mul`` is a bit-serial shift-and-xor over the 2W-word product accumulator,
  expressed as one ``lax.scan`` over the k bits of the left operand — k steps
  of O(W) full-width vector ops, O(1) graph size;
* reduction folds the high words through the pentanomial taps in two passes
  (word-level shifts, no data-dependent control flow);
* ``square`` spreads bits via log-step mask-shift networks (no multiplies);
* ``inv`` is Fermat (x^(2^k-2)) via square-and-multiply over the fixed
  exponent pattern — k-1 squarings and k-1 multiplies, fully data-parallel.

Addition is XOR; the field has characteristic 2 (``kind = "additive"``).
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .autojit import autojit


#: "parallel" (CLMUL-emulation, big graph, fast runtime — the TPU production
#: path) or "scan" (k-step lax.scan, O(1) graph — cheap XLA-CPU compiles for
#: the test suite).  Results are bit-identical; see BinaryField.mul.
_MUL_MODE = "parallel"


def _int_to_words(x: int, W: int) -> np.ndarray:
    out = np.zeros(W, dtype=np.uint32)
    for i in range(W):
        out[i] = (x >> (32 * i)) & 0xFFFFFFFF
    assert x >> (32 * W) == 0
    return out


class BinaryField:
    kind = "additive"

    def __init__(self, k: int, taps: Sequence[int], name: str):
        assert k % 32 == 0
        self.k = k
        self.bits = k
        self.W = k // 32
        #: number of leading "limb rows" in the array layout (API parity with
        #: PrimeField.L)
        self.L = self.W
        self.taps = tuple(sorted(taps))  # low-order exponents, excluding x^k
        assert max(self.taps) < 32
        self.name = name
        self.elem_bytes = k // 8
        self.extension_degree = k  # over F2
        #: modulus as an int (x^k + sum taps)
        self.modulus_int = (1 << k) | sum(1 << t for t in self.taps)
        self.j = _JittedOps(self)

    # -- host conversions --------------------------------------------------
    def from_ints_np(self, xs, shape=None) -> np.ndarray:
        """Cache-safe NUMPY variant (see PrimeField.from_ints_np)."""
        arr = np.asarray(xs, dtype=object)
        if shape is None:
            shape = arr.shape
        flat = arr.reshape(-1)
        out = np.zeros((self.W, flat.size), dtype=np.uint32)
        for idx, v in enumerate(flat):
            out[:, idx] = _int_to_words(int(v), self.W)
        return out.reshape((self.W,) + tuple(shape))

    def from_ints(self, xs, shape=None) -> jax.Array:
        return jnp.asarray(self.from_ints_np(xs, shape))

    def to_ints(self, words) -> np.ndarray:
        from ..parallel.mesh import device_fetch
        arr = device_fetch(words).astype(np.uint64)
        batch_shape = arr.shape[1:]
        flat = arr.reshape(self.W, -1)
        out = np.empty(flat.shape[1], dtype=object)
        for idx in range(flat.shape[1]):
            x = 0
            for i in range(self.W):
                x |= int(flat[i, idx]) << (32 * i)
            out[idx] = x
        return out.reshape(batch_shape)

    def to_int(self, words) -> int:
        return int(self.to_ints(words).reshape(-1)[0])

    def zeros(self, shape=()) -> jax.Array:
        return jnp.zeros((self.W,) + tuple(shape), dtype=jnp.uint32)

    def ones(self, shape=()) -> jax.Array:
        z = np.zeros((self.W,) + (1,) * len(tuple(shape)), np.uint32)
        z[0] = 1
        return jnp.broadcast_to(jnp.asarray(z), (self.W,) + tuple(shape)
                                ).astype(jnp.uint32)

    def random_ints(self, n: int, rng: np.random.Generator | None = None):
        """n uniform field elements as Python ints (exact k-bit draws)."""
        rng = rng or np.random.default_rng()
        raw = rng.bytes(n * self.elem_bytes)
        eb = self.elem_bytes
        return [int.from_bytes(raw[k * eb:(k + 1) * eb], "little")
                for k in range(n)]

    def random(self, shape=(), rng: np.random.Generator | None = None) -> jax.Array:
        n = int(np.prod(shape)) if shape else 1
        vals = self.random_ints(n, rng)
        return self.from_ints(np.array(vals, dtype=object).reshape(shape or ()))

    # -- host int arithmetic (field-generic interface shared with
    # PrimeField, for pointwise verifier math) -----------------------------
    @property
    def field_size(self) -> int:
        return 1 << self.k

    def add_ints(self, a: int, b: int) -> int:
        return a ^ b

    def sub_ints(self, a: int, b: int) -> int:
        return a ^ b

    def neg_int(self, a: int) -> int:
        return a

    def pow_int(self, a: int, e: int) -> int:
        result = 1
        base = a
        while e:
            if e & 1:
                result = self.mul_ints(result, base)
            base = self.mul_ints(base, base)
            e >>= 1
        return result

    def sample_int(self, x: int) -> int:
        return x & ((1 << self.k) - 1)

    def mul_ints(self, a: int, b: int) -> int:
        res = 0
        while b:
            if b & 1:
                res ^= a
            b >>= 1
            a <<= 1
            if a >> self.k & 1:
                a ^= self.modulus_int
        # ensure full reduction (a may exceed k bits transiently only by shift)
        return res if res < (1 << self.k) else self._reduce_int(res)

    def _reduce_int(self, x: int) -> int:
        while x.bit_length() > self.k:
            shift = x.bit_length() - 1 - self.k
            x ^= self.modulus_int << shift
        return x

    def inv_int(self, a: int) -> int:
        assert a != 0
        # Fermat: a^(2^k - 2)
        result = 1
        base = a
        e = (1 << self.k) - 2
        while e:
            if e & 1:
                result = self.mul_ints(result, base)
            base = self.mul_ints(base, base)
            e >>= 1
        return result

    # -- ring ops (device) -------------------------------------------------
    def add(self, a, b):
        return a ^ b

    def sub(self, a, b):
        return a ^ b

    def neg(self, a):
        return a

    def _shift_left_1(self, t):
        """Shift a (2W, *batch) word array left by one bit (poly * x)."""
        carry = t >> 31
        shifted = t << 1
        shifted = shifted.at[1:].set(shifted[1:] | carry[:-1])
        return shifted

    def _reduce(self, t):
        """Reduce a (2W, *batch) product accumulator mod the pentanomial:
        x^{k + 32i + j} = x^{32i + j} * sum_t x^t.  Two word-level passes —
        the second folds the <= max(tap) overflow bits that land in word W."""
        W = self.W
        for _ in range(2):
            hi = t[W:]
            t = t.at[W:].set(jnp.zeros_like(hi))
            lo = t[:W]
            over_top = jnp.zeros_like(t[W])
            for tap in self.taps:
                if tap == 0:
                    lo = lo ^ hi
                else:
                    lo = lo ^ (hi << tap)
                    over = hi >> (32 - tap)
                    lo = lo.at[1:].set(lo[1:] ^ over[:-1])
                    over_top = over_top ^ over[-1]
            t = t.at[:W].set(lo)
            t = t.at[W].set(over_top)
        return t[:W]

    @staticmethod
    def _clmul16(xa_parts, yb_parts):
        """Carry-less 16x16 -> 32 product from pre-split 4-spaced nibble
        parts: xa_parts[m] has bits only at positions = m (mod 4).

        Integer multiplication computes the carry-less product exactly on the
        bit positions = (m+n) mod 4: column sums are <= 4, so carries stay
        inside the 3-bit gaps and are masked away (the classic CLMUL-via-
        integer-multiply emulation — TPU has no carry-less multiply unit, but
        its VPU does full-width 32-bit multiplies)."""
        # each SINGLE product has column sums <= 4 (fits the 3-bit gap);
        # summing several products before masking could reach 16 and spill
        # into the next valid bit position, so mask per product and XOR
        out = None
        for m in range(4):
            for n in range(4):
                t = (xa_parts[m] * yb_parts[n]) \
                    & jnp.uint32(0x11111111 << ((m + n) & 3))
                out = t if out is None else out ^ t
        return out

    @staticmethod
    def _split4(h):
        """Split a 16-bit-valued array into its four 4-spaced bit planes."""
        return [h & jnp.uint32(0x1111 << m) for m in range(4)]

    @autojit
    def mul(self, a, b):
        """Carry-less product + reduction.  Two trace modes (identical math,
        bit-identical results):

        * "parallel" (default, the TPU production path): the k-bit operands
          are split into 16-bit halves; all half-pair products are computed by
          the integer-multiply CLMUL emulation and XOR-folded into the 2W-word
          accumulator.  O((k/16)^2) independent elementwise ops that XLA fuses
          into one VPU kernel — ~8x faster compiled than the scan.
        * "scan": the classic k-step shift-and-xor as one lax.scan — O(1)
          graph size.  The parallel path inlines hundreds of ops per mul,
          which makes XLA-CPU's LLVM compiles of large fused prover graphs
          take minutes on small hosts; the test suite selects this mode
          (tests/conftest.py) and test_binary_fields.py pins scan==parallel.
        """
        if _MUL_MODE == "scan":
            return self._mul_scan(a, b)
        W = self.W
        H = 2 * W  # number of 16-bit halves
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a = jnp.broadcast_to(a, (W,) + batch).astype(jnp.uint32)
        b = jnp.broadcast_to(b, (W,) + batch).astype(jnp.uint32)
        mask16 = jnp.uint32(0xFFFF)
        a_halves = []
        b_halves = []
        for w in range(W):
            a_halves.append(self._split4(a[w] & mask16))
            a_halves.append(self._split4(a[w] >> 16))
            b_halves.append(self._split4(b[w] & mask16))
            b_halves.append(self._split4(b[w] >> 16))
        # g[s] = XOR of clmul16(a_i, b_j) over i+j == s; occupies bits
        # [16s, 16s+32) of the 2k-bit carry-less product
        g = [None] * (2 * H - 1)
        for i in range(H):
            for j in range(H):
                c = self._clmul16(a_halves[i], b_halves[j])
                s = i + j
                g[s] = c if g[s] is None else g[s] ^ c
        # fold the 16-bit-aligned groups into 32-bit product words
        zero = jnp.zeros(batch, dtype=jnp.uint32)
        words = []
        for m in range(2 * W):
            t = g[2 * m] if 2 * m < len(g) else zero
            if 2 * m - 1 >= 0:
                t = t ^ (g[2 * m - 1] >> 16)
            if 2 * m + 1 < len(g):
                t = t ^ (g[2 * m + 1] << 16)
            words.append(t)
        return self._reduce(jnp.stack(words))

    def _mul_scan(self, a, b):
        """Bit-serial carry-less multiply as one lax.scan over the k bits of
        ``a``: step s XORs (bit_s(a) ? b * x^s : 0) into the 2W-word
        accumulator, carrying b * x^s by one left shift per step.  O(W) ops
        per step, O(1) traced graph."""
        W = self.W
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a = jnp.broadcast_to(a, (W,) + batch).astype(jnp.uint32)
        b = jnp.broadcast_to(b, (W,) + batch).astype(jnp.uint32)
        acc0 = jnp.zeros((2 * W,) + batch, dtype=jnp.uint32)
        b_ext = jnp.concatenate([b, jnp.zeros_like(b)], axis=0)

        def body(carry, s):
            acc, bs = carry
            word = jnp.take(a, s >> 5, axis=0)           # (batch,)
            bit = (word >> (s & 31).astype(jnp.uint32)) & jnp.uint32(1)
            acc = acc ^ (bs * bit[None, ...])
            return (acc, self._shift_left_1(bs)), None

        steps = jnp.arange(self.k, dtype=jnp.uint32)
        (acc, _), _ = jax.lax.scan(body, (acc0, b_ext), steps)
        return self._reduce(acc)

    @autojit
    def square(self, a):
        """Bit-spreading: interleave zeros between coefficients."""
        W = self.W
        batch = a.shape[1:]
        out = jnp.zeros((2 * W,) + batch, dtype=jnp.uint32)
        lo = a & jnp.uint32(0xFFFF)
        hi = a >> 16
        out = out.at[0:2 * W:2].set(self._spread16(lo))
        out = out.at[1:2 * W:2].set(self._spread16(hi))
        return self._reduce(out)

    @staticmethod
    def _spread16(x):
        """Spread the low 16 bits of each word across 32 bits (bit i -> 2i)."""
        x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
        x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
        x = (x | (x << 2)) & jnp.uint32(0x33333333)
        x = (x | (x << 1)) & jnp.uint32(0x55555555)
        return x

    @autojit
    def mul_scalar(self, a, s):
        s = s.reshape((self.W,) + (1,) * (a.ndim - 1))
        return self.mul(a, s)

    @autojit
    def segment_reduce(self, prod, seg_ids, num_segments: int):
        """XOR segment-reduce: prod (W, nnz) -> (W, num_segments).  TPU has
        no XOR segment primitive, so decompose into bit planes, integer
        segment-sum (counts), take parity, repack — all dense full-width."""
        W = self.W
        nnz = prod.shape[-1]
        shifts = jnp.arange(32, dtype=jnp.uint32)
        bits = (prod[:, None, :] >> shifts[None, :, None]) & jnp.uint32(1)
        bits = bits.reshape(W * 32, nnz)
        sums = jax.ops.segment_sum(bits.T, seg_ids, num_segments=num_segments)
        parity = (sums & 1).astype(jnp.uint32).T.reshape(W, 32, num_segments)
        weights = (jnp.uint32(1) << shifts).reshape(1, 32, 1)
        return jnp.sum(parity * weights, axis=1).astype(jnp.uint32)

    @autojit
    def pow_static(self, a, e: int):
        if e == 0:
            return self.ones(a.shape[1:])
        bits = [int(b) for b in bin(e)[2:]]
        bits_arr = jnp.asarray(np.array(bits, dtype=np.int32))

        def body(acc, bit):
            acc = self.square(acc)
            acc_mul = self.mul(acc, a)
            return jnp.where(bit == 1, acc_mul, acc), None

        out, _ = jax.lax.scan(body, self.ones(a.shape[1:]), bits_arr)
        return out

    def _pow_2exp(self, a, m: int):
        """a^(2^m): m squarings via scan (O(1) graph)."""
        if m == 0:
            return a

        def body(x, _):
            return self.square(x), None

        out, _ = jax.lax.scan(body, a, None, length=m)
        return out

    @autojit
    def inv(self, a):
        """Itoh–Tsujii inversion: a^(2^k-2) = (a^(2^(k-1)-1))^2 computed with
        ~log2(k)+popcount(k-1) multiplications (each mul is the expensive
        bit-serial scan) and k-1 cheap squarings — ~6x fewer muls than the
        naive Fermat square-and-multiply chain.  inv(0) = 0."""
        m = self.k - 1
        bits = bin(m)[2:]
        result = a          # a^(2^e - 1) with e = 1
        e = 1
        for bit in bits[1:]:
            result = self.mul(self._pow_2exp(result, e), result)  # e -> 2e
            e *= 2
            if bit == "1":
                result = self.mul(self.square(result), a)          # e -> e+1
                e += 1
        assert e == m
        return self.square(result)

    # -- predicates / misc -------------------------------------------------
    @autojit
    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    @autojit
    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    @autojit
    def select(self, pred, a, b):
        return jnp.where(pred[None, ...], a, b)

    # -- serialization (bit representation IS canonical) -------------------
    def to_canonical_limbs(self, a):
        return a

    def from_canonical_limbs(self, a):
        return a

    def canonical_to_bytes(self, canonical) -> bytes:
        from ..parallel.mesh import device_fetch
        arr = device_fetch(canonical).astype(np.uint32)
        flat = arr.reshape(self.W, -1).T  # (N, W) little-endian words
        return flat.astype('<u4').tobytes()


class _JittedOps:
    def __init__(self, F: BinaryField):
        self.add = jax.jit(F.add)
        self.sub = jax.jit(F.sub)
        self.mul = jax.jit(F.mul)
        self.square = jax.jit(F.square)
        self.inv = jax.jit(F.inv)


@functools.lru_cache(maxsize=None)
def gf64() -> BinaryField:
    return BinaryField(64, (4, 3, 1, 0), "gf64")


@functools.lru_cache(maxsize=None)
def gf128() -> BinaryField:
    return BinaryField(128, (7, 2, 1, 0), "gf128")


@functools.lru_cache(maxsize=None)
def gf192() -> BinaryField:
    return BinaryField(192, (7, 2, 1, 0), "gf192")


@functools.lru_cache(maxsize=None)
def gf256() -> BinaryField:
    return BinaryField(256, (10, 5, 2, 0), "gf256")
