"""Prime-field arithmetic on TPU: limb-decomposed Montgomery representation.

TPU-native design (not a port of libff's x86-asm ``Fp_model``):

* A batch of field elements is a single ``uint32`` array with shape
  ``(L, *batch)`` — **limbs first**, so that per-limb rows have the batch in
  the trailing (lane) dimension and every element-wise op runs at full VPU
  lane width.  L is the number of 16-bit limbs (12 for the 181-bit edwards
  scalar field, 16 for the 254-bit alt_bn128 scalar field).
* Limbs hold values < 2^16 in canonical state; intermediate accumulators
  exploit the 32-bit headroom so that carry propagation happens once per
  operation, not once per partial product.
* Values are kept in Montgomery form (x·R mod p, R = 2^(16·L)) on device;
  conversion happens only at serialization boundaries.
* Inversion is Fermat (x^(p-2)) via an exponent-bit scan — O(log p) muls but
  fully data-parallel, which beats the sequential Montgomery batch-inversion
  trick (reference: libiop/algebra/utils.hpp:16-40) on a 8x128-lane machine.

Role parity with the reference: libff ``Fp_model`` (see usage census in
SURVEY.md §2.1); ``power`` (libff) -> :meth:`PrimeField.pow_static`;
``batch_inverse`` (libiop/algebra/utils.hpp:27) -> :meth:`PrimeField.inv`.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .autojit import autojit

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

#: compile-light mode: express the Montgomery-mul limb loops as lax.scan
#: instead of unrolling them.  The arithmetic is IDENTICAL (same uint32
#: partial products and carries, so outputs are bit-identical); only the
#: graph shape changes: ~30 HLO ops per mul instead of ~200.  Used where
#: XLA *compile time* dominates (the 8-virtual-device CPU dryrun gate, CI):
#: the unrolled form stays the default because XLA fuses it into fewer,
#: wider kernels at runtime on TPU.  Toggle via env LIBIOP_TPU_COMPILE_LIGHT
#: or by setting this module global before tracing.
COMPILE_LIGHT = os.environ.get("LIBIOP_TPU_COMPILE_LIGHT") == "1"


def _int_to_limbs(x: int, L: int) -> np.ndarray:
    out = np.zeros(L, dtype=np.uint32)
    for i in range(L):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    assert x >> (LIMB_BITS * L) == 0, "value does not fit in L limbs"
    return out


def _limbs_to_int(limbs) -> int:
    x = 0
    for i, v in enumerate(np.asarray(limbs, dtype=np.uint64)):
        x += int(v) << (LIMB_BITS * i)
    return x


class PrimeField:
    """A prime field F_p with TPU-friendly batched limb arithmetic.

    All array arguments/returns are ``uint32`` arrays of shape ``(L, *batch)``
    (limbs-first).  All values are in Montgomery form unless a method says
    otherwise.  Methods are pure jnp and may be called under ``jax.jit``.
    """

    #: marker used by domain logic (mirrors libff field_type enum)
    kind = "multiplicative"

    def __init__(self, p: int, name: str, generator: int, two_adicity: int):
        self.p = p
        self.name = name
        self.bits = p.bit_length()
        self.L = -(-self.bits // LIMB_BITS)  # ceil
        L = self.L
        self.R = (1 << (LIMB_BITS * L)) % p
        self.R2 = (self.R * self.R) % p
        self.pinv16 = np.uint32((-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        self.p_limbs = _int_to_limbs(p, L)
        self.two_adicity = two_adicity
        self.multiplicative_generator = generator
        # 2^two_adicity-th root of unity (canonical int)
        self.root_of_unity = pow(generator, (p - 1) >> two_adicity, p)
        #: bytes per serialized element (canonical little-endian limbs)
        self.elem_bytes = 2 * L
        #: extension degree over the prime subfield (1: it *is* the prime field)
        self.extension_degree = 1
        #: jitted aliases for host-side (eager) callers; traced code should
        #: call the pure methods directly so XLA fuses across field ops.
        self.j = _JittedOps(self)

    # ------------------------------------------------------------------
    # host-side conversions
    # ------------------------------------------------------------------
    def from_ints_np(self, xs, shape=None) -> np.ndarray:
        """Canonical ints -> Montgomery limb array (L, *shape) as NUMPY.
        Safe to cache on long-lived objects (a jnp array created inside a jit
        trace is a tracer and must never be cached)."""
        arr = np.asarray(xs, dtype=object)
        if shape is None:
            shape = arr.shape
        flat = arr.reshape(-1)
        eb = self.elem_bytes
        buf = bytearray(flat.size * eb)
        p, R = self.p, self.R
        for k, v in enumerate(flat):
            buf[k * eb:(k + 1) * eb] = (int(v) * R % p).to_bytes(eb, "little")
        out = np.frombuffer(bytes(buf), dtype="<u2").reshape(flat.size, self.L)
        return out.T.astype(np.uint32).reshape((self.L,) + tuple(shape))

    def from_ints(self, xs, shape=None) -> jax.Array:
        """Canonical ints -> Montgomery limb array (L, *shape)."""
        return jnp.asarray(self.from_ints_np(xs, shape))

    def to_ints(self, limbs) -> np.ndarray:
        """Montgomery limb array -> canonical ints (object ndarray).

        One device mul (Montgomery -> canonical), one vectorized byte dump,
        then a C-speed int.from_bytes per element."""
        batch_shape = tuple(limbs.shape[1:])
        canon = self.to_canonical_limbs(limbs)
        raw = self.canonical_to_bytes(canon)
        eb = self.elem_bytes
        n = len(raw) // eb
        out = np.empty(n, dtype=object)
        for k in range(n):
            out[k] = int.from_bytes(raw[k * eb:(k + 1) * eb], "little")
        return out.reshape(batch_shape)

    def to_int(self, limbs) -> int:
        return int(self.to_ints(limbs).reshape(-1)[0])

    # -- host-int arithmetic (field-generic interface shared with
    # BinaryField, for pointwise verifier math) ---------------------------
    @property
    def field_size(self) -> int:
        return self.p

    def add_ints(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub_ints(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def neg_int(self, a: int) -> int:
        return (-a) % self.p

    def mul_ints(self, a: int, b: int) -> int:
        return a * b % self.p

    def pow_int(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def inv_int(self, a: int) -> int:
        return pow(a, self.p - 2, self.p)

    def sample_int(self, x: int) -> int:
        """Map a uniform integer (with slack bits) into the field."""
        return x % self.p

    def zeros(self, shape=()) -> jax.Array:
        return jnp.zeros((self.L,) + tuple(shape), dtype=jnp.uint32)

    def ones(self, shape=()) -> jax.Array:
        one = _int_to_limbs(self.R % self.p, self.L)
        return jnp.broadcast_to(
            jnp.asarray(one).reshape((self.L,) + (1,) * len(tuple(shape))),
            (self.L,) + tuple(shape)).astype(jnp.uint32)

    def random_ints(self, n: int, rng: np.random.Generator | None = None):
        """n statistically-uniform field elements as Python ints: each draw
        has >= 128 bits of modular-reduction slack (bias < 2^-128), matching
        the reference's full-width randombytes sampling (merkle_tree.tcc:37-67
        role)."""
        rng = rng or np.random.default_rng()
        nbytes = self.elem_bytes + 16
        raw = rng.bytes(n * nbytes)
        return [int.from_bytes(raw[k * nbytes:(k + 1) * nbytes], "little") % self.p
                for k in range(n)]

    def random(self, shape=(), rng: np.random.Generator | None = None) -> jax.Array:
        n = int(np.prod(shape)) if shape else 1
        ints = self.random_ints(n, rng)
        return self.from_ints(np.array(ints, dtype=object).reshape(shape or ()))

    # ------------------------------------------------------------------
    # limb helpers (trace-time, pure jnp)
    # ------------------------------------------------------------------
    def _unstack(self, a) -> list:
        return [a[i] for i in range(a.shape[0])]

    def _carry_canonicalize(self, t: Sequence[jax.Array]) -> list:
        """Propagate carries so every limb < 2^16. Input limbs < 2^32-headroom."""
        out = []
        c = None
        for v in t:
            if c is not None:
                v = v + c
            out.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        if c is not None:
            out.append(c)
        # drop trailing limb if provably zero not knowable at trace time; keep it
        return out

    def _cond_sub_p(self, t: Sequence[jax.Array]) -> list:
        """Given canonical limbs (len L or L+1, value < 2p), subtract p if >= p.

        Returns exactly L limbs.
        """
        L = self.L
        t = list(t)
        while len(t) < L + 1:
            t.append(jnp.zeros_like(t[0]))
        # compute t - p with borrow over int32
        borrow = jnp.zeros_like(t[0], dtype=jnp.int32)
        sub = []
        for i in range(L + 1):
            pi = np.int32(self.p_limbs[i]) if i < L else np.int32(0)
            d = t[i].astype(jnp.int32) - pi - borrow
            sub.append((d & LIMB_MASK).astype(jnp.uint32))
            borrow = (d >> 31) & 1  # 1 if d < 0
        ge = borrow == 0  # t >= p
        out = [jnp.where(ge, sub[i], t[i].astype(jnp.uint32)) for i in range(L)]
        return out

    # ------------------------------------------------------------------
    # ring ops
    # ------------------------------------------------------------------
    @autojit
    def add(self, a, b):
        t = [a[i] + b[i] for i in range(self.L)]
        t = self._carry_canonicalize(t)
        return jnp.stack(self._cond_sub_p(t))

    @autojit
    def sub(self, a, b):
        # a + p - b, limbs via int32 with arithmetic-shift borrow propagation
        t = [a[i].astype(jnp.int32) + np.int32(self.p_limbs[i]) - b[i].astype(jnp.int32)
             for i in range(self.L)]
        out = []
        c = jnp.zeros_like(t[0])
        for v in t:
            v = v + c
            out.append((v & LIMB_MASK).astype(jnp.uint32))
            c = v >> LIMB_BITS  # arithmetic shift: handles negative partials
        out.append(c.astype(jnp.uint32))  # in [0,1] since a+p-b in (0,2p)
        return jnp.stack(self._cond_sub_p(out))

    @autojit
    def neg(self, a):
        return self.sub(self.zeros(a.shape[1:]), a)

    # -- compile-light (scanned) Montgomery kernels ------------------------
    # Bit-identical to the unrolled forms below: same uint32 partial
    # products, masks and carries — only the loop over limbs becomes a
    # lax.scan, shrinking the traced graph ~7x (see COMPILE_LIGHT note).
    def _mont_reduce_rows_scan(self, t, batch):
        """Scanned version of the 16-bit-at-a-time Montgomery reduction loop
        shared by mul / mont_reduce_wide.  t: (2L+2, *batch) accumulator."""
        L = self.L
        nb = len(batch)
        zeros_row = jnp.zeros((1,) + batch, dtype=jnp.uint32)
        p_col = jnp.asarray(self.p_limbs).reshape((L,) + (1,) * nb)

        def body(tc, i):
            ti_full = jax.lax.dynamic_index_in_dim(tc, i, 0, keepdims=False)
            c = ti_full >> LIMB_BITS
            ti = ti_full & LIMB_MASK
            m = (ti * self.pinv16) & LIMB_MASK
            mp = m[None] * p_col
            lo = mp & LIMB_MASK
            hi = mp >> LIMB_BITS
            head = c + ((ti + lo[0]) >> LIMB_BITS)
            # rows i+1..i+L: head at i+1, lo[1:] at i+1..i+L-1, hi at i+1..i+L
            block = hi + jnp.concatenate([lo[1:], zeros_row], axis=0)
            block = block.at[0].add(head)
            start = (i + 1,) + (0,) * nb
            win = jax.lax.dynamic_slice(tc, start, (L,) + batch)
            return jax.lax.dynamic_update_slice(tc, win + block, start), None

        t, _ = jax.lax.scan(body, t, jnp.arange(L, dtype=jnp.int32))
        res = self._carry_canonicalize([t[k] for k in range(L, 2 * L + 2)])
        return jnp.stack(self._cond_sub_p(res[:L + 1]))

    def _mul_scan(self, a, b):
        L = self.L
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a = jnp.broadcast_to(a, (L,) + batch).astype(jnp.uint32)
        b = jnp.broadcast_to(b, (L,) + batch).astype(jnp.uint32)
        nb = len(batch)
        T = 2 * L + 2
        # derive the zero accumulator from BOTH inputs so its sharding/varying
        # axes match theirs under shard_map (scan carries must be type-stable)
        t = jnp.broadcast_to((a[:1] & 0) | (b[:1] & 0),
                             (T,) + batch).astype(jnp.uint32)
        zeros_row = jnp.zeros((1,) + batch, dtype=jnp.uint32)

        def body(tc, i):
            ai = jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
            pi = ai[None] * b
            block = (jnp.concatenate([pi & LIMB_MASK, zeros_row], axis=0)
                     + jnp.concatenate([zeros_row, pi >> LIMB_BITS], axis=0))
            start = (i,) + (0,) * nb
            win = jax.lax.dynamic_slice(tc, start, (L + 1,) + batch)
            return jax.lax.dynamic_update_slice(tc, win + block, start), None

        t, _ = jax.lax.scan(body, t, jnp.arange(L, dtype=jnp.int32))
        return self._mont_reduce_rows_scan(t, batch)

    @autojit
    def mul(self, a, b):
        """Montgomery product: a·b·R^{-1} mod p."""
        if COMPILE_LIGHT:
            return self._mul_scan(a, b)
        L = self.L
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        npad = len(batch)

        def _pad_rows(x, before, total):
            # place rows of x at offset `before` inside `total` rows (fusable
            # pad+add instead of scatter — XLA compiles this far faster)
            return jnp.pad(x, [(before, total - before - x.shape[0])]
                           + [(0, 0)] * npad)

        T = 2 * L + 2
        t = jnp.zeros((T,) + batch, dtype=jnp.uint32)
        # Tensorized schoolbook product, split-accumulate: O(L) tensor ops,
        # each at full VPU width over the batch. Column sums < 2^23, inside
        # the uint32 headroom, so carries propagate exactly once at the end.
        for i in range(L):
            pi = a[i][None] * b            # (L, *batch), < 2^32 exact
            t = t + _pad_rows(pi & LIMB_MASK, i, T)
            t = t + _pad_rows(pi >> LIMB_BITS, i + 1, T)
        # Montgomery reduction, 16 bits at a time
        p_col = jnp.asarray(self.p_limbs).reshape((L,) + (1,) * npad)
        for i in range(L):
            c = t[i] >> LIMB_BITS
            ti = t[i] & LIMB_MASK
            m = (ti * self.pinv16) & LIMB_MASK
            mp = m[None] * p_col           # (L, *batch)
            lo = mp & LIMB_MASK
            hi = mp >> LIMB_BITS
            head = (c + ((ti + lo[0]) >> LIMB_BITS))[None]
            t = t + _pad_rows(head, i + 1, T)
            t = t + _pad_rows(lo[1:], i + 1, T)
            t = t + _pad_rows(hi, i + 1, T)
        res = self._carry_canonicalize([t[k] for k in range(L, 2 * L + 2)])
        return jnp.stack(self._cond_sub_p(res[:self.L + 1]))

    @autojit
    def square(self, a):
        return self.mul(a, a)

    @autojit
    def mont_reduce_wide(self, t):
        """Montgomery-reduce a *lazy* limb accumulator: t is (K, *batch)
        uint32 with K <= 2L+2 columns, each column < 2^28 (e.g. the result of
        summing <= 2^12 canonical Montgomery values limb-wise).  Returns the
        canonical L-limb array of value(t) * R^{-1} mod p.

        This is the TPU replacement for sequential modular accumulation: sums
        (segment sums, linear combinations) accumulate limb-wise with no
        carries, and one wide reduction at the end folds everything mod p.
        """
        L = self.L
        K = t.shape[0]
        batch = t.shape[1:]
        npad = len(batch)
        T = 2 * L + 2
        if K < T:
            t = jnp.concatenate(
                [t, jnp.zeros((T - K,) + batch, dtype=jnp.uint32)], axis=0)
        if COMPILE_LIGHT:
            return self._mont_reduce_rows_scan(t, batch)

        def _pad_rows(x, before):
            return jnp.pad(x, [(before, T - before - x.shape[0])]
                           + [(0, 0)] * npad)

        p_col = jnp.asarray(self.p_limbs).reshape((L,) + (1,) * npad)
        for i in range(L):
            c = t[i] >> LIMB_BITS
            ti = t[i] & LIMB_MASK
            m = (ti * self.pinv16) & LIMB_MASK
            mp = m[None] * p_col
            lo = mp & LIMB_MASK
            hi = mp >> LIMB_BITS
            head = (c + ((ti + lo[0]) >> LIMB_BITS))[None]
            t = t + _pad_rows(head, i + 1)
            t = t + _pad_rows(lo[1:], i + 1)
            t = t + _pad_rows(hi, i + 1)
        res = self._carry_canonicalize([t[k] for k in range(L, 2 * L + 2)])
        return jnp.stack(self._cond_sub_p(res[:self.L + 1]))

    @autojit
    def lazy_sum_reduce(self, t):
        """Reduce a lazy limb-wise sum of Montgomery-form values back to a
        canonical Montgomery-form element: t (K, *batch) as in
        :meth:`mont_reduce_wide`. value(t) = S*R + c*p  =>  returns S*R mod p."""
        return self.from_canonical_limbs(self.mont_reduce_wide(t))

    @autojit
    def mul_scalar(self, a, s):
        """Multiply batch a (L, *batch) by a single element s (L,) or (L,1...)."""
        s = s.reshape((self.L,) + (1,) * (a.ndim - 1))
        return self.mul(a, s)

    @autojit
    def segment_reduce(self, prod, seg_ids, num_segments: int):
        """Segment-sum of field values: prod (L, nnz) -> (L, num_segments).
        Lazy limb accumulation (no per-term carries) + one wide Montgomery
        reduction (the TPU replacement for sequential modular accumulation)."""
        lazy = jax.ops.segment_sum(
            jnp.moveaxis(prod, 0, -1), seg_ids, num_segments=num_segments)
        lazy = jnp.moveaxis(lazy, -1, 0)
        return self.lazy_sum_reduce(lazy)

    # ------------------------------------------------------------------
    # exponentiation / inversion
    # ------------------------------------------------------------------
    @autojit
    def pow_static(self, a, e: int):
        """a^e for a *static* non-negative integer exponent (square & multiply
        via lax.scan over the exponent bits; graph size O(1) in e)."""
        if e == 0:
            return self.ones(a.shape[1:])
        bits = [int(b) for b in bin(e)[2:]]  # MSB first
        bits_arr = jnp.asarray(np.array(bits, dtype=np.int32))

        def body(acc, bit):
            acc = self.square(acc)
            acc_mul = self.mul(acc, a)
            acc = jnp.where(bit == 1, acc_mul, acc)
            return acc, None

        init = self.ones(a.shape[1:]) + (a[:1] & 0)  # inherit input sharding
        out, _ = jax.lax.scan(body, init, bits_arr)
        return out

    @autojit
    def inv(self, a):
        """Batched inversion via Fermat: a^(p-2). inv(0) = 0."""
        return self.pow_static(a, self.p - 2)

    @autojit
    def batch_inverse_and_mul(self, a, c):
        """inv(a) * c elementwise (reference: utils.hpp:31-36 batch_inverse_and_mul)."""
        return self.mul(self.inv(a), c)

    # ------------------------------------------------------------------
    # predicates / misc
    # ------------------------------------------------------------------
    @autojit
    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    @autojit
    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    @autojit
    def select(self, pred, a, b):
        """pred: (*batch,) bool; a,b: (L,*batch)."""
        return jnp.where(pred[None, ...], a, b)

    # ------------------------------------------------------------------
    # serialization (canonical form!)
    # ------------------------------------------------------------------
    @autojit
    def to_canonical_limbs(self, a):
        """Montgomery -> canonical-value limbs (device op): a·R^{-1} mod p."""
        one = jnp.zeros((self.L,) + (1,) * (a.ndim - 1), dtype=jnp.uint32
                        ).at[0].set(1)
        return self.mul(a, one)

    @autojit
    def from_canonical_limbs(self, a):
        r2 = jnp.asarray(_int_to_limbs(self.R2, self.L)).reshape(
            (self.L,) + (1,) * (a.ndim - 1))
        return self.mul(a, r2)

    def canonical_to_bytes(self, canonical) -> bytes:
        """Host: canonical limb array (L, N) -> little-endian bytes, elementwise
        contiguous (elem_bytes per element, elements in batch order)."""
        from ..parallel.mesh import device_fetch
        arr = device_fetch(canonical).astype(np.uint16)
        flat = arr.reshape(self.L, -1).T  # (N, L) little-endian 16-bit limbs
        return flat.astype('<u2').tobytes()


class _JittedOps:
    """Compiled-and-cached entry points over a PrimeField, for eager callers
    (tests, host-side verifier math).  One compile per op per shape."""

    def __init__(self, F: PrimeField):
        self._F = F
        self.add = jax.jit(F.add)
        self.sub = jax.jit(F.sub)
        self.mul = jax.jit(F.mul)
        self.neg = jax.jit(F.neg)
        self.square = jax.jit(F.square)
        self.inv = jax.jit(F.inv)
        self.lazy_sum_reduce = jax.jit(F.lazy_sum_reduce)
        self._pow_cache = {}

    def pow(self, a, e: int):
        fn = self._pow_cache.get(e)
        if fn is None:
            F = self._F
            fn = self._pow_cache[e] = jax.jit(lambda x: F.pow_static(x, e))
        return fn(a)


# ----------------------------------------------------------------------
# presets (constants verified with sympy; see SURVEY.md §2.1 for the role of
# libff's edwards_Fr / alt_bn128_Fr in the reference)
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def edwards_fr() -> PrimeField:
    """181-bit scalar field of the libff 'edwards' curve; 2-adicity 31."""
    p = 1552511030102430251236801561344621993261920897571225601
    return PrimeField(p, "edwards_Fr", generator=19, two_adicity=31)


@functools.lru_cache(maxsize=None)
def alt_bn128_fr() -> PrimeField:
    """254-bit scalar field of alt_bn128 (BN254); 2-adicity 28."""
    p = 21888242871839275222246405745257275088548364400416034343698204186575808495617
    return PrimeField(p, "alt_bn128_Fr", generator=5, two_adicity=28)
