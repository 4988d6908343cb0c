"""Evaluation domains: multiplicative cosets (and, later, affine subspaces).

TPU-native counterpart of the reference's ``field_subset`` /
``multiplicative_coset`` (libiop/algebra/field_subset/field_subset.hpp:18-68,
subgroup.tcc:100-260).  Semantics preserved exactly (protocol layouts depend
on them):

* elements are enumerated in natural power order: ``shift * g^k``
  (subgroup.tcc:222-233 ``all_elements``);
* a size-c coset inside a domain of size N occupies the *strided* positions
  ``position = coset_index + intra_coset_index * (N/c)``
  (subgroup.tcc:178-198) — so FRI's per-coset fold is a plain
  ``reshape(c, N/c)`` over natural-order evaluations, no gathers;
* ``reindex_by_subgroup`` maps subgroup-local indices into the containing
  domain (subgroup.tcc:147-174).

Index arithmetic is trace-time host math (pure ints); element *data* lives on
device as cached Montgomery limb arrays computed by a log-depth powers kernel.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.prime import PrimeField


import functools


_HOST_POWERS_CACHE: dict = {}
_HOST_POWERS_CACHE_BYTES = [0]
_HOST_POWERS_CACHE_CAP = 4 << 30  # 4 GiB of power tables, FIFO-evicted


def host_powers(F: PrimeField, x_int: int, n: int, start: int = 1):
    """[start * x^k, k < n] as a (L, n) Montgomery limb NUMPY array, computed
    host-side with Python ints (zero XLA compile cost; cache-safe).

    Globally memoized by VALUE (field, x, n, start): domains are rebuilt per
    prover instance but their power tables are identical — recomputing them
    cost ~0.16 s per 2^14 prove (cProfile round 4)."""
    p = F.p
    key = (F.name, x_int % p, n, start % p)
    cached = _HOST_POWERS_CACHE.get(key)
    if cached is not None:
        return cached
    eb = 2 * F.L
    acc = (start % p) * F.R % p  # Montgomery form of start
    x_int %= p
    buf = bytearray(n * eb)
    for j in range(n):
        buf[j * eb:(j + 1) * eb] = acc.to_bytes(eb, "little")
        acc = acc * x_int % p
    arr = np.frombuffer(bytes(buf), dtype="<u2").reshape(n, F.L)
    out = arr.T.astype(np.uint32)  # numpy: cache-safe inside jit traces
    out.setflags(write=False)
    while _HOST_POWERS_CACHE_BYTES[0] + out.nbytes > _HOST_POWERS_CACHE_CAP \
            and _HOST_POWERS_CACHE:
        oldest = next(iter(_HOST_POWERS_CACHE))
        _HOST_POWERS_CACHE_BYTES[0] -= _HOST_POWERS_CACHE.pop(oldest).nbytes
    _HOST_POWERS_CACHE[key] = out
    _HOST_POWERS_CACHE_BYTES[0] += out.nbytes
    return out


def _powers_doubling(F: PrimeField, x, n: int):
    out = F.ones((1,))
    s = x.reshape(F.L, 1)
    while out.shape[1] < n:
        out = jnp.concatenate([out, F.mul(out, s)], axis=1)
        s = F.square(s)
    return out


@functools.partial(jax.jit, static_argnums=(0, 2))
def device_powers(F: PrimeField, x, n: int):
    """[x^0, x^1, ..., x^{n-1}] as (L, n) Montgomery limbs.

    Two-level construction keeps the traced graph small for large n:
    A = powers(x, K) and B = powers(x^K, n/K) by log-depth doubling on
    sqrt-sized arrays, then W[jK+i] = B[j] * A[i] via one broadcast multiply.
    """
    assert n >= 1 and (n & (n - 1)) == 0
    if n <= 256:
        return _powers_doubling(F, x, n)
    log_n = n.bit_length() - 1
    K = 1 << (log_n // 2)
    A = _powers_doubling(F, x, K)                      # (L, K)
    xK = A[:, -1:]
    xK = F.mul(xK, x.reshape(F.L, 1))                  # x^K
    B = _powers_doubling(F, xK.reshape(F.L), n // K)   # (L, n/K)
    W = F.mul(B[:, :, None], A[:, None, :])            # (L, n/K, K)
    return W.reshape(F.L, n)


def bitrev_permutation(n: int) -> np.ndarray:
    """Static bit-reversal index array for size n = 2^k."""
    k = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


class MultiplicativeCoset:
    """The coset ``shift * <g>`` of order 2^dim, g a fixed 2^dim-th root of
    unity derived from the field's canonical 2-adic root.

    ``shift`` and ``g`` are canonical Python ints (host/trace-time); cached
    device arrays hold Montgomery limb data.
    """

    kind = "multiplicative_coset"

    def __init__(self, field: PrimeField, dim: int, shift: int = 1,
                 generator: Optional[int] = None):
        assert dim <= field.two_adicity, (
            f"domain dim {dim} exceeds 2-adicity {field.two_adicity}")
        self.field = field
        self.dim = dim
        self.order = 1 << dim
        self.shift = shift % field.p
        if generator is None:
            generator = pow(field.root_of_unity,
                            1 << (field.two_adicity - dim), field.p)
        self.g = generator
        self._gen_powers = None       # (L, order) device cache: g^k
        self._inv_gen_powers = None   # (L, order) device cache: g^-k
        self._elements = None         # (L, order) device cache: shift * g^k
        self._shift_pow = None        # (L, order) device cache: shift^k
        self._inv_shift_pow = None    # (L, order) device cache: shift^-k

    # -- identity / hashing (used as dict keys by the IOP runtime) ---------
    def _key(self):
        return (self.field.name, self.dim, self.shift, self.g)

    def __eq__(self, other):
        return isinstance(other, MultiplicativeCoset) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        return f"MultCoset(dim={self.dim}, shift={self.shift % 997}..., field={self.field.name})"

    # -- element access ----------------------------------------------------
    def num_elements(self) -> int:
        return self.order

    def generator_powers(self):
        """(L, order) device array of g^k, k = 0..order-1 (Montgomery)."""
        if self._gen_powers is None:
            self._gen_powers = host_powers(self.field, self.g, self.order)
        return self._gen_powers

    def elements(self):
        """(L, order) array of shift*g^k (Montgomery), natural order."""
        if self._elements is None:
            if self.shift == 1:
                self._elements = self.generator_powers()
            else:
                self._elements = host_powers(self.field, self.g, self.order,
                                             start=self.shift)
        return self._elements

    def inverse_generator_powers(self):
        """(L, order) device array of g^-k (Montgomery)."""
        if self._inv_gen_powers is None:
            self._inv_gen_powers = host_powers(
                self.field, pow(self.g, self.field.p - 2, self.field.p), self.order)
        return self._inv_gen_powers

    def shift_powers(self):
        """(L, order) device array of shift^k (Montgomery)."""
        if self._shift_pow is None:
            self._shift_pow = host_powers(self.field, self.shift, self.order)
        return self._shift_pow

    def inverse_shift_powers(self):
        """(L, order) device array of shift^-k (Montgomery)."""
        if self._inv_shift_pow is None:
            self._inv_shift_pow = host_powers(
                self.field, pow(self.shift, self.field.p - 2, self.field.p), self.order)
        return self._inv_shift_pow

    def inverse_elements(self):
        """(L, order) array of 1/(shift*g^k) (Montgomery); cached numpy."""
        if getattr(self, "_inv_elements", None) is None:
            F = self.field
            self._inv_elements = host_powers(
                F, pow(self.g, F.p - 2, F.p), self.order,
                start=pow(self.shift, F.p - 2, F.p))
        return self._inv_elements

    def element_by_index_int(self, index: int) -> int:
        """Canonical int value of the element at ``index`` (host math)."""
        return (self.shift * pow(self.g, index, self.field.p)) % self.field.p

    # -- index arithmetic (reference subgroup.tcc:147-198) -----------------
    def reindex_by_subgroup(self, subgroup_dim: int, index: int) -> int:
        order_s = 1 << subgroup_dim
        order_g_over_s = 1 << (self.dim - subgroup_dim)
        if index < order_s:
            return index * order_g_over_s
        i = index - order_s
        x = order_g_over_s - 1
        return i + (i // x) + 1

    def coset_index(self, position: int, coset_size: int) -> int:
        return position % (self.order // coset_size)

    def intra_coset_index(self, position: int, coset_size: int) -> int:
        return position // (self.order // coset_size)

    def position_by_coset_indices(self, coset_index: int,
                                  intra_coset_index: int, coset_size: int) -> int:
        return coset_index + intra_coset_index * (self.order // coset_size)

    # -- subdomains (reference field_subset.tcc get_subset_of_order) -------
    def get_subset_of_order(self, order: int) -> "MultiplicativeCoset":
        """Subset coset of the given order: same shift, generator g^(N/order).

        As a point set this is {shift * h^j} for h the order-``order`` root;
        its elements sit at strided positions k*(N/order) of this domain.
        """
        assert order <= self.order and (order & (order - 1)) == 0
        dim = order.bit_length() - 1
        g_sub = pow(self.g, self.order // order, self.field.p)
        return MultiplicativeCoset(self.field, dim, self.shift, g_sub)

    def unshifted_subgroup(self) -> "MultiplicativeCoset":
        return MultiplicativeCoset(self.field, self.dim, 1, self.g)
