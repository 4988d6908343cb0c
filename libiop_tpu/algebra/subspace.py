"""Affine subspace domains over GF(2^k) + the Gao–Mateer additive FFT.

Counterparts of libiop/algebra/field_subset/subspace.{hpp,tcc} and the
additive FFT/IFFT (libiop/algebra/fft.tcc:39-204):

* domains are F2-linear affine subspaces: basis (b_0..b_{m-1}) + shift, with
  elements enumerated by subset sums — with the standard polynomial basis
  (b_j = x^j, i.e. the ints 2^j), element(i) = shift XOR i;
* a size-c sub-coset (span of the first log c basis vectors) occupies
  CONSECUTIVE positions [j*c, (j+1)*c) — the additive counterpart of the
  multiplicative strided layout (bcs_common.tcc:646-676);
* the additive FFT follows the reference's structure exactly — per level:
  twist by beta powers, radix conversion (XOR butterflies), basis evolution
  beta -> beta^2 - beta, then an unwind with subset-sum tables — but every
  inner loop is a reshape + full-width vector op on the (W, n) word tensor.
  Stage tables (twist powers, subset sums) are host-precomputed per domain
  with int carry-less arithmetic and cached as device arrays.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.binary import BinaryField
from .domains import bitrev_permutation


def subset_sums_ints(F: BinaryField, basis: List[int], shift: int) -> List[int]:
    """All 2^len(basis) subset sums (XOR), subset-sum order (utils.hpp:22-28)."""
    out = [shift]
    for b in basis:
        out = out + [v ^ b for v in out]
    return out


class AffineSubspace:
    kind = "affine_subspace"

    def __init__(self, field: BinaryField, dim: int, shift: int = 0,
                 basis: Optional[List[int]] = None):
        assert dim <= field.k
        self.field = field
        self.dim = dim
        self.order = 1 << dim
        self.shift = shift
        self.basis = list(basis) if basis is not None else [1 << j for j in range(dim)]
        assert len(self.basis) == dim
        self._elements = None
        self._fft_tables = None
        self._ifft_tables = None

    # -- identity ----------------------------------------------------------
    def _key(self):
        return (self.field.name, self.dim, self.shift, tuple(self.basis))

    def __eq__(self, other):
        return isinstance(other, AffineSubspace) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        return f"AffineSubspace(dim={self.dim}, field={self.field.name})"

    # -- elements ----------------------------------------------------------
    def num_elements(self) -> int:
        return self.order

    def element_by_index_int(self, index: int) -> int:
        v = self.shift
        for j in range(self.dim):
            if (index >> j) & 1:
                v ^= self.basis[j]
        return v

    def elements(self):
        if self._elements is None:
            ints = subset_sums_ints(self.field, self.basis, self.shift)
            self._elements = self.field.from_ints_np(ints)
        return self._elements

    # -- index arithmetic (additive convention: cosets are contiguous) ------
    def reindex_by_subgroup(self, subspace_dim: int, index: int) -> int:
        return index  # the sub-subspace occupies the first 2^d indices

    def coset_index(self, position: int, coset_size: int) -> int:
        return position // coset_size

    def intra_coset_index(self, position: int, coset_size: int) -> int:
        return position % coset_size

    def position_by_coset_indices(self, coset_index: int,
                                  intra_coset_index: int, coset_size: int) -> int:
        return coset_index * coset_size + intra_coset_index

    def get_subset_of_order(self, order: int) -> "AffineSubspace":
        dim = order.bit_length() - 1
        return AffineSubspace(self.field, dim, self.shift, self.basis[:dim])


def _fft_stage_tables(domain: AffineSubspace):
    """Host-int precomputation of per-level twist powers, evolved bases and
    subset-sum tables (mirrors the scalar bookkeeping of fft.tcc:49-117)."""
    F = domain.field
    m = domain.dim
    n = domain.order
    betas = list(domain.basis)
    shift = domain.shift
    twist_powers = []      # level j: n >> j powers of beta_j
    recursed = []          # level j: (popped_betas list, popped_shift)
    rec_betas_stack = []
    rec_shifts = [0] * m
    for j in range(m):
        beta = betas[m - 1 - j]
        rows = n >> j
        acc = 1
        powers = []
        for _ in range(rows):
            powers.append(acc)
            acc = F.mul_ints(acc, beta)
        twist_powers.append(powers)
        beta_inv = F.inv_int(beta)
        level_new = []
        for i in range(m - 1 - j):
            nb = F.mul_ints(betas[i], beta_inv)
            level_new.append(nb)
            betas[i] = F.mul_ints(nb, nb) ^ nb
        rec_betas_stack.append(level_new)
        ns = F.mul_ints(shift, beta_inv)
        rec_shifts[j] = ns
        shift = F.mul_ints(ns, ns) ^ ns
    # unwind tables (fft.tcc:100-116): at unwind level j (ascending) pop j
    # betas off the recursed stack and take subset sums with the matching shift
    flat = [b for lvl in rec_betas_stack for b in lvl]
    ptr = len(flat)
    unwind = [None] * m
    for j in range(m):
        ptr -= j
        popped = flat[ptr:ptr + j]
        popped_shift = rec_shifts[m - 1 - j]
        unwind[j] = subset_sums_ints(F, popped, popped_shift)
    return twist_powers, unwind


_jit_cache = {}


def _eager_jit(tag, impl, arr, domain):
    """Route eager calls through a cached jit: one device dispatch per call
    (remote-TPU dispatch latency makes per-stage eager ops prohibitive)."""
    key = (tag, domain, getattr(arr, "shape", None))
    fn = _jit_cache.get(key)
    if fn is None:
        fn = _jit_cache[key] = jax.jit(lambda a: impl(a, domain))
    return fn(jnp.asarray(arr))


def additive_fft(coeffs, domain: AffineSubspace):
    """Evaluate coeffs (W, d<=n) over the subspace; returns (W, n) in
    subset-sum (natural) order."""
    if not isinstance(coeffs, jax.core.Tracer):
        # warm the host-side table caches outside the trace
        if domain._fft_tables is None:
            _ = _fft_stage_tables(domain)
        return _eager_jit("afft", _additive_fft_impl, coeffs, domain)
    return _additive_fft_impl(coeffs, domain)


def _additive_fft_impl(coeffs, domain: AffineSubspace):
    F = domain.field
    n = domain.order
    d = coeffs.shape[-1]
    if d < n:
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros(coeffs.shape[:-1] + (n - d,), jnp.uint32)], axis=-1)
    if domain._fft_tables is None:
        tw, unwind = _fft_stage_tables(domain)
        domain._fft_tables = (
            [F.from_ints_np(t) for t in tw],
            [F.from_ints_np(u) for u in unwind])
    twist_powers, unwind = domain._fft_tables
    m = domain.dim
    S = coeffs
    W = S.shape[0]
    for j in range(m):
        # twist: row r of the (n>>j, 1<<j) view scaled by beta^r
        rows = n >> j
        Sv = S.reshape(W, rows, 1 << j)
        tp = twist_powers[j][:, :, None]
        S = F.mul(Sv, tp).reshape(W, n)
        # radix conversion: XOR butterflies
        stride = n // 4
        while stride >= (1 << j) and stride > 0:
            B = S.reshape(W, -1, 4, stride)
            B = B.at[:, :, 2].set(B[:, :, 2] ^ B[:, :, 3])
            B = B.at[:, :, 1].set(B[:, :, 1] ^ B[:, :, 2])
            S = B.reshape(W, n)
            stride >>= 1
    S = jnp.take(S, jnp.asarray(bitrev_permutation(n)), axis=-1)
    for j in range(m):
        stride = 1 << j
        B = S.reshape(W, -1, 2, stride)
        sums = unwind[j][:, None, :]
        lo = B[:, :, 0] ^ F.mul(B[:, :, 1], sums)
        hi = B[:, :, 1] ^ lo
        S = jnp.stack([lo, hi], axis=2).reshape(W, n)
    return S


def additive_ifft(evals, domain: AffineSubspace):
    """Inverse of additive_fft: (W, n) evals -> (W, n) coefficients."""
    if not isinstance(evals, jax.core.Tracer):
        return _eager_jit("aifft", _additive_ifft_impl, evals, domain)
    return _additive_ifft_impl(evals, domain)


def _additive_ifft_impl(evals, domain: AffineSubspace):
    F = domain.field
    n = domain.order
    m = domain.dim
    W = evals.shape[0]
    if domain._ifft_tables is None:
        tw, unwind = _fft_stage_tables(domain)
        inv_tw = []
        for j, t in enumerate(tw):
            inv_tw.append(F.from_ints_np([F.inv_int(v) if v else 0 for v in t]))
        domain._ifft_tables = (inv_tw, [F.from_ints_np(u) for u in unwind])
    inv_twist, unwind = domain._ifft_tables
    S = evals
    # reverse the unwind (note fft's unwind at level j uses block stride 2^j;
    # ifft processes j descending with the inverse butterfly)
    for j in range(m - 1, -1, -1):
        stride = 1 << j
        B = S.reshape(W, -1, 2, stride)
        sums = unwind[j][:, None, :]
        hi = B[:, :, 1] ^ B[:, :, 0]          # hi' = hi ^ lo
        lo = B[:, :, 0] ^ F.mul(hi, sums)     # lo' = lo ^ hi'*sums
        S = jnp.stack([lo, hi], axis=2).reshape(W, n)
    S = jnp.take(S, jnp.asarray(bitrev_permutation(n)), axis=-1)
    # reverse radix conversion + untwist, levels descending
    for j in range(m - 1, -1, -1):
        stride = 1 << j
        while stride <= n // 4:
            B = S.reshape(W, -1, 4, stride)
            B = B.at[:, :, 1].set(B[:, :, 1] ^ B[:, :, 2])
            B = B.at[:, :, 2].set(B[:, :, 2] ^ B[:, :, 3])
            S = B.reshape(W, n)
            stride <<= 1
        rows = n >> j
        Sv = S.reshape(W, rows, 1 << j)
        S = F.mul(Sv, inv_twist[j][:, :, None]).reshape(W, n)
    return S
