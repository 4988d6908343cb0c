"""Linearized (subspace-vanishing) polynomials over GF(2^k).

Counterpart of libiop/algebra/polynomials/linearized_polynomial.{hpp,tcc} and
the subspace instantiation of vanishing_polynomial.{hpp,tcc}: for an F2-linear
subspace V = span(b_0..b_{m-1}), the vanishing polynomial

    Z_V(x) = prod_{v in V} (x - v)

is linearized — nonzero coefficients only at degrees 2^i — built by the
recursion Z_{j+1}(x) = Z_j(x)^2 + Z_j(b_j) * Z_j(x).  For an affine subspace
V + s: Z(x) = Z_V(x) + Z_V(s).

F2-linearity makes evaluation over a domain a subset-sum table: Z(sum_i c_i
+ s) = sum_i Z(c_i) + Z(s) — O(N) XORs instead of O(N log|V|) field ops —
and over a domain that CONTAINS V, Z is constant on each (contiguous) coset,
so evaluations are a short pattern repeated (the additive k-to-1 structure,
rowcheck.tcc's additive branch).
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..fields.binary import BinaryField
from .subspace import AffineSubspace, subset_sums_ints


class LinearizedVanishing:
    """Z for an affine subspace (host-int coefficients; device eval tables)."""

    def __init__(self, domain: AffineSubspace):
        F = domain.field
        self.F = F
        self.domain = domain
        # recursion: Z_0 = x; Z_{j+1} = Z_j^2 + Z_j(b_j) Z_j
        # represent by linearized coeffs: c[i] multiplies x^(2^i)
        coeffs = [1]  # Z_0 = x
        for b in domain.basis:
            z_b = self._eval_linear(coeffs, b)
            sq = [0] + [F.mul_ints(c, c) for c in coeffs]
            scaled = [F.mul_ints(z_b, c) for c in coeffs] + [0]
            coeffs = [a ^ b2 for a, b2 in zip(sq, scaled)]
        self.linear_coeffs = coeffs          # length m+1: degrees 2^0..2^m
        self.constant = self._eval_linear(coeffs, domain.shift)

    def _eval_linear(self, coeffs: List[int], x: int) -> int:
        F = self.F
        acc = 0
        p = x
        for c in coeffs:
            acc ^= F.mul_ints(c, p)
            p = F.mul_ints(p, p)
        return acc

    # -- evaluation ---------------------------------------------------------
    def eval_at_point_int(self, x: int) -> int:
        return self._eval_linear(self.linear_coeffs, x) ^ self.constant

    @property
    def epsilon(self) -> int:
        """Coefficient of the linear (x^1) term — the additive sumcheck's
        eps (sumcheck.tcc:36-39 additive branch)."""
        return self.linear_coeffs[0]

    def formal_derivative(self) -> int:
        """d/dx of a linearized poly is the constant eps (char 2)."""
        return self.linear_coeffs[0]

    def evals_over(self, L: AffineSubspace):
        """(W, |L|) device evaluations over L, via F2-linearity: evaluate on
        L's basis + shift, then subset-sum (O(|L|) host XORs)."""
        F = self.F
        z_basis = [self._eval_linear(self.linear_coeffs, b) for b in L.basis]
        z_shift = self.eval_at_point_int(L.shift)
        vals = subset_sums_ints(F, z_basis, z_shift)
        return F.from_ints(vals)

    def coeffs_dense_positions(self):
        """[(degree, coeff_int)] sparse representation incl. the constant."""
        out = [(0, self.constant)] if self.constant else []
        for i, c in enumerate(self.linear_coeffs):
            if c:
                out.append((1 << i, c))
        return out


def divide_by_linearized(F: BinaryField, coeffs, Z: LinearizedVanishing):
    """(quotient, remainder) of a dense coefficient array (W, d) by Z
    (degree h = 2^m).  Fold top chunks of size h/2 at a time: each quotient
    coefficient at degree t >= h sends c_t * z_i to degree t - h + deg_i for
    every sparse term, all strictly more than h/2 below t, so half-size
    chunks fold independently (role of polynomial division in
    linearized_polynomial.tcc)."""
    h = Z.domain.order
    d = coeffs.shape[-1]
    if d <= h:
        pad = jnp.zeros(coeffs.shape[:-1] + (h - d,), jnp.uint32)
        return (jnp.zeros(coeffs.shape[:-1] + (0,), jnp.uint32),
                jnp.concatenate([coeffs, pad], axis=-1))
    sparse = [(deg, c) for deg, c in Z.coeffs_dense_positions() if deg < h]
    work = coeffs
    quotient_parts = []
    top = d
    chunk = max(1, h // 2)
    while top > h:
        size = min(chunk, top - h)
        q_block = work[..., top - size:top]     # final quotient coeffs
        quotient_parts.append((top - h - size, q_block))
        work = work[..., :top - size]
        for deg, c in sparse:
            # fold q_block * c * x^(t-h+deg)
            c_dev = F.from_ints([c]).reshape((F.W,) + (1,) * (coeffs.ndim - 1))
            contrib = F.mul(q_block, c_dev)
            lo = top - size - h + deg
            seg = work[..., lo:lo + size] ^ contrib
            work = work.at[..., lo:lo + size].set(seg)
        top -= size
    remainder = work[..., :h]
    # assemble quotient (parts were collected top-down)
    qlen = d - h
    q = jnp.zeros(coeffs.shape[:-1] + (qlen,), jnp.uint32)
    for (off, block) in quotient_parts:
        q = q.at[..., off:off + block.shape[-1]].set(block)
    return q, remainder
