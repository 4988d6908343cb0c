"""Standalone bivariate Lagrange polynomial + subspace basis utilities.

Role parity with the reference:

* ``bivariate_lagrange_polynomial`` —
  libiop/algebra/polynomials/bivariate_lagrange_polynomial.hpp:22-45:
  the succinct low-degree extension of the unnormalized Lagrange basis of a
  domain S,  f(X, Y) = (Z_S(X) - Z_S(Y)) / (X - Y),  with f(x, x) = Z_S'(x).
  The repo's Fractal indexer inlines the diagonal (derivative) case; this
  class is the general-purpose form with the reference's three entry points
  (``evaluation_at_point``, ``fix_x``, ``evaluations_over_field_subset``).
* ``monomial_basis`` / ``transform_basis_by_polynomial`` —
  libiop/algebra/field_subset/basis_utils.hpp:19-29.

TPU-native shape: ``evaluations_over`` is one batched device computation
(vanishing evals over the target domain + one Fermat/Itoh-Tsujii batch
inverse), with the y == x diagonal patched via a host-int derivative —
instead of the reference's per-element loop.  Works over both domain
families (multiplicative cosets and affine subspaces) through the
field-generic host-int layer (algebra/generic.py).
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp

from .generic import (
    lagrange_coeffs_ints_any,
    vanishing_derivative_int,
    vanishing_eval_int,
    vanishing_evals_over_any,
)


class BivariateLagrange:
    """f(X, Y) = (Z_S(X) - Z_S(Y)) / (X - Y) for a domain S.

    Degree |S| - 1 in Y; identifies elements of S with Y
    (bivariate_lagrange_polynomial.hpp:22-31).
    """

    def __init__(self, S):
        self.S = S
        self.F = S.field

    def evaluation_at_point_int(self, x: int, y: int) -> int:
        """f(x, y) as host ints (bivariate_lagrange_polynomial.tcc
        evaluation_at_point semantics, incl. the x == y diagonal)."""
        F = self.F
        if x == y:
            return vanishing_derivative_int(self.S, x)
        num = F.sub_ints(vanishing_eval_int(self.S, x),
                         vanishing_eval_int(self.S, y))
        return F.mul_ints(num, F.inv_int(F.sub_ints(x, y)))

    def fix_x(self, c: int) -> List[int]:
        """Coefficient-free representation of Y -> f(c, Y): the unnormalized
        Lagrange coefficients of S at c, scaled back by Z_S'(s) per element —
        i.e. exactly { Z_S(c)/(c - s) } as a dense list over S in domain
        order (the reference returns a lagrange_polynomial object; here the
        succinct evaluations_over/eval-at-point pair below plays that role,
        and fix_x returns the dense evaluations over S itself)."""
        F = self.F
        coeffs = lagrange_coeffs_ints_any(self.S, c)
        # lagrange_coeffs are normalized ( =1 at s ); unnormalize by Z_S'(s)
        return [F.mul_ints(coeffs[i],
                           vanishing_derivative_int(
                               self.S, self.S.element_by_index_int(i)))
                for i in range(self.S.order)]

    def evaluations_over(self, x: int, L) -> jnp.ndarray:
        """Device-batched f(x, y) for all y in domain L; returns the field's
        (L, |L|) limb array.  One vanishing-eval pass + one batched inverse
        (bivariate_lagrange_polynomial.tcc evaluations_over_field_subset)."""
        F = self.F
        zx = vanishing_eval_int(self.S, x)
        z_l = vanishing_evals_over_any(self.S, L)          # Z_S(y) batched
        ys = F.from_ints([L.element_by_index_int(i) for i in range(L.order)])
        x_b = F.from_ints([x] * L.order)
        num = F.sub(F.from_ints([zx] * L.order), z_l)
        den = F.sub(x_b, ys)
        # diagonal y == x (only possible when x in L): patch via derivative.
        # inv(0) = 0 for both Fermat and Itoh-Tsujii, so the unpatched
        # diagonal entry is well-defined garbage, overwritten below.
        diag = [i for i in range(L.order) if L.element_by_index_int(i) == x]
        out = F.mul(num, F.inv(den))
        if diag:
            d = vanishing_derivative_int(self.S, x)
            col = F.from_ints([d])
            out = out.at[:, diag[0]].set(col[:, 0])
        return out


def monomial_basis(F, dimension: int, smallest_exponent: int) -> List[int]:
    """Basis x^i, ..., x^{i+d-1} of the rational function field — here the
    F2-linear basis elements 2^i as field ints for binary fields, or
    generator powers for prime fields (basis_utils.tcc monomial_basis).
    Returns host ints in field encoding."""
    if F.kind == "additive":
        # binary field: the monomial x^k of the polynomial representation
        # is the integer 2^k
        return [1 << (smallest_exponent + k) for k in range(dimension)]
    g = F.multiplicative_generator
    cur = F.pow_int(g, smallest_exponent)
    out = []
    for _ in range(dimension):
        out.append(cur)
        cur = F.mul_ints(cur, g)
    return out


def transform_basis_by_polynomial(evaluate_at_point, basis: List[int]
                                  ) -> List[int]:
    """Map each basis element through a polynomial's point-evaluation
    callable (basis_utils.tcc transform_basis_by_polynomial — used to push a
    subspace basis through a linearized map)."""
    return [evaluate_at_point(b) for b in basis]
