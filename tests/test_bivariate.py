"""Bivariate Lagrange polynomial + basis utils.

Mirrors the reference's bivariate_lagrange_polynomial semantics
(libiop/algebra/polynomials/bivariate_lagrange_polynomial.hpp:22-45) over
both domain families, and basis_utils.hpp:19-29.
"""
import numpy as np
import pytest

from libiop_tpu.algebra.bivariate import (BivariateLagrange, monomial_basis,
                                          transform_basis_by_polynomial)
from libiop_tpu.algebra.domains import MultiplicativeCoset
from libiop_tpu.algebra.subspace import AffineSubspace
from libiop_tpu.algebra.generic import (vanishing_eval_int,
                                        vanishing_derivative_int)
from libiop_tpu.fields.binary import gf64
from libiop_tpu.fields.prime import edwards_fr


def _domains():
    Fp = edwards_fr()
    F2 = gf64()
    return [
        (Fp, MultiplicativeCoset(Fp, 3),
         MultiplicativeCoset(Fp, 5, shift=Fp.multiplicative_generator)),
        (F2, AffineSubspace(F2, 3), AffineSubspace(F2, 5, shift=1 << 40)),
    ]


@pytest.mark.parametrize("idx", [0, 1])
def test_bivariate_off_diagonal_matches_definition(idx):
    F, S, L = _domains()[idx]
    f = BivariateLagrange(S)
    rng = np.random.default_rng(7)
    for _ in range(5):
        x = F.sample_int(int.from_bytes(rng.bytes(40), "little"))
        y = F.sample_int(int.from_bytes(rng.bytes(40), "little"))
        if x == y:
            continue
        got = f.evaluation_at_point_int(x, y)
        num = F.sub_ints(vanishing_eval_int(S, x), vanishing_eval_int(S, y))
        assert got == F.mul_ints(num, F.inv_int(F.sub_ints(x, y)))


@pytest.mark.parametrize("idx", [0, 1])
def test_bivariate_diagonal_is_derivative(idx):
    F, S, L = _domains()[idx]
    f = BivariateLagrange(S)
    for i in range(S.order):
        s = S.element_by_index_int(i)
        assert f.evaluation_at_point_int(s, s) == \
            vanishing_derivative_int(S, s)


@pytest.mark.parametrize("idx", [0, 1])
def test_bivariate_identifies_elements_of_S(idx):
    """For y in S: f(x, y) = Z_S(x)/(x - y), the unnormalized Lagrange basis
    element of S at y, evaluated at x (hpp:24-31)."""
    F, S, L = _domains()[idx]
    f = BivariateLagrange(S)
    rng = np.random.default_rng(8)
    x = F.sample_int(int.from_bytes(rng.bytes(40), "little"))
    zx = vanishing_eval_int(S, x)
    for i in range(S.order):
        s = S.element_by_index_int(i)
        if s == x:
            continue
        expect = F.mul_ints(zx, F.inv_int(F.sub_ints(x, s)))
        assert f.evaluation_at_point_int(x, s) == expect


@pytest.mark.parametrize("idx", [0, 1])
def test_bivariate_evaluations_over_matches_pointwise(idx):
    F, S, L = _domains()[idx]
    f = BivariateLagrange(S)
    x = F.sample_int(int.from_bytes(np.random.default_rng(9).bytes(40), "little"))
    batched = F.to_ints(f.evaluations_over(x, L))
    for i in range(L.order):
        y = L.element_by_index_int(i)
        assert int(batched[i]) == f.evaluation_at_point_int(x, y)


@pytest.mark.parametrize("idx", [0, 1])
def test_fix_x_matches_pointwise(idx):
    F, S, L = _domains()[idx]
    f = BivariateLagrange(S)
    c = F.sample_int(int.from_bytes(np.random.default_rng(10).bytes(40), "little"))
    dense = f.fix_x(c)
    for i in range(S.order):
        s = S.element_by_index_int(i)
        assert dense[i] == f.evaluation_at_point_int(c, s)


def test_monomial_basis_binary():
    F = gf64()
    assert monomial_basis(F, 4, 0) == [1, 2, 4, 8]
    assert monomial_basis(F, 3, 5) == [32, 64, 128]


def test_monomial_basis_prime():
    F = edwards_fr()
    g = F.multiplicative_generator
    b = monomial_basis(F, 3, 1)
    assert b[0] == g
    assert b[1] == F.mul_ints(g, g)
    assert b[2] == F.mul_ints(b[1], g)


def test_transform_basis_by_polynomial():
    F = gf64()
    basis = monomial_basis(F, 4, 0)
    sq = lambda v: F.mul_ints(v, v)
    assert transform_basis_by_polynomial(sq, basis) == [sq(b) for b in basis]
