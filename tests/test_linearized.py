"""Linearized vanishing polynomials over GF(2^k) subspaces
(mirrors tests/algebra/test_vanishing_polynomial.cpp additive cases +
test_linearized_polynomial.cpp)."""
import numpy as np
import pytest

from libiop_tpu.fields.binary import gf64, gf192
from libiop_tpu.algebra.subspace import AffineSubspace, additive_fft
from libiop_tpu.algebra.linearized import (LinearizedVanishing,
                                           divide_by_linearized)


@pytest.mark.parametrize("field_fn", [gf64, gf192])
@pytest.mark.parametrize("shift", [0, 0b1011])
def test_vanishing_on_domain_and_linearity(field_fn, shift):
    F = field_fn()
    dom = AffineSubspace(F, dim=4, shift=shift)
    Z = LinearizedVanishing(dom)
    # vanishes exactly on the domain
    for i in range(dom.order):
        assert Z.eval_at_point_int(dom.element_by_index_int(i)) == 0
    # nonzero just outside
    assert Z.eval_at_point_int(1 << 5 ^ shift) != 0
    # sparse coefficients only at powers of two (+ constant)
    for deg, c in Z.coeffs_dense_positions():
        assert deg == 0 or (deg & (deg - 1)) == 0
        assert c != 0


def test_evals_over_larger_domain(rng):
    F = gf64()
    H = AffineSubspace(F, dim=3, shift=0)
    L = AffineSubspace(F, dim=6, shift=1 << 7)
    Z = LinearizedVanishing(H)
    got = [int(v) for v in F.to_ints(Z.evals_over(L))]
    want = [Z.eval_at_point_int(L.element_by_index_int(i))
            for i in range(L.order)]
    assert got == want
    # additive k-to-1: constant on each contiguous coset of H inside L
    # (H's basis is a prefix of L's)
    for j in range(L.order // H.order):
        block = got[j * H.order:(j + 1) * H.order]
        assert len(set(block)) == 1


def test_divide_by_linearized_roundtrip(rng):
    F = gf64()
    H = AffineSubspace(F, dim=3, shift=0b101)
    Z = LinearizedVanishing(H)
    d = 32
    coeffs_ints = [int.from_bytes(rng.bytes(8), "little") for _ in range(d)]
    coeffs = F.from_ints(coeffs_ints)
    q, r = divide_by_linearized(F, coeffs, Z)
    assert q.shape[-1] == d - H.order and r.shape[-1] == H.order
    # check f(x) == q(x) Z(x) + r(x) at random points
    q_ints = [int(v) for v in F.to_ints(q)]
    r_ints = [int(v) for v in F.to_ints(r)]

    def horner(cs, x):
        acc = 0
        for c in reversed(cs):
            acc = F.mul_ints(acc, x) ^ c
        return acc

    for x in [1, 0b1101, int.from_bytes(rng.bytes(8), "little")]:
        lhs = horner(coeffs_ints, x)
        rhs = F.mul_ints(horner(q_ints, x), Z.eval_at_point_int(x)) ^ \
            horner(r_ints, x)
        assert lhs == rhs
    # dividing the vanishing-masked poly: (Z * g) has remainder 0
    g_ints = [int.from_bytes(rng.bytes(8), "little") for _ in range(8)]
    prod = [0] * (8 + H.order + 1)
    # coeffs_dense_positions includes the monic x^h leading term
    for deg, c in Z.coeffs_dense_positions():
        for i, gc in enumerate(g_ints):
            prod[deg + i] ^= F.mul_ints(c, gc)
    q2, r2 = divide_by_linearized(F, F.from_ints(prod), Z)
    assert all(int(v) == 0 for v in F.to_ints(r2))
    assert [int(v) for v in F.to_ints(q2)][:8] == g_ints
