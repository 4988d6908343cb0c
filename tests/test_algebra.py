"""Vanishing polynomial / Lagrange / Horner tests vs pointwise definitions
(mirrors tests/algebra/test_vanishing_polynomial.cpp, test_lagrange.cpp)."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.algebra.domains import MultiplicativeCoset
from libiop_tpu.algebra.poly import (
    vanishing_eval_at_point, vanishing_evals_over, vanishing_inverse_evals_over,
    vanishing_formal_derivative_at_point, horner_eval, lagrange_coefficients)


def test_vanishing_point_eval(rng):
    F = edwards_fr()
    H = MultiplicativeCoset(F, dim=4, shift=19)
    xs = [int(rng.integers(1, 1 << 60)) for _ in range(4)]
    got = [int(v) for v in F.to_ints(vanishing_eval_at_point(H, F.from_ints(xs)))]
    want = [(pow(x, H.order, F.p) - pow(19, H.order, F.p)) % F.p for x in xs]
    assert got == want
    # zero on the domain itself
    elems = H.elements()
    z = vanishing_eval_at_point(H, elems)
    assert bool(np.all(np.asarray(F.to_ints(z)) == 0))


@pytest.mark.parametrize("ldim,lshift", [(6, 19), (4, 23), (3, 19)])
def test_vanishing_evals_over(ldim, lshift):
    F = edwards_fr()
    H = MultiplicativeCoset(F, dim=4, shift=1)
    L = MultiplicativeCoset(F, dim=ldim, shift=lshift)
    got = [int(v) for v in F.to_ints(vanishing_evals_over(H, L))]
    want = [(pow(L.element_by_index_int(k), H.order, F.p) - 1) % F.p
            for k in range(L.order)]
    assert got == want
    inv = [int(v) for v in F.to_ints(vanishing_inverse_evals_over(H, L))]
    assert inv == [pow(w, F.p - 2, F.p) for w in want]


def test_vanishing_derivative(rng):
    F = edwards_fr()
    H = MultiplicativeCoset(F, dim=5, shift=19)
    x = int(rng.integers(1, 1 << 60))
    got = int(F.to_ints(vanishing_formal_derivative_at_point(
        H, F.from_ints([x])))[0])
    assert got == H.order * pow(x, H.order - 1, F.p) % F.p


def test_horner(rng):
    F = edwards_fr()
    coeffs = [int(rng.integers(0, 1 << 60)) for _ in range(7)] + [0]
    xs = [3, int(rng.integers(0, 1 << 60))]
    got = [int(v) for v in F.to_ints(horner_eval(F, F.from_ints(coeffs), F.from_ints(xs)))]
    want = [sum(c * pow(x, j, F.p) for j, c in enumerate(coeffs)) % F.p for x in xs]
    assert got == want


def test_horner_blocked_matches_plain(rng):
    """Degrees above _HORNER_BLOCK_THRESHOLD take the sqrt-decomposition
    path; it must agree bit-for-bit with host-int Horner on both families
    (the verifier's transcript math runs through this)."""
    from libiop_tpu.fields.binary import gf64
    for F in (edwards_fr(), gf64()):
        for d in (255, 300, 1100):
            ints = [int(v) for v in rng.integers(0, 1 << 60, size=d)]
            xs_i = [int(v) for v in rng.integers(1, 1 << 60, size=3)]
            got = F.to_ints(horner_eval(F, F.from_ints(ints), F.from_ints(xs_i)))
            for x, g in zip(xs_i, got):
                want = 0
                for c in reversed(ints):
                    want = F.add_ints(F.mul_ints(want, F.sample_int(x)),
                                      F.sample_int(c))
                assert int(g) == want, (F.name, d)


def test_lagrange_coefficients(rng):
    F = edwards_fr()
    H = MultiplicativeCoset(F, dim=3, shift=19)
    alpha = int(rng.integers(0, 1 << 61))
    coeffs = lagrange_coefficients(H, F.from_ints([alpha]).reshape(F.L))
    got = [int(v) for v in F.to_ints(coeffs)]
    # check interpolation: sum_k L_k(alpha) * f(h_k) == f(alpha) for a poly f
    fcoef = [int(rng.integers(0, 1 << 60)) for _ in range(H.order)]

    def feval(x):
        return sum(c * pow(x, j, F.p) for j, c in enumerate(fcoef)) % F.p

    interp = sum(got[k] * feval(H.element_by_index_int(k)) for k in range(H.order)) % F.p
    assert interp == feval(alpha)
    # partition of unity
    assert sum(got) % F.p == 1
    # exact membership: alpha = h_2 -> one-hot
    coeffs2 = lagrange_coefficients(
        H, F.from_ints([H.element_by_index_int(2)]).reshape(F.L))
    got2 = [int(v) for v in F.to_ints(coeffs2)]
    assert got2 == [1 if k == 2 else 0 for k in range(H.order)]
