"""Additive (Gao–Mateer) FFT over GF(2^k) vs naive Horner evaluation
(mirrors tests/algebra/test_fft.cpp additive cases)."""
import numpy as np
import pytest

from libiop_tpu.fields.binary import gf64, gf192
from libiop_tpu.algebra.subspace import (AffineSubspace, additive_fft,
                                         additive_ifft)


def _naive_evals(F, coeff_ints, domain):
    out = []
    for k in range(domain.order):
        x = domain.element_by_index_int(k)
        acc = 0
        for c in reversed(coeff_ints):
            acc = F.mul_ints(acc, x) ^ c
        out.append(acc)
    return out


@pytest.mark.parametrize("field_fn", [gf64, gf192])
@pytest.mark.parametrize("shift", [0, 0b11010])
def test_additive_fft_matches_naive(field_fn, shift, rng):
    F = field_fn()
    dom = AffineSubspace(F, dim=4, shift=shift)
    coeffs = [int.from_bytes(rng.bytes(F.elem_bytes), "little")
              for _ in range(dom.order)]
    got = [int(v) for v in F.to_ints(additive_fft(F.from_ints(coeffs), dom))]
    assert got == _naive_evals(F, coeffs, dom)


def test_additive_fft_low_degree(rng):
    F = gf64()
    dom = AffineSubspace(F, dim=5, shift=7)
    coeffs = [int.from_bytes(rng.bytes(8), "little") for _ in range(8)]
    got = [int(v) for v in F.to_ints(additive_fft(F.from_ints(coeffs), dom))]
    assert got == _naive_evals(F, coeffs, dom)


@pytest.mark.parametrize("shift", [0, 13])
def test_additive_ifft_roundtrip(shift, rng):
    F = gf64()
    dom = AffineSubspace(F, dim=5, shift=shift)
    coeffs = [int.from_bytes(rng.bytes(8), "little") for _ in range(dom.order)]
    ev = additive_fft(F.from_ints(coeffs), dom)
    back = [int(v) for v in F.to_ints(additive_ifft(ev, dom))]
    assert back == coeffs


def test_subspace_index_math():
    F = gf64()
    dom = AffineSubspace(F, dim=6, shift=9)
    # standard basis: element(i) = shift ^ i
    for i in [0, 1, 37, 63]:
        assert dom.element_by_index_int(i) == 9 ^ i
    # contiguous coset layout
    assert dom.coset_index(13, 4) == 3
    assert dom.intra_coset_index(13, 4) == 1
    assert dom.position_by_coset_indices(3, 1, 4) == 13
    sub = dom.get_subset_of_order(8)
    for i in range(8):
        assert sub.element_by_index_int(i) == dom.element_by_index_int(i)
