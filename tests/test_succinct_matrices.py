"""Succinct-matrix tests (mirror of tests/relations/test_identity_matrices.cpp,
strengthened: the reference's test polynomial x^|S| is constant on S, so it
cannot pin the shift direction — here z is a random polynomial and every
systematic value is checked)."""
import numpy as np
import pytest

from libiop_tpu.fields.binary import gf64
from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.algebra.generic import (ifft_any, make_domain)
from libiop_tpu.algebra.trace_embedding import SuccessorOrdering
from libiop_tpu.relations.succinct import (HostPolynomial, IdentityMatrix,
                                           ShiftedIdentityMatrix,
                                           StandardSemisuccinctMatrix)
from libiop_tpu.relations.sparse import SparseMatrix


@pytest.mark.parametrize("F", [edwards_fr(), gf64()])
def test_identity_matrix(F):
    rng = np.random.default_rng(1)
    z = HostPolynomial(F, F.random_ints(9, rng))
    ident = IdentityMatrix(16)
    mz = ident.extend_Mz(z)
    assert mz.degree() == z.degree() == ident.Mz_degree(z.degree())
    for x in F.random_ints(5, rng):
        assert mz.evaluation_at_point_int(x) == z.evaluation_at_point_int(x)


@pytest.mark.parametrize("F", [edwards_fr(), gf64()])
def test_shifted_identity_matrix(F):
    dim = 4
    S = make_domain(F, dim)
    ordering = SuccessorOrdering(S)
    shifted = ShiftedIdentityMatrix(S, ordering)
    rng = np.random.default_rng(2)
    # random z of degree < |S| via interpolation of random systematic values
    vals = F.random_ints(S.order, rng)
    coeffs = [int(v) for v in F.to_ints(ifft_any(F.from_ints(vals), S))]
    z = HostPolynomial(F, coeffs)
    mz = shifted.extend_Mz(z)
    assert mz.degree() == shifted.Mz_degree(z.degree())
    # (Mz)(first) = 0; (Mz)(e_i) = z(e_{i+1}) for i >= 1 (identity.tcc
    # semantics: z(succ(x)) with the first row zeroed)
    first = ordering.first_elem()
    assert mz.evaluation_at_point_int(first) == 0
    cur = ordering.next_elem(first)
    for _ in range(S.order - 1):
        nxt = ordering.next_elem(cur)
        assert mz.evaluation_at_point_int(cur) == z.evaluation_at_point_int(nxt)
        cur = nxt


def test_semisuccinct_wrapper():
    F = edwards_fr()
    A = IdentityMatrix(4)
    B = SparseMatrix.from_entries(F, 2, 2, [(0, 0, 1), (1, 1, 5)])
    M = StandardSemisuccinctMatrix(A, B)
    assert M.get_succinct_matrix() is A
    assert M.get_unstructured_matrix() is B
