"""Trace embedding tests: successor-ordering bijectivity + piecewise-
polynomial consistency, bivariate-embedding bijectivity (mirrors
tests/algebra/test_successor_ordering.cpp and test_bivariate_embedding.cpp)."""
import pytest

from libiop_tpu.fields.binary import gf64, gf192
from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.algebra.generic import make_domain
from libiop_tpu.algebra.subspace import AffineSubspace
from libiop_tpu.algebra.trace_embedding import (
    BivariateEmbedding, SuccessorOrdering, primitive_polynomial_int,
    _gf2_polypowmod)


def test_primitive_polynomials_are_primitive():
    for d in [2, 3, 4, 6, 8, 10, 13]:
        f = primitive_polynomial_int(d)
        assert f >> d == 1 and f & 1  # monic degree d, nonzero constant
        m = (1 << d) - 1
        assert _gf2_polypowmod(2, m, f, d) == 1
        # order of x is exactly 2^d - 1: no proper divisor e with x^e = 1
        seen = set()
        x = 1
        for _ in range(m):
            x = ((x << 1) ^ (f if (x >> (d - 1)) & 1 else 0)) & ((1 << d) - 1)
            assert x not in seen
            seen.add(x)
        assert len(seen) == m


@pytest.mark.parametrize("make", [
    lambda: make_domain(edwards_fr(), 5),
    lambda: make_domain(edwards_fr(), 5,
                        shift=edwards_fr().multiplicative_generator),
    lambda: make_domain(gf64(), 5),
    lambda: make_domain(gf192(), 6),
    lambda: AffineSubspace(gf64(), 5, shift=37),  # affine (shifted) subspace
])
def test_successor_ordering_walks_whole_domain(make):
    """first_elem + repeated next_elem must enumerate every domain element
    exactly once (successor ordering = bijection Z_|S| -> S)."""
    domain = make()
    ordering = SuccessorOrdering(domain)
    all_elems = {domain.element_by_index_int(i) for i in range(domain.order)}
    cur = ordering.first_elem()
    seen = set()
    for _ in range(domain.order):
        assert cur in all_elems and cur not in seen
        seen.add(cur)
        cur = ordering.next_elem(cur)
    assert seen == all_elems


@pytest.mark.parametrize("make", [
    lambda: make_domain(edwards_fr(), 4),
    lambda: make_domain(gf64(), 4),
    lambda: AffineSubspace(gf64(), 4, shift=21),
])
def test_successor_piecewise_polynomial_consistency(make):
    """The piecewise polynomial must agree with next_elem on the whole domain
    and have the claimed degrees."""
    domain = make()
    ordering = SuccessorOrdering(domain)
    poly = ordering.piecewise_polynomial()
    assert poly.piecewise_degree() == 1
    assert poly.degree() in (1, domain.order)
    for i in range(domain.order):
        x = domain.element_by_index_int(i)
        assert poly.evaluation_at_point_int(x) == ordering.next_elem(x), i


def test_additive_bivariate_embedding_bijective():
    F = gf64()
    emb, H1, H2 = BivariateEmbedding.build_additive(F, dim=6, row_dim=2)
    H = emb.H
    h1_elems = {H1.element_by_index_int(i) for i in range(H1.order)}
    h2_elems = {H2.element_by_index_int(i) for i in range(H2.order)}
    seen = set()
    for i in range(H.order):
        x = H.element_by_index_int(i)
        pair = (emb.project_to_row(x), emb.project_to_col(x))
        assert pair[0] in h1_elems and pair[1] in h2_elems
        assert pair not in seen, "embedding produced a duplicate"
        seen.add(pair)
    assert len(seen) == H.order


def test_multiplicative_bivariate_embedding_bijective():
    F = edwards_fr()
    # |H1| = 8 (power of two), |H2| = 5 (odd) — coprime, both divide p-1
    assert (F.p - 1) % 5 == 0
    emb, H1, H2 = BivariateEmbedding.build_multiplicative(F, 8, 5)
    seen = set()
    for i in range(emb.H.order):
        x = emb.H.element_by_index_int(i)
        row, col = emb.project_to_row(x), emb.project_to_col(x)
        assert H1.contains(row) and H2.contains(col)
        assert (row, col) not in seen
        seen.add((row, col))
    assert len(seen) == 40
