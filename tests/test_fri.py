"""Interactive FRI tests (mirrors tests/protocols/test_fri.cpp True/False
variants, multiplicative case)."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.algebra.domains import MultiplicativeCoset
from libiop_tpu.algebra.fft import fft
from libiop_tpu.iop.runtime import IOPProtocol
from libiop_tpu.protocols.fri import (
    FRIParameters, FRIProtocol, FRISoundnessType, fold_codeword,
    interpolate_coset_at_point_ints)


def _make_params(F, degree_bound, dim, localization):
    params = FRIParameters(
        F, interactive_soundness_bits=32, query_soundness_bits=32,
        soundness_type=FRISoundnessType.heuristic,
        poly_degree_bound=degree_bound, codeword_domain_dim=dim,
        RS_extra_dimensions=dim - (degree_bound.bit_length() - 1),
        absolute_proximity_parameter=(1 << dim) // 4,
        localization_parameters=localization)
    params.num_query_repetitions = 4
    params.num_interactive_repetitions = 1
    return params


def _run_fri(codeword, degree_bound, dim, localization, seed=11):
    F = edwards_fr()
    L = MultiplicativeCoset(F, dim=dim, shift=F.multiplicative_generator)
    iop = IOPProtocol(F, seed=seed)
    cw = iop.register_domain(L)
    handle = iop.register_oracle(cw, degree_bound)
    params = _make_params(F, degree_bound, dim, localization)
    fri = FRIProtocol(iop, params, cw, [handle])
    fri.register_interactions()
    iop.seal_interaction_registrations()
    fri.register_queries()
    iop.seal_query_registrations()
    iop.submit_oracle(handle, codeword)
    iop.signal_prover_round_done()
    fri.calculate_and_submit_proof()
    return fri


def test_fold_codeword_matches_pointwise(rng):
    """Folding must equal per-coset interpolation at x (host-int mirror)."""
    F = edwards_fr()
    L = MultiplicativeCoset(F, dim=5, shift=F.multiplicative_generator)
    coeffs = F.from_ints([int(rng.integers(0, 1 << 60)) for _ in range(8)])
    evals = fft(coeffs, L)
    eta, x = 2, int(rng.integers(0, 1 << 60))
    folded = fold_codeword(F, evals, L, eta, x)
    c = 1 << eta
    nc = L.order // c
    ev_ints = [int(v) for v in F.to_ints(evals)]
    for j in [0, 1, nc - 1]:
        coset_vals = [ev_ints[j + k * nc] for k in range(c)]
        shift = L.element_by_index_int(j)
        want = interpolate_coset_at_point_ints(F, coset_vals, shift, eta, x)
        got = int(F.to_ints(folded[:, j:j + 1])[0])
        assert got == want
    # folded codeword of a degree-8 poly has degree < 8/c over the new domain
    from libiop_tpu.algebra.fft import ifft
    newdom = MultiplicativeCoset(F, L.dim - eta, pow(L.shift, c, F.p))
    fc = ifft(folded, newdom)
    assert all(int(v) == 0 for v in F.to_ints(fc[:, 8 // c:]))


@pytest.mark.parametrize("localization", [[1, 1, 1], [1, 2]])
def test_fri_accepts_low_degree(localization, rng):
    F = edwards_fr()
    dim, degree_bound = 6, 8
    L = MultiplicativeCoset(F, dim=dim, shift=F.multiplicative_generator)
    coeffs = F.from_ints([int(rng.integers(0, 1 << 60)) for _ in range(degree_bound)])
    codeword = fft(coeffs, L)
    fri = _run_fri(codeword, degree_bound, dim, localization)
    assert fri.verifier_predicate()


def test_fri_rejects_high_degree(rng):
    F = edwards_fr()
    dim, degree_bound = 6, 8
    codeword = F.random((1 << dim,), rng)
    fri = _run_fri(codeword, degree_bound, dim, [1, 2])
    assert not fri.verifier_predicate()
