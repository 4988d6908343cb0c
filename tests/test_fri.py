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


@pytest.mark.parametrize("eta", [3, 4])
def test_batched_fold_high_eta(eta):
    """eta=3-4 folds (the reference's preferred localization sizes,
    test_aurora_snark.cpp:21) in one jitted dispatch, validated against the
    host-int Lagrange mirror."""
    from libiop_tpu.protocols.fri import (fold_codeword,
                                          interpolate_coset_at_point_ints)
    F = edwards_fr()
    dom = MultiplicativeCoset(F, 7, shift=F.multiplicative_generator)
    rng = np.random.default_rng(eta)
    ints = F.random_ints(dom.order, rng)
    x = F.random_ints(1, rng)[0]
    folded = F.to_ints(fold_codeword(F, F.from_ints(ints), dom, eta, x))
    c = 1 << eta
    nc = dom.order // c
    for j in range(nc):
        coset_vals = [ints[j + k * nc] for k in range(c)]
        shift = dom.element_by_index_int(j)
        assert int(folded[j]) == interpolate_coset_at_point_ints(
            F, coset_vals, shift, eta, x), j


def _random_localization_vector(rng, total: int):
    """random_vector_that_sums_to role (test_fri.cpp:243-280): a random
    composition of `total` into parts >= 1, prefixed by the mandatory 1."""
    parts = []
    remaining = total
    while remaining > 0:
        v = int(rng.integers(1, min(remaining, 3) + 1))
        parts.append(v)
        remaining -= v
    return [1] + parts


@pytest.mark.parametrize("seed", [0, 1])
def test_fri_random_localization_accepts(seed):
    """FRITrueRandomTest (test_fri.cpp:243-258), multiplicative."""
    rng = np.random.default_rng(seed)
    F = edwards_fr()
    dim, rs_extra = 8, 2
    localization = _random_localization_vector(rng, dim - rs_extra - 1)
    degree_bound = 1 << (dim - rs_extra)
    L = MultiplicativeCoset(F, dim=dim, shift=F.multiplicative_generator)
    coeffs = F.from_ints(F.random_ints(degree_bound, rng))
    fri = _run_fri(fft(coeffs, L), degree_bound, dim, localization, seed=seed)
    assert fri.verifier_predicate()


@pytest.mark.parametrize("seed", [2, 3])
def test_fri_random_localization_rejects(seed):
    """FRIFalseRandomTest (test_fri.cpp:260-280), multiplicative."""
    rng = np.random.default_rng(seed)
    F = edwards_fr()
    dim, rs_extra = 8, 2
    localization = _random_localization_vector(rng, dim - rs_extra - 1)
    degree_bound = 1 << (dim - rs_extra)
    codeword = F.random((1 << dim,), rng)
    fri = _run_fri(codeword, degree_bound, dim, localization, seed=seed)
    assert not fri.verifier_predicate()


def test_fri_early_stop_rejected(rng):
    """Multiplicative EarlyStop variant (test_fri.cpp:107-260): a codeword of
    degree one final-coset too high passes every fold consistency check but
    must fail the final-polynomial degree truncation."""
    from libiop_tpu.iop.runtime import RoundParameters
    F = edwards_fr()
    dim, rs_extra = 8, 2
    etas = [1, 2]
    dom = MultiplicativeCoset(F, dim, shift=F.multiplicative_generator)
    deg = 1 << (dim - rs_extra)
    iop = IOPProtocol(F, seed=5)
    lh = iop.register_domain(dom)
    iop.set_round_parameters(RoundParameters(1 << etas[0]), round=0)
    oh = iop.register_oracle(lh, deg)
    params = FRIParameters(F, 32, 32, FRISoundnessType.heuristic, deg, dim,
                           rs_extra, (1 << dim) - deg - 1, etas)
    params.num_query_repetitions = 4
    params.num_interactive_repetitions = 1
    fri = FRIProtocol(iop, params, lh, [oh])
    fri.register_interactions()
    iop.seal_interaction_registrations()
    fri.register_queries()
    iop.seal_query_registrations()
    # degree deg * 2^{last eta}: folds cleanly until the final round
    too_high = F.from_ints(F.random_ints(deg * (1 << etas[-1]), rng))
    iop.submit_oracle(oh, fft(too_high, dom))
    iop.signal_prover_round_done()
    fri.calculate_and_submit_proof()
    assert not fri.verifier_predicate()
