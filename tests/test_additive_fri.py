"""FRI over affine subspaces of GF(2^64): accept/reject/early-stop variants
(mirrors tests/protocols/test_fri.cpp:107-260's additive half)."""
import os
import pytest
import numpy as np

from libiop_tpu.fields.binary import gf64
from libiop_tpu.algebra.generic import (element_outside_of_subset, fft_any,
                                        make_domain)
from libiop_tpu.iop.runtime import IOPProtocol, RoundParameters
from libiop_tpu.protocols.fri import (FRIParameters, FRIProtocol,
                                      FRISoundnessType, fold_codeword_additive,
                                      interpolate_coset_additive_ints,
                                      localizer_vanishing)

DIM = 8
RS_EXTRA = 2


def _run_fri(etas, kind="true", seed=1, degree_shrink=0):
    """kind: true | random | early_stop (degree too high by one coset)."""
    F = gf64()
    L = make_domain(F, DIM, shift=element_outside_of_subset(F, DIM))
    deg = (1 << (DIM - RS_EXTRA)) >> degree_shrink
    iop = IOPProtocol(F, seed=seed)
    lh = iop.register_domain(L)
    iop.set_round_parameters(RoundParameters(1 << etas[0]), round=0)
    oh = iop.register_oracle(lh, deg)
    params = FRIParameters(F, 32, 32, FRISoundnessType.heuristic, deg, DIM,
                           RS_EXTRA, (1 << DIM) - deg - 1, etas)
    params.num_query_repetitions = 4
    params.num_interactive_repetitions = 1
    fri = FRIProtocol(iop, params, lh, [oh])
    fri.register_interactions()
    iop.seal_interaction_registrations()
    fri.register_queries()
    iop.seal_query_registrations()
    rng = np.random.default_rng(seed)
    if kind == "true":
        evals = fft_any(F.from_ints(F.random_ints(deg, rng)), L)
    elif kind == "early_stop":
        # degree exactly one coset too high: must fail the final-poly check
        evals = fft_any(F.from_ints(F.random_ints(
            deg * (1 << etas[-1]), rng)), L)
    else:
        evals = F.from_ints(F.random_ints(L.order, rng))
    iop.submit_oracle(oh, evals)
    iop.signal_prover_round_done()
    fri.calculate_and_submit_proof()
    return fri.verifier_predicate()


@pytest.mark.parametrize("etas", [[1, 1, 1], [1, 2, 2], [2, 2]])
def test_additive_fri_accepts_low_degree(etas):
    assert _run_fri(etas, "true")


@pytest.mark.parametrize("etas", [[1, 1, 1], [2, 2]])
def test_additive_fri_rejects_random_word(etas):
    assert not _run_fri(etas, "random")


def test_additive_fri_domain_chain_consistency():
    """q^(i) must map domain i's coset representatives onto domain i+1's
    element enumeration (the chain-consistency invariant the verifier
    relies on, fri_ldt.tcc:280-339)."""
    F = gf64()
    L = make_domain(F, DIM, shift=element_outside_of_subset(F, DIM))
    iop = IOPProtocol(F)
    lh = iop.register_domain(L)
    oh = iop.register_oracle(lh, 1 << (DIM - RS_EXTRA))
    params = FRIParameters(F, 32, 32, FRISoundnessType.heuristic,
                           1 << (DIM - RS_EXTRA), DIM, RS_EXTRA,
                           (1 << DIM) - (1 << (DIM - RS_EXTRA)) - 1, [1, 2])
    fri = FRIProtocol(iop, params, lh, [oh])
    for i, eta in enumerate(params.localization_parameters):
        dom, nxt = fri.domains[i], fri.domains[i + 1]
        c = 1 << eta
        for j in range(0, nxt.order, max(1, nxt.order // 8)):
            rep = dom.element_by_index_int(dom.position_by_coset_indices(j, 0, c))
            assert fri._localizer_map_int(i, rep) == nxt.element_by_index_int(j)
            # every coset member maps to the same point
            other = dom.element_by_index_int(
                dom.position_by_coset_indices(j, c - 1, c))
            assert fri._localizer_map_int(i, other) == nxt.element_by_index_int(j)


def test_additive_fold_matches_host_interpolation():
    """Device fold == host-int Lagrange mirror on every coset, including a
    challenge INSIDE the domain (the masked-select special case)."""
    F = gf64()
    L = make_domain(F, 6, shift=element_outside_of_subset(F, 6))
    eta = 2
    c = 1 << eta
    rng = np.random.default_rng(3)
    ints = F.random_ints(L.order, rng)
    evals = F.from_ints(ints)
    Z = localizer_vanishing(L, eta)
    for x in [F.random_ints(1, rng)[0], L.element_by_index_int(5)]:
        folded = F.to_ints(fold_codeword_additive(F, evals, L, eta, x))
        for j in range(L.order // c):
            shift = L.element_by_index_int(j * c)
            expected = interpolate_coset_additive_ints(
                F, ints[j * c:(j + 1) * c], shift, Z, L.basis[:eta], x)
            assert int(folded[j]) == expected, (j, x)


def test_additive_fri_early_stop_rejected():
    """Degree exactly one coset too high must fail the final-poly check
    (test_fri.cpp EarlyStop variant, additive half)."""
    assert not _run_fri([1, 2], "early_stop")


def _random_localization_vector(rng, total: int):
    """random_vector_that_sums_to role (test_fri.cpp:243-280)."""
    parts = []
    remaining = total
    while remaining > 0:
        v = int(rng.integers(1, min(remaining, 3) + 1))
        parts.append(v)
        remaining -= v
    return [1] + parts


@pytest.mark.parametrize("seed", [0, 1])
def test_additive_fri_random_localization_accepts(seed):
    """FRITrueRandomTest (test_fri.cpp:243-258), additive half."""
    rng = np.random.default_rng(seed)
    etas = _random_localization_vector(rng, DIM - RS_EXTRA - 1)
    assert _run_fri(etas, "true", seed=seed)


@pytest.mark.parametrize("seed", [2, 3])
def test_additive_fri_random_localization_rejects(seed):
    """FRIFalseRandomTest (test_fri.cpp:260-280), additive half."""
    rng = np.random.default_rng(seed)
    etas = _random_localization_vector(rng, DIM - RS_EXTRA - 1)
    assert not _run_fri(etas, "random", seed=seed)
