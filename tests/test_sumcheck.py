"""Interactive batch-sumcheck tests (mirrors tests/protocols/test_sumcheck.cpp):
true claimed sum -> g,h low degree; false claimed sum -> g exceeds its bound."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.algebra.domains import MultiplicativeCoset
from libiop_tpu.algebra.fft import fft
from libiop_tpu.algebra.poly import horner_eval
from libiop_tpu.iop.runtime import IOPProtocol
from libiop_tpu.protocols.sumcheck import BatchSumcheck

from protocol_utils import sum_over_domain_ints, oracle_is_low_degree, \
    assert_oracle_consistency


def _run_sumcheck(make_zk: bool, claimed_sum_offset: int, rng):
    F = edwards_fr()
    H = MultiplicativeCoset(F, dim=3, shift=1)
    L = MultiplicativeCoset(F, dim=5, shift=F.multiplicative_generator)
    degree_bound = 2 * H.order

    iop = IOPProtocol(F, seed=7)
    h_sum = iop.register_domain(H)
    h_cw = iop.register_domain(L)
    sc = BatchSumcheck(iop, h_sum, h_cw, degree_bound, make_zk=make_zk,
                       rng=np.random.default_rng(3))
    if make_zk:
        sc.register_masking_polynomial()
    f_handle = iop.register_oracle(h_cw, degree_bound)

    f_coeffs = F.from_ints([int(rng.integers(0, 1 << 61)) for _ in range(degree_bound)])
    f_evals_L = fft(f_coeffs, L)
    f_evals_H = horner_eval(F, f_coeffs, H.elements())
    true_sum = sum_over_domain_ints(F, f_evals_H)

    sc.attach_oracle_for_summing(f_handle, (true_sum + claimed_sum_offset) % F.p)
    sc.register_challenge()
    sc.register_proof()
    iop.seal_interaction_registrations()
    iop.seal_query_registrations()

    if make_zk:
        sc.submit_masking_polynomial()
    iop.submit_oracle(f_handle, f_evals_L)
    iop.signal_prover_round_done()
    sc.calculate_and_submit_proof()
    iop.signal_prover_round_done()
    return iop, sc


@pytest.mark.parametrize("make_zk", [False, True])
def test_sumcheck_true_claim_accepts(make_zk, rng):
    iop, sc = _run_sumcheck(make_zk, 0, rng)
    assert oracle_is_low_degree(iop, sc.h_handle)
    assert oracle_is_low_degree(iop, sc.g_handle)
    assert_oracle_consistency(iop, sc.g_handle, [0, 3, 17, 31])


def test_sumcheck_false_claim_rejects(rng):
    iop, sc = _run_sumcheck(False, 1, rng)
    # h is still low degree, but the reconstructed g is not
    assert oracle_is_low_degree(iop, sc.h_handle)
    assert not oracle_is_low_degree(iop, sc.g_handle)
