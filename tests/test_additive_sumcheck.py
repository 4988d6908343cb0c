"""Batch sumcheck over an additive (GF(2^64) affine subspace) domain —
the eps-trick branch (mirrors tests/protocols/test_sumcheck.cpp additive
variants)."""
import numpy as np
import pytest

from libiop_tpu.fields.binary import gf64
from libiop_tpu.algebra.subspace import AffineSubspace, additive_fft, additive_ifft
from libiop_tpu.iop.runtime import IOPProtocol
from libiop_tpu.protocols.sumcheck import BatchSumcheck


def _low_degree(iop, handle):
    dom = iop.get_oracle_domain(handle)
    bound = iop.get_oracle_degree_bound(handle)
    coeffs = additive_ifft(iop.get_oracle_evaluations(handle), dom)
    F = iop.F
    return all(int(v) == 0 for v in F.to_ints(coeffs[:, bound:]))


def _run(make_zk, offset, rng):
    F = gf64()
    H = AffineSubspace(F, dim=3, shift=0)
    # disjoint codeword domain: shift outside span(basis of L)
    L = AffineSubspace(F, dim=5, shift=1 << 6)
    degree_bound = 2 * H.order

    iop = IOPProtocol(F, seed=17)
    h_sum = iop.register_domain(H)
    h_cw = iop.register_domain(L)
    sc = BatchSumcheck(iop, h_sum, h_cw, degree_bound, make_zk=make_zk,
                       rng=np.random.default_rng(3))
    if make_zk:
        sc.register_masking_polynomial()
    f_handle = iop.register_oracle(h_cw, degree_bound)

    coeff_ints = [int.from_bytes(rng.bytes(8), "little")
                  for _ in range(degree_bound)]
    coeffs = F.from_ints(coeff_ints)
    f_evals_L = additive_fft(coeffs, L)
    # true sum: evaluate pointwise over H (degree exceeds |H|)
    true_sum = 0
    for i in range(H.order):
        x = H.element_by_index_int(i)
        acc = 0
        for c in reversed(coeff_ints):
            acc = F.mul_ints(acc, x) ^ c
        true_sum ^= acc

    sc.attach_oracle_for_summing(f_handle, true_sum ^ offset)
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
def test_additive_sumcheck_true_claim(make_zk, rng):
    iop, sc = _run(make_zk, 0, rng)
    assert _low_degree(iop, sc.h_handle)
    assert _low_degree(iop, sc.g_handle)
    # pointwise/vectorized agreement of the reconstructed g
    F = iop.F
    ev = iop.get_oracle_evaluations(sc.g_handle)
    for pos in [0, 7, 31]:
        vec = int(F.to_ints(ev[:, pos:pos + 1])[0])
        pt = iop.get_oracle_evaluation_at_position(sc.g_handle, pos)
        assert vec == pt


def test_additive_sumcheck_false_claim_rejected(rng):
    iop, sc = _run(False, 1, rng)
    assert _low_degree(iop, sc.h_handle)
    assert not _low_degree(iop, sc.g_handle)
