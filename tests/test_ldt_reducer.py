"""LDT-reducer test matrix (role of tests/protocols/test_ldt_reducer.cpp's 16
cases): {multiplicative, additive} x {non-zk, zk} x {uniform degrees,
submaximal X^Delta bump} x {accept, reject}."""
import numpy as np
import pytest

from libiop_tpu.fields.binary import gf64
from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.algebra.generic import (element_outside_of_subset, fft_any,
                                        make_domain)
from libiop_tpu.iop.runtime import IOPProtocol, RoundParameters
from libiop_tpu.protocols.fri import FRIParameters, FRIProtocol, FRISoundnessType
from libiop_tpu.protocols.ldt_reducer import (LDTInstanceReducer,
                                              LDTReducerParams,
                                              LDTReducerSoundnessType)

DIM = 8
RS_EXTRA = 2


def _run_reducer(F, make_zk, submaximal, cheat, seed=3):
    """Build two oracles (equal or mixed degrees), reduce, FRI-test.
    cheat: submit a too-high-degree codeword for oracle 1."""
    L = make_domain(F, DIM, shift=element_outside_of_subset(F, DIM))
    max_deg = 1 << (DIM - RS_EXTRA)
    degs = [max_deg, max_deg // 4 if submaximal else max_deg]
    iop = IOPProtocol(F, seed=seed)
    lh = iop.register_domain(L)
    iop.set_round_parameters(RoundParameters(2), round=0)
    handles = [iop.register_oracle(lh, d) for d in degs]
    params = LDTReducerParams(F, 32, LDTReducerSoundnessType.optimistic_heuristic,
                              DIM, max_deg, max_deg, make_zk)
    params.num_output_LDT_instances = 1
    reducer = LDTInstanceReducer(iop, lh, params,
                                 rng=np.random.default_rng(seed))
    fri_params = FRIParameters(F, 32, 32, FRISoundnessType.heuristic, max_deg,
                               DIM, RS_EXTRA,
                               params.absolute_proximity_parameter, [1, 1])
    fri_params.num_query_repetitions = 4
    fri_params.num_interactive_repetitions = 1
    reducer.set_ldt(lambda iop_, cwh, comb: FRIProtocol(
        iop_, fri_params, cwh, comb))
    reducer.register_interactions(handles)
    iop.seal_interaction_registrations()
    reducer.register_queries()
    iop.seal_query_registrations()
    rng = np.random.default_rng(seed + 1)
    for h, d in zip(handles, degs):
        actual_d = L.order if (cheat and h is handles[1]) else d
        if cheat and h is handles[1]:
            evals = F.from_ints(F.random_ints(L.order, rng))
        else:
            evals = fft_any(F.from_ints(F.random_ints(d, rng)), L)
        iop.submit_oracle(h, evals)
    reducer.submit_masking_polynomial()
    iop.signal_prover_round_done()
    reducer.calculate_and_submit_proof()
    return reducer.verifier_predicate()


MATRIX = [(F_fn, zk, sub)
          for F_fn in (edwards_fr, gf64)
          for zk in (False, True)
          for sub in (False, True)]


@pytest.mark.parametrize("F_fn,zk,sub", MATRIX)
def test_reducer_accepts_low_degree(F_fn, zk, sub):
    assert _run_reducer(F_fn(), zk, sub, cheat=False)


@pytest.mark.parametrize("F_fn,zk,sub", [
    (edwards_fr, False, False), (edwards_fr, True, True),
    (gf64, False, True), (gf64, True, False)])
def test_reducer_rejects_high_degree(F_fn, zk, sub):
    assert not _run_reducer(F_fn(), zk, sub, cheat=True)
