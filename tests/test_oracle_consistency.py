"""Blanket pointwise-vs-vectorized consistency sweep over EVERY virtual
oracle of a full Aurora proof, both domain families (the reference's
test_oracle_consistency helper, tests/protocols/utilities.cpp:20-130, run
exhaustively instead of per-protocol)."""
import numpy as np
import pytest

from libiop_tpu.fields.binary import gf64
from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.iop.runtime import IOPProtocol
from libiop_tpu.protocols.aurora import AuroraIOP, AuroraIOPParams
from libiop_tpu.relations.examples import generate_r1cs_example
from protocol_utils import sweep_all_virtual_oracles


@pytest.mark.parametrize("F_fn,make_zk", [
    (edwards_fr, False),
    pytest.param(edwards_fr, True, marks=pytest.mark.heavy),
    (gf64, False)])
def test_every_virtual_oracle_consistent(F_fn, make_zk):
    F = F_fn()
    n = 16
    cs, primary, aux = generate_r1cs_example(F, n, 3, n - 1,
                                             np.random.default_rng(8))
    params = AuroraIOPParams(F, 32, 2, make_zk, n, n - 1,
                             fri_localization_parameter=1)
    params.fri_params.num_query_repetitions = 2
    params.fri_params.num_interactive_repetitions = 1
    params.ldt_reducer_params.num_output_LDT_instances = 1
    iop = IOPProtocol(F, seed=4)
    aurora = AuroraIOP(iop, cs, params, rng=np.random.default_rng(9))
    aurora.register_interactions()
    iop.seal_interaction_registrations()
    aurora.register_queries()
    iop.seal_query_registrations()
    aurora.produce_proof(primary, aux)
    assert aurora.verifier_predicate(primary)
    # the sweep: every registered virtual oracle (fz, rowcheck, lincheck,
    # sumcheck-g, combined-LDT, ...) must agree pointwise with its codeword
    N = iop.get_domain(aurora.codeword_handle).num_elements()
    positions = [0, 1, N // 3, N - 1]
    sweep_all_virtual_oracles(iop, positions)
