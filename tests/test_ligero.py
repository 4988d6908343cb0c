"""Ligero end-to-end: interactive IOP accept/reject (mirrors
tests/protocols/test_ligero.cpp at reduced size)."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.iop.runtime import IOPProtocol
from libiop_tpu.protocols.ligero import LigeroIOP, LigeroIOPParams
from libiop_tpu.relations.examples import generate_r1cs_example


def _params(F, make_zk, m=16, n=15):
    p = LigeroIOPParams(F, security_parameter=32, RS_extra_dimensions=2,
                        height_width_ratio=1.0, make_zk=make_zk,
                        num_constraints=m, num_variables=n)
    p.encoded_params.num_interactions = 1
    p.encoded_params.num_queries = 4
    p.direct_ldt_params.num_queries = 4
    p.ldt_reducer_params.num_output_LDT_instances = 1
    return p


def _run(make_zk, tamper_aux, seed, rng):
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(F, 16, 3, 15, rng)
    if tamper_aux:
        aux = list(aux)
        aux[0] = (aux[0] + 1) % F.p
    iop = IOPProtocol(F, seed=seed)
    lig = LigeroIOP(iop, cs, _params(F, make_zk),
                    rng=np.random.default_rng(8))
    lig.register_interactions()
    iop.seal_interaction_registrations()
    lig.register_queries()
    iop.seal_query_registrations()
    lig.produce_proof(primary, aux)
    return lig.verifier_predicate(primary)


@pytest.mark.parametrize("make_zk", [False, True])
def test_ligero_interactive_accepts(make_zk, rng):
    assert _run(make_zk, tamper_aux=False, seed=21, rng=rng)


def test_ligero_interactive_rejects_bad_witness(rng):
    assert not _run(False, tamper_aux=True, seed=22, rng=rng)
