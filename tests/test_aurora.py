"""Aurora end-to-end: interactive IOP (mirrors test_aurora_protocol.cpp) and
full SNARK round-trip (mirrors test_aurora_snark.cpp at reduced size)."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.iop.runtime import IOPProtocol
from libiop_tpu.protocols.aurora import AuroraIOP, AuroraIOPParams
from libiop_tpu.relations.examples import generate_r1cs_example
from libiop_tpu.snark.aurora import (AuroraSnarkParams, aurora_snark_prover,
                                     aurora_snark_verifier)


def _example(rng, m=16, k=3, n=15):
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(F, m, k, n, rng)
    assert cs.is_satisfied(primary, aux)
    return F, cs, primary, aux


def _iop_params(F, make_zk, m=16, n=15):
    p = AuroraIOPParams(F, security_parameter=32, RS_extra_dimensions=2,
                        make_zk=make_zk, num_constraints=m, num_variables=n,
                        fri_localization_parameter=1)
    p.fri_params.num_query_repetitions = 4
    p.fri_params.num_interactive_repetitions = 1
    p.ldt_reducer_params.num_output_LDT_instances = 1
    return p


@pytest.mark.parametrize("make_zk", [
    pytest.param(False, marks=pytest.mark.heavy), True])
def test_aurora_iop_interactive(make_zk, rng):
    F, cs, primary, aux = _example(rng)
    iop = IOPProtocol(F, seed=42)
    aurora = AuroraIOP(iop, cs, _iop_params(F, make_zk),
                       rng=np.random.default_rng(5))
    aurora.register_interactions()
    iop.seal_interaction_registrations()
    aurora.register_queries()
    iop.seal_query_registrations()
    aurora.produce_proof(primary, aux)
    assert aurora.verifier_predicate(primary)


def test_aurora_iop_invalid_witness_rejected(rng):
    F, cs, primary, aux = _example(rng)
    bad_aux = list(aux)
    bad_aux[0] = (bad_aux[0] + 1) % F.p
    iop = IOPProtocol(F, seed=43)
    params = _iop_params(F, False)
    params.fri_params.num_query_repetitions = 12
    aurora = AuroraIOP(iop, cs, params, rng=np.random.default_rng(6))
    aurora.register_interactions()
    iop.seal_interaction_registrations()
    aurora.register_queries()
    iop.seal_query_registrations()
    aurora.produce_proof(primary, bad_aux)
    assert not aurora.verifier_predicate(primary)


def _snark_params(make_zk, pow_bits=0):
    return AuroraSnarkParams(
        security_parameter=32, RS_extra_dimensions=2,
        fri_localization_parameter=1, make_zk=make_zk, pow_bits=pow_bits,
        override_fri_queries=4, override_fri_interactive_repetitions=1,
        override_ldt_instances=1)


@pytest.mark.parametrize("make_zk", [False, True])
def test_aurora_snark_roundtrip(make_zk, rng):
    F, cs, primary, aux = _example(rng)
    params = _snark_params(make_zk, pow_bits=3)
    proof = aurora_snark_prover(cs, primary, aux, params,
                                rng=np.random.default_rng(9))
    assert aurora_snark_verifier(cs, primary, proof, params)
    # serialization round-trip preserves verification
    from libiop_tpu.bcs.common import BCSTranscript
    proof2 = BCSTranscript.deserialize(proof.serialize())
    assert aurora_snark_verifier(cs, primary, proof2, params)


def test_aurora_snark_rejects_tampered_proof(rng):
    F, cs, primary, aux = _example(rng)
    params = _snark_params(False)
    proof = aurora_snark_prover(cs, primary, aux, params,
                                rng=np.random.default_rng(9))
    key = sorted(proof.mt_roots)[0]
    bad = bytearray(proof.mt_roots[key])
    bad[0] ^= 255
    proof.mt_roots[key] = bytes(bad)
    assert not aurora_snark_verifier(cs, primary, proof, params)


def test_aurora_snark_rejects_wrong_input(rng):
    F, cs, primary, aux = _example(rng)
    params = _snark_params(False)
    params.override_fri_queries = 8
    proof = aurora_snark_prover(cs, primary, aux, params,
                                rng=np.random.default_rng(9))
    bad_primary = list(primary)
    bad_primary[0] = (bad_primary[0] + 1) % F.p
    assert not aurora_snark_verifier(cs, bad_primary, proof, params)
