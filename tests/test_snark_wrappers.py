"""Ligero SNARK and FRI SNARK round trips (mirrors test_ligero_snark.cpp /
fri_snark benchmark path at reduced size)."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.relations.examples import generate_r1cs_example
from libiop_tpu.snark.ligero import (LigeroSnarkParams, ligero_snark_prover,
                                     ligero_snark_verifier)
from libiop_tpu.snark.fri import (FRISnarkParams, fri_snark_prover,
                                  fri_snark_verifier)
from libiop_tpu.bcs.common import BCSTranscript


@pytest.mark.parametrize("make_zk", [False, True])
def test_ligero_snark_roundtrip(make_zk, rng):
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(F, 16, 3, 15, rng)
    params = LigeroSnarkParams(
        security_parameter=32, RS_extra_dimensions=2, make_zk=make_zk,
        pow_bits=2, override_num_interactions=1, override_num_queries=4,
        override_ldt_instances=1)
    proof = ligero_snark_prover(cs, primary, aux, params,
                                rng=np.random.default_rng(7))
    blob = proof.serialize()
    assert ligero_snark_verifier(cs, primary,
                                 BCSTranscript.deserialize(blob), params)
    # tampering is rejected
    bad = bytearray(blob)
    bad[60] ^= 1
    assert not ligero_snark_verifier(
        cs, primary, BCSTranscript.deserialize(bytes(bad)), params)


def test_fri_snark_roundtrip(rng):
    F = edwards_fr()
    params = FRISnarkParams(
        security_parameter=32, codeword_domain_dim=8, RS_extra_dimensions=2,
        localization_parameter=1, num_oracles=2, pow_bits=2,
        override_fri_queries=4, override_fri_interactive_repetitions=1)
    proof = fri_snark_prover(F, params, rng=np.random.default_rng(3))
    assert fri_snark_verifier(F, proof, params)
    key = sorted(proof.mt_roots)[0]
    bad = bytearray(proof.mt_roots[key])
    bad[0] ^= 1
    proof.mt_roots[key] = bytes(bad)
    assert not fri_snark_verifier(F, proof, params)
