"""Fractal end-to-end: interactive holographic IOP and three-phase SNARK
(mirrors tests/protocols/test_fractal.cpp + tests/snark/test_fractal_snark.cpp
at reduced size)."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.iop.runtime import IOPProtocol
from libiop_tpu.protocols.fractal import FractalIOP, FractalIOPParams
from libiop_tpu.relations.examples import generate_r1cs_example
from libiop_tpu.snark.fractal import (FractalSnarkParams,
                                      fractal_snark_indexer,
                                      fractal_snark_prover,
                                      fractal_snark_verifier)


def _iop_params(F, r1cs, make_zk):
    p = FractalIOPParams(F, security_parameter=32, pow_bits=0,
                         RS_extra_dimensions=1, make_zk=make_zk, r1cs=r1cs,
                         fri_localization_parameter=1)
    p.fri_params.num_query_repetitions = 4
    p.fri_params.num_interactive_repetitions = 1
    p.ldt_reducer_params.num_output_LDT_instances = 1
    p.encoded_params.holographic_lincheck_params.num_repetitions = 1
    return p


@pytest.mark.parametrize("make_zk", [
    False, pytest.param(True, marks=pytest.mark.heavy)])
def test_fractal_iop_interactive(make_zk, rng):
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(F, 16, 3, 15, rng)
    iop = IOPProtocol(F, seed=31)
    fr = FractalIOP(iop, cs, _iop_params(F, cs, make_zk),
                    rng=np.random.default_rng(4))
    fr.register_interactions()
    iop.seal_interaction_registrations()
    fr.register_queries()
    iop.seal_query_registrations()
    fr.produce_index()
    fr.produce_proof(primary, aux)
    assert fr.verifier_predicate(primary)


def test_fractal_iop_invalid_witness_rejected(rng):
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(F, 16, 3, 15, rng)
    bad_aux = list(aux)
    bad_aux[0] = (bad_aux[0] + 1) % F.p
    iop = IOPProtocol(F, seed=32)
    params = _iop_params(F, cs, False)
    params.fri_params.num_query_repetitions = 12
    fr = FractalIOP(iop, cs, params, rng=np.random.default_rng(4))
    fr.register_interactions()
    iop.seal_interaction_registrations()
    fr.register_queries()
    iop.seal_query_registrations()
    fr.produce_index()
    fr.produce_proof(primary, bad_aux)
    assert not fr.verifier_predicate(primary)


def _snark_params():
    return FractalSnarkParams(
        security_parameter=32, RS_extra_dimensions=1,
        fri_localization_parameter=1, make_zk=False, pow_bits=2,
        override_fri_queries=4, override_fri_interactive_repetitions=1,
        override_ldt_instances=1, override_lincheck_repetitions=1)


def test_fractal_snark_three_phase(rng):
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(F, 16, 3, 15, rng)
    params = _snark_params()
    prover_index, verifier_index = fractal_snark_indexer(
        cs, params, rng=np.random.default_rng(2))
    proof = fractal_snark_prover(cs, primary, aux, prover_index, params,
                                 rng=np.random.default_rng(3))
    assert fractal_snark_verifier(cs, primary, verifier_index, proof, params)


def test_fractal_snark_rejects_wrong_index_roots(rng):
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(F, 16, 3, 15, rng)
    params = _snark_params()
    prover_index, verifier_index = fractal_snark_indexer(
        cs, params, rng=np.random.default_rng(2))
    proof = fractal_snark_prover(cs, primary, aux, prover_index, params,
                                 rng=np.random.default_rng(3))
    bad_index = dict(verifier_index)
    key = sorted(bad_index)[0]
    ba = bytearray(bad_index[key])
    ba[0] ^= 1
    bad_index[key] = bytes(ba)
    assert not fractal_snark_verifier(cs, primary, bad_index, proof, params)


def test_fractal_index_is_true_checkpoint(rng):
    """Proving from a persisted index must do ZERO round-0 leaf serialization
    or hashing (bcs_prover.tcc:11-21 preprocessing semantics), and two proofs
    from one index must both verify."""
    import libiop_tpu.bcs.prover as bp
    from libiop_tpu.bcs.common import BCSTranscript
    from libiop_tpu.snark.fractal import (fractal_snark_indexer,
                                          fractal_snark_prover,
                                          fractal_snark_verifier)
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(F, 16, 3, 15, rng)
    params = FractalSnarkParams(
        security_parameter=32, RS_extra_dimensions=2,
        fri_localization_parameter=1, override_fri_queries=3,
        override_fri_interactive_repetitions=1, override_ldt_instances=1)
    pidx, vidx = fractal_snark_indexer(cs, params)
    assert pidx[2], "prover index carries no Merkle checkpoint data"
    index_keys = set(pidx[2].keys())
    built = []
    orig = bp.MerkleTree

    class CountingMT(orig):
        def __init__(self, hasher, blocks, make_zk=False, _salts=None):
            built.append(len(blocks))
            super().__init__(hasher, blocks, make_zk=make_zk, _salts=_salts)

    rehydrated = []
    orig_from_nodes = orig.from_nodes.__func__

    def counting_from_nodes(cls, hasher, num_leaves, nodes, **kw):
        rehydrated.append(num_leaves)
        return orig_from_nodes(cls, hasher, num_leaves, nodes, **kw)

    bp.MerkleTree = CountingMT
    CountingMT.from_nodes = classmethod(counting_from_nodes)
    try:
        proof = fractal_snark_prover(cs, primary, aux, pidx, params,
                                     rng=np.random.default_rng(5))
    finally:
        bp.MerkleTree = orig
    # every index tree was rehydrated from the checkpoint (zero hashing);
    # freshly built trees are exactly the non-index rounds
    assert len(rehydrated) == len(index_keys) >= 1
    blob = proof.serialize()
    assert fractal_snark_verifier(
        cs, primary, vidx, BCSTranscript.deserialize(blob), params)
    proof2 = fractal_snark_prover(cs, primary, aux, pidx, params,
                                  rng=np.random.default_rng(6))
    assert fractal_snark_verifier(
        cs, primary, vidx, BCSTranscript.deserialize(proof2.serialize()), params)
