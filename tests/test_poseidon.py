"""Poseidon sponge/hashchain + BCS-with-Poseidon round trip
(mirrors tests/snark/test_poseidon.cpp role + algebraic-hash BCS paths)."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.bcs.poseidon import (PoseidonParams, AlgebraicSponge,
                                     PoseidonHashing, PoseidonHashchain)
from libiop_tpu.bcs.merkle import MerkleTree, validate_multi_proof


def test_permutation_deterministic_and_mixing():
    F = edwards_fr()
    pp = PoseidonParams(F)
    s1 = pp.permute([1, 2, 3])
    s2 = pp.permute([1, 2, 3])
    assert s1 == s2
    assert s1 != [1, 2, 3]
    s3 = pp.permute([1, 2, 4])
    assert s1 != s3
    assert all(0 <= v < F.p for v in s1)


def test_sponge_absorb_squeeze_deterministic():
    F = edwards_fr()
    pp = PoseidonParams(F)
    sp1 = AlgebraicSponge(pp)
    sp1.absorb([5, 6, 7])
    out1 = sp1.squeeze(3)
    sp2 = AlgebraicSponge(pp)
    sp2.absorb([5, 6, 7])
    assert sp2.squeeze(3) == out1
    sp3 = AlgebraicSponge(pp)
    sp3.absorb([5, 6, 8])
    assert sp3.squeeze(3) != out1


def test_poseidon_merkle_roundtrip():
    F = edwards_fr()
    hasher = PoseidonHashing(F)
    leaves = [bytes([i] * 8) for i in range(16)]
    mt = MerkleTree(hasher, leaves)
    positions = [3, 9]
    aux = mt.multi_proof(positions)
    assert validate_multi_proof(hasher, mt.root, 16, positions,
                                [leaves[p] for p in positions], aux)
    bad = leaves[3][:-1] + b"\xff"
    assert not validate_multi_proof(hasher, mt.root, 16, positions,
                                    [bad, leaves[9]], aux)


def test_poseidon_hashchain_determinism():
    F = edwards_fr()
    h1 = PoseidonHashchain(F)
    h1.absorb_root(b"\x01" * F.elem_bytes)
    h1.absorb_field_elements([7, 8])
    a = h1.squeeze_field_elements(2)
    q = h1.squeeze_query_positions(2, 64)
    h2 = PoseidonHashchain(F)
    h2.absorb_root(b"\x01" * F.elem_bytes)
    h2.absorb_field_elements([7, 8])
    assert h2.squeeze_field_elements(2) == a
    assert h2.squeeze_query_positions(2, 64) == q
    assert all(0 <= v < 64 for v in q)


def test_aurora_snark_with_poseidon(rng):
    """Full Aurora round trip with the algebraic hash suite."""
    from libiop_tpu.relations.examples import generate_r1cs_example
    from libiop_tpu.snark.aurora import (AuroraSnarkParams,
                                         aurora_snark_prover,
                                         aurora_snark_verifier)
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(F, 16, 3, 15, rng)
    params = AuroraSnarkParams(
        security_parameter=32, RS_extra_dimensions=2,
        fri_localization_parameter=1, make_zk=False, hash_name="poseidon",
        override_fri_queries=3, override_fri_interactive_repetitions=1,
        override_ldt_instances=1)
    proof = aurora_snark_prover(cs, primary, aux, params,
                                rng=np.random.default_rng(9))
    assert aurora_snark_verifier(cs, primary, proof, params)
    key = sorted(proof.mt_roots)[0]
    bad = bytearray(proof.mt_roots[key])
    bad[0] ^= 1
    proof.mt_roots[key] = bytes(bad)
    assert not aurora_snark_verifier(cs, primary, proof, params)


def test_high_alpha_poseidon_aurora_roundtrip():
    """hash_enum parity (hash_enum.hpp:21-27): the third enum — high-alpha
    Poseidon (alpha=17, near-MDS) — must drive a full Aurora SNARK."""
    import numpy as np
    from libiop_tpu.fields.prime import alt_bn128_fr
    from libiop_tpu.relations.examples import generate_r1cs_example
    from libiop_tpu.snark.aurora import (AuroraSnarkParams,
                                         aurora_snark_prover,
                                         aurora_snark_verifier)
    from libiop_tpu.bcs.common import BCSTranscript
    F = alt_bn128_fr()
    cs, primary, aux = generate_r1cs_example(F, 16, 3, 15,
                                             np.random.default_rng(77))
    params = AuroraSnarkParams(
        security_parameter=32, RS_extra_dimensions=2,
        fri_localization_parameter=1, hash_name="poseidon_high_alpha",
        override_fri_queries=3, override_fri_interactive_repetitions=1,
        override_ldt_instances=1)
    proof = aurora_snark_prover(cs, primary, aux, params,
                                rng=np.random.default_rng(78))
    assert aurora_snark_verifier(
        cs, primary, BCSTranscript.deserialize(proof.serialize()), params)


def test_derived_round_counts_match_reference_table():
    """The interpolation-bound derivation reproduces the reference's
    alpha=5 table value (56 partial rounds at 128-bit over BN254,
    poseidon.tcc:312-320) instead of asserting magic numbers."""
    from libiop_tpu.fields.prime import alt_bn128_fr
    from libiop_tpu.bcs.poseidon import derived_partial_rounds
    F = alt_bn128_fr()
    assert derived_partial_rounds(5, 3, 128, F.p.bit_length()) == 56
    # high-alpha: our bound (33) is at or above the reference's Grobner 29
    assert derived_partial_rounds(17, 3, 128, F.p.bit_length()) >= 29
