"""BCS transformation round-trip tests with a dummy 2-round protocol
(mirrors tests/bcs/test_bcs_transformation.cpp + test_merkle_tree.cpp)."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.algebra.domains import MultiplicativeCoset
from libiop_tpu.iop.runtime import RoundParameters, VirtualOracle
from libiop_tpu.bcs.common import BCSParameters, BCSTranscript
from libiop_tpu.bcs.prover import BCSProver
from libiop_tpu.bcs.verifier import BCSVerifier, BCSVerificationError
from libiop_tpu.bcs.merkle import MerkleTree, validate_multi_proof
from libiop_tpu.bcs.hashing import Blake2bHashing


class SumOracle(VirtualOracle):
    def __init__(self, F):
        self.F = F

    def evaluated_contents(self, evals):
        return self.F.add(evals[0], evals[1])

    def evaluation_at_point(self, position, point_int, vals):
        return (vals[0] + vals[1]) % self.F.p


def _build(engine, F, dom, evals_ints):
    dh = engine.register_domain(dom)
    o1 = engine.register_oracle(dh, 8)
    o2 = engine.register_oracle(dh, 8, make_zk=True)
    m1 = engine.register_prover_message(2)
    v1 = engine.register_verifier_random_message(3)
    o3 = engine.register_oracle(dh, 8)
    engine.set_round_parameters(RoundParameters(quotient_map_size=2), round=1)
    vo = engine.register_virtual_oracle(dh, 16, [o1, o3], SumOracle(F))
    engine.seal_interaction_registrations()
    qp = engine.register_random_query_position(dh)
    q1 = engine.register_query(o1, qp)
    q2 = engine.register_query(o2, qp)
    q3 = engine.register_query(vo, qp)
    engine.seal_query_registrations()
    return dict(dh=dh, o1=o1, o2=o2, o3=o3, m1=m1, v1=v1, vo=vo,
                qp=qp, q1=q1, q2=q2, q3=q3)


@pytest.fixture
def setup(rng):
    F = edwards_fr()
    dom = MultiplicativeCoset(F, dim=4)
    evals_ints = [[int(rng.integers(0, 1 << 60)) for _ in range(16)] for _ in range(3)]
    params = BCSParameters(security_bits=128, pow_bits=4)
    return F, dom, evals_ints, params


def _prove(F, dom, evals_ints, params):
    p = BCSProver(F, params)
    h = _build(p, F, dom, evals_ints)
    assert p.num_interaction_rounds == 2
    p.submit_oracle(h["o1"], F.from_ints(evals_ints[0]))
    p.submit_oracle(h["o2"], F.from_ints(evals_ints[1]))
    p.submit_prover_message(h["m1"], [5, 7])
    p.signal_prover_round_done()
    r = p.obtain_verifier_random_message(h["v1"])
    p.submit_oracle(h["o3"], F.from_ints(evals_ints[2]))
    p.signal_prover_round_done()
    t = p.get_transcript()
    return p, h, r, t


def test_bcs_roundtrip(setup):
    F, dom, evals_ints, params = setup
    p, h, r, t = _prove(F, dom, evals_ints, params)

    # serialization round-trip
    t2 = BCSTranscript.deserialize(t.serialize())
    v = BCSVerifier(F, params, t2)
    hv = _build(v, F, dom, evals_ints)
    assert v.transcript_is_valid()
    # verifier randomness matches the prover's Fiat-Shamir stream
    assert v.obtain_verifier_random_message(hv["v1"]) == r
    v.finalize_query_positions()
    pos = v.obtain_query_position(hv["qp"])
    assert pos == p.obtain_query_position(h["qp"])
    assert v.obtain_query_response(hv["q1"]) == evals_ints[0][pos]
    assert v.obtain_query_response(hv["q2"]) == evals_ints[1][pos]
    assert v.obtain_query_response(hv["q3"]) == \
        (evals_ints[0][pos] + evals_ints[2][pos]) % F.p


def test_transcript_detailed_report(setup):
    F, dom, evals_ints, params = setup
    _, _, _, t = _prove(F, dom, evals_ints, params)
    rep = t.detailed_report()
    assert rep["total_serialized_bytes"] == len(t.serialize())
    assert rep["iop_bytes"] > 0 and rep["bcs_overhead_bytes"] > 0
    assert set(rep["per_tree"]) == set(t.mt_proofs)
    t.print_detailed_report()  # smoke


def test_fri_optimizer_returns_feasible_vector():
    from libiop_tpu.fields.prime import edwards_fr
    from libiop_tpu.protocols.fri_optimizer import optimize_localization_parameters
    F = edwards_fr()
    vec, size = optimize_localization_parameters(
        F, security_parameter=64, tested_degree_bound=1 << 10,
        codeword_domain_dim=13, RS_extra_dimensions=3,
        absolute_proximity_parameter=(1 << 13) // 4, num_input_oracles=9)
    assert vec[0] == 1 and sum(vec) <= 13 - 3
    assert size > 0


def test_bcs_tampered_root_rejected(setup):
    F, dom, evals_ints, params = setup
    _, _, _, t = _prove(F, dom, evals_ints, params)
    key = sorted(t.mt_roots)[0]
    bad = bytearray(t.mt_roots[key])
    bad[0] ^= 1
    t.mt_roots[key] = bytes(bad)
    v = BCSVerifier(F, params, t)
    _build(v, F, dom, evals_ints)
    assert not v.transcript_is_valid()


def test_bcs_tampered_leaf_rejected(setup):
    F, dom, evals_ints, params = setup
    _, _, _, t = _prove(F, dom, evals_ints, params)
    key = sorted(t.mt_proofs)[0]
    blk = bytearray(t.mt_proofs[key].leaf_blocks[0])
    blk[0] ^= 1
    t.mt_proofs[key].leaf_blocks[0] = bytes(blk)
    v = BCSVerifier(F, params, t)
    _build(v, F, dom, evals_ints)
    assert not v.transcript_is_valid()


def test_bcs_wrong_pow_rejected(setup):
    F, dom, evals_ints, params = setup
    _, _, _, t = _prove(F, dom, evals_ints, params)
    # a wrong nonce still clears the grind with probability 2^-pow_bits, so
    # scan a few: at least one must be rejected (P[all pass] ~ 2^-48)
    original = t.pow_nonce
    rejected = False
    for delta in range(1, 13):
        t.pow_nonce = original + delta
        v = BCSVerifier(F, params, t)
        _build(v, F, dom, evals_ints)
        if not v.transcript_is_valid():
            rejected = True
            break
    assert rejected


def test_merkle_multiproof_direct(rng):
    hasher = Blake2bHashing(128)
    leaves = [bytes([i] * 10) for i in range(32)]
    mt = MerkleTree(hasher, leaves)
    for positions in [[0], [31], [3, 17, 3], list(range(32)), [5, 6]]:
        aux = mt.multi_proof(positions)
        uniq = sorted(set(positions))
        assert validate_multi_proof(hasher, mt.root, 32, positions,
                                    [leaves[p] for p in uniq], aux)
        # wrong leaf fails
        assert not validate_multi_proof(hasher, mt.root, 32, positions,
                                        [b"x" * 10 for _ in uniq], aux)


def test_merkle_zk_salts():
    hasher = Blake2bHashing(128)
    leaves = [bytes([i] * 4) for i in range(8)]
    mt = MerkleTree(hasher, leaves, make_zk=True)
    positions = [2, 5]
    aux = mt.multi_proof(positions)
    salts = mt.reveal_salts(positions)
    assert validate_multi_proof(hasher, mt.root, 8, positions,
                                [leaves[p] for p in positions], aux, salts)
    assert not validate_multi_proof(hasher, mt.root, 8, positions,
                                    [leaves[p] for p in positions], aux, None)


def test_merkle_out_of_range_position_rejected():
    """ADVICE round-1 high-severity PoC: a fake leaf at an out-of-range
    position (>= num_leaves) must be rejected, not walked above the leaf
    layer (merkle_tree.tcc:265,407 range-check semantics)."""
    hasher = Blake2bHashing(128)
    leaves = [bytes([i] * 10) for i in range(4)]
    mt = MerkleTree(hasher, leaves)
    # honest proof for position 1
    aux = mt.multi_proof([1])
    assert validate_multi_proof(hasher, mt.root, 4, [1], [leaves[1]], aux)
    # fake leaf at position 5 of the 4-leaf tree, arbitrary content + junk aux
    for positions, blocks, aux2 in [
            ([5], [b"evil" * 3], [b"\x00" * 32]),
            ([1, 5], [leaves[1], b"evil" * 3], aux + [b"\x00" * 32]),
            ([-1], [leaves[0]], aux),
    ]:
        assert not validate_multi_proof(
            hasher, mt.root, 4, positions, blocks, aux2)
    # empty position set is also invalid
    assert not validate_multi_proof(hasher, mt.root, 4, [], [], [])


def test_leaf_and_node_hashes_domain_separated():
    """A 2-digest-sized leaf must not hash like an inner node."""
    hasher = Blake2bHashing(128)
    blob = bytes(range(64))  # == two 32-byte digests concatenated
    assert hasher.leaf_hash(blob) != hasher.two_to_one(blob[:32], blob[32:])


def test_noncanonical_prover_message_rejected(setup):
    """v and v + p must not both verify (canonical transcripts)."""
    F, dom, evals_ints, params = setup
    _, _, _, transcript = _prove(F, dom, evals_ints, params)
    t = BCSTranscript.deserialize(transcript.serialize())
    mid = next(m for m, vals in t.prover_messages.items() if vals)
    t.prover_messages[mid] = [t.prover_messages[mid][0] + F.p] \
        + t.prover_messages[mid][1:]
    v = BCSVerifier(F, params, t)
    _build(v, F, dom, evals_ints)
    assert not v.transcript_is_valid()
