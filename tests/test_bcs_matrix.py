"""BCS transformation configuration matrix — mirror of the reference's
tests/bcs/test_bcs_transformation.cpp:201-457 grid: {multiplicative,
additive} x {1,2 rounds} x {1,N oracles} x {zk} x {coset serialization} x
{holographic} x {blake2b, poseidon hashchain}, each run prover -> transcript
-> verifier with query-response agreement and tamper rejection."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr, alt_bn128_fr
from libiop_tpu.fields.binary import gf64
from libiop_tpu.algebra.domains import MultiplicativeCoset
from libiop_tpu.algebra.subspace import AffineSubspace
from libiop_tpu.iop.runtime import RoundParameters, VirtualOracle
from libiop_tpu.bcs.common import BCSParameters, BCSTranscript
from libiop_tpu.bcs.prover import BCSProver
from libiop_tpu.bcs.verifier import BCSVerifier, BCSVerificationError


class _Sum(VirtualOracle):
    def __init__(self, F):
        self.F = F

    def evaluated_contents(self, evals):
        acc = evals[0]
        for e in evals[1:]:
            acc = self.F.add(acc, e)
        return acc

    def evaluation_at_point(self, position, point_int, vals):
        acc = 0
        for v in vals:
            acc = self.F.add_ints(acc, v)
        return acc


def _make_domain(kind, dim):
    if kind == "mult":
        return edwards_fr(), MultiplicativeCoset(edwards_fr(), dim=dim)
    if kind == "altbn":
        return alt_bn128_fr(), MultiplicativeCoset(alt_bn128_fr(), dim=dim)
    return gf64(), AffineSubspace(gf64(), dim=dim)


def _run_config(kind, num_rounds, oracles_per_round, make_zk, quotient,
                hash_name, holographic, rng, tamper=False):
    F, dom = _make_domain(kind, 4)
    n = dom.order
    params = BCSParameters(security_bits=64, pow_bits=2, hash_name=hash_name)

    def build(engine):
        dh = engine.register_domain(dom)
        handles = {"dh": dh, "rounds": []}
        if holographic:
            handles["index"] = [engine.register_index_oracle(dh, n // 2)
                                for _ in range(2)]
        for r in range(num_rounds):
            oh = [engine.register_oracle(dh, n // 2, make_zk=make_zk)
                  for _ in range(oracles_per_round)]
            mh = engine.register_prover_message(1)
            vh = engine.register_verifier_random_message(2)
            if quotient > 1:
                engine.set_round_parameters(
                    RoundParameters(quotient_map_size=quotient))
            handles["rounds"].append((oh, mh, vh))
        all_oracles = [o for oh, _, _ in handles["rounds"] for o in oh]
        if holographic:
            all_oracles = handles["index"] + all_oracles
        vo = engine.register_virtual_oracle(dh, n, all_oracles, _Sum(F))
        handles["vo"] = vo
        engine.seal_interaction_registrations()
        qp = engine.register_random_query_position(dh)
        handles["qp"] = qp
        handles["queries"] = [engine.register_query(o, qp)
                              for o in all_oracles + [vo]]
        engine.seal_query_registrations()
        return handles

    # deterministic oracle contents
    count = (2 if holographic else 0) + num_rounds * oracles_per_round
    contents = [[int(rng.integers(0, 1 << 48)) % F.field_size
                 for _ in range(n)] for _ in range(count)]

    prover = BCSProver(F, params)
    h = build(prover)
    ci = 0
    if holographic:
        for oh in h["index"]:
            prover.submit_oracle(oh, F.from_ints(contents[ci]))
            ci += 1
        prover.signal_prover_round_done()
    for (oh, mh, vh) in h["rounds"]:
        for o in oh:
            prover.submit_oracle(o, F.from_ints(contents[ci]))
            ci += 1
        prover.submit_prover_message(mh, [ci])
        prover.signal_prover_round_done()
        prover.obtain_verifier_random_message(vh)
    t = prover.get_transcript()
    prover_responses = [prover.obtain_query_response(q) for q in h["queries"]]

    blob = t.serialize()
    if tamper:
        bad = bytearray(blob)
        bad[len(bad) // 2] ^= 1
        blob = bytes(bad)
    try:
        t2 = BCSTranscript.deserialize(blob)
    except Exception:
        assert tamper, "round-trip deserialization must succeed"
        return
    if holographic:
        # verifier trusts its own copy of the round-0 index roots
        # (fractal_snark_verifier semantics, bcs_verifier.tcc:13-31)
        for k, root in t.mt_roots.items():
            if k[0] == 0:
                t2.mt_roots[k] = root

    verifier = BCSVerifier(F, params, t2)
    build(verifier)
    if tamper:
        # a flipped byte must break the hashchain replay, a multiproof, or
        # at minimum change some queried value
        if not verifier.transcript_is_valid():
            return
        verifier.finalize_query_positions()
        try:
            resp = [verifier.obtain_query_response(q) for q in h["queries"]]
        except (BCSVerificationError, AssertionError, KeyError):
            return
        assert resp != prover_responses
        return
    assert verifier.transcript_is_valid()
    verifier.finalize_query_positions()
    verifier_responses = [verifier.obtain_query_response(q)
                          for q in h["queries"]]
    assert verifier_responses == prover_responses
    # sum virtual oracle consistency
    total = 0
    for v in verifier_responses[:-1]:
        total = F.add_ints(total, v)
    assert total == verifier_responses[-1]


@pytest.mark.parametrize("kind", ["mult", "additive"])
@pytest.mark.parametrize("oracles,rounds", [(1, 1), (3, 1), (3, 2)])
def test_bcs_basic_matrix(kind, oracles, rounds, rng):
    _run_config(kind, rounds, oracles, make_zk=False, quotient=1,
                hash_name="blake2b", holographic=False, rng=rng)


@pytest.mark.parametrize("kind", ["mult", "additive"])
@pytest.mark.parametrize("quotient", [1, 4])
def test_bcs_zk_matrix(kind, quotient, rng):
    _run_config(kind, 2, 2, make_zk=True, quotient=quotient,
                hash_name="blake2b", holographic=False, rng=rng)


@pytest.mark.parametrize("kind", ["mult", "additive"])
@pytest.mark.parametrize("quotient", [1, 4])
def test_bcs_coset_serialization_matrix(kind, quotient, rng):
    _run_config(kind, 1, 3, make_zk=False, quotient=quotient,
                hash_name="blake2b", holographic=False, rng=rng)


@pytest.mark.parametrize("kind", ["mult", "additive"])
def test_bcs_holographic_matrix(kind, rng):
    _run_config(kind, 2, 2, make_zk=False, quotient=4,
                hash_name="blake2b", holographic=True, rng=rng)


def test_bcs_algebraic_hashchain(rng):
    """high-alpha Poseidon hashchain + MT (the reference's algebraic-hash
    arm, test_bcs_transformation.cpp:66)."""
    _run_config("altbn", 2, 2, make_zk=False, quotient=1,
                hash_name="poseidon_high_alpha", holographic=False, rng=rng)


@pytest.mark.parametrize("kind,hash_name",
                         [("mult", "blake2b"), ("additive", "blake2b"),
                          ("altbn", "poseidon_high_alpha")])
def test_bcs_tamper_matrix(kind, hash_name, rng):
    _run_config(kind, 2, 2, make_zk=True, quotient=1, hash_name=hash_name,
                holographic=False, rng=rng, tamper=True)
