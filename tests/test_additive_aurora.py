"""Aurora SNARK over binary fields / affine subspaces, end-to-end through the
BCS transformation (mirrors tests/snark/test_aurora_snark.cpp:12-40, the
reference's flagship additive configuration, at CI-friendly sizes; the
reference-scale 2^10 run is marked slow).

Includes an additive golden-transcript pin (byte-level format freeze for the
binary-field serialization path)."""
import hashlib
import os

import numpy as np
import pytest

from libiop_tpu.fields.binary import gf64, gf192
from libiop_tpu.relations.examples import generate_r1cs_example
from libiop_tpu.snark.aurora import (AuroraSnarkParams, aurora_snark_prover,
                                     aurora_snark_verifier)
from libiop_tpu.bcs.common import BCSTranscript

SLOW = os.environ.get("RUN_SLOW_TESTS") != "1"


def _params(make_zk=False, pow_bits=0):
    return AuroraSnarkParams(
        security_parameter=32, RS_extra_dimensions=2,
        fri_localization_parameter=1, make_zk=make_zk, pow_bits=pow_bits,
        override_fri_queries=3, override_fri_interactive_repetitions=1,
        override_ldt_instances=1)


def _roundtrip(F, n_constraints, params, seed):
    cs, primary, aux = generate_r1cs_example(
        F, n_constraints, 3, n_constraints - 1, np.random.default_rng(seed))
    assert cs.is_satisfied(primary, aux)
    proof = aurora_snark_prover(cs, primary, aux, params,
                                rng=np.random.default_rng(seed + 1))
    blob = proof.serialize()
    assert aurora_snark_verifier(
        cs, primary, BCSTranscript.deserialize(blob), params)
    return cs, primary, blob


def test_additive_aurora_gf64_roundtrip():
    F = gf64()
    cs, primary, blob = _roundtrip(F, 32, _params(pow_bits=2), seed=11)
    # tamper rejection
    bad = bytearray(blob)
    bad[len(bad) // 3] ^= 1
    try:
        ok = aurora_snark_verifier(
            cs, primary, BCSTranscript.deserialize(bytes(bad)), _params(pow_bits=2))
    except Exception:
        ok = False
    assert not ok
    # wrong-input rejection
    wrong = list(primary)
    wrong[0] ^= 1
    try:
        ok = aurora_snark_verifier(
            cs, wrong, BCSTranscript.deserialize(blob), _params(pow_bits=2))
    except Exception:
        ok = False
    assert not ok


def test_additive_aurora_gf64_zk():
    _roundtrip(gf64(), 16, _params(make_zk=True), seed=21)


def test_additive_aurora_gf192():
    """BASELINE config 3's field (Aurora over GF(2^192))."""
    _roundtrip(gf192(), 16, _params(), seed=22)


# sha256 of the canonical serialized transcript for the deterministic
# configuration below (regenerate consciously on format changes by running
# this file's __main__)
ADDITIVE_GOLDEN_SHA256 = \
    "8a7c80d5983fb537d0c3ea970110ffe7cbdbaf7020e54ea5f4ad3701273981e9"


def _deterministic_additive_proof():
    F = gf64()
    cs, primary, aux = generate_r1cs_example(
        F, 16, 3, 15, np.random.default_rng(777))
    proof = aurora_snark_prover(cs, primary, aux, _params(),
                                rng=np.random.default_rng(0))
    return proof.serialize()


def test_additive_transcript_bytes_are_stable():
    digest = hashlib.sha256(_deterministic_additive_proof()).hexdigest()
    assert digest == ADDITIVE_GOLDEN_SHA256, (
        f"additive transcript format changed: sha256 now {digest}. If "
        "intentional, update ADDITIVE_GOLDEN_SHA256 (pins the binary-field "
        "serialization, contiguous-coset leaf layout and hashchain order).")


@pytest.mark.skipif(SLOW, reason="set RUN_SLOW_TESTS=1 (reference-scale run)")
def test_additive_aurora_gf64_2e10():
    """Reference-scale additive Aurora (test_aurora_snark.cpp runs 2^13;
    2^10 keeps CPU-mesh CI wall-clock sane)."""
    _roundtrip(gf64(), 1 << 10, _params(pow_bits=2), seed=31)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    print(hashlib.sha256(_deterministic_additive_proof()).hexdigest())


def test_additive_ligero_gf64():
    """Ligero over affine subspaces, end-to-end through BCS + direct LDT."""
    from libiop_tpu.snark.ligero import (LigeroSnarkParams,
                                         ligero_snark_prover,
                                         ligero_snark_verifier)
    F = gf64()
    cs, primary, aux = generate_r1cs_example(
        F, 16, 3, 15, np.random.default_rng(41))
    lp = LigeroSnarkParams(security_parameter=32, RS_extra_dimensions=2,
                           height_width_ratio=1.0)
    proof = ligero_snark_prover(cs, primary, aux, lp,
                                rng=np.random.default_rng(42))
    blob = proof.serialize()
    assert ligero_snark_verifier(
        cs, primary, BCSTranscript.deserialize(blob), lp)
    wrong = list(primary)
    wrong[0] ^= 1
    try:
        ok = ligero_snark_verifier(
            cs, wrong, BCSTranscript.deserialize(blob), lp)
    except Exception:
        ok = False
    assert not ok


def test_additive_fractal_gf64():
    """Three-phase Fractal (index/prove/verify) over affine subspaces."""
    from libiop_tpu.snark.fractal import (FractalSnarkParams,
                                          fractal_snark_indexer,
                                          fractal_snark_prover,
                                          fractal_snark_verifier)
    F = gf64()
    cs, primary, aux = generate_r1cs_example(
        F, 16, 3, 15, np.random.default_rng(51))
    fp = FractalSnarkParams(security_parameter=32, RS_extra_dimensions=2,
                            fri_localization_parameter=1,
                            override_fri_queries=3,
                            override_fri_interactive_repetitions=1,
                            override_ldt_instances=1)
    pidx, vidx = fractal_snark_indexer(cs, fp)
    proof = fractal_snark_prover(cs, primary, aux, pidx, fp,
                                 rng=np.random.default_rng(52))
    assert fractal_snark_verifier(
        cs, primary, vidx, BCSTranscript.deserialize(proof.serialize()), fp)


@pytest.mark.skipif(SLOW, reason="set RUN_SLOW_TESTS=1 (reference-scale run)")
def test_aurora_edwards_2e12():
    """Reference-scale multiplicative Aurora (2^12 constraints, CI-gated)."""
    from libiop_tpu.fields.prime import edwards_fr
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(
        F, 1 << 12, 3, (1 << 12) - 1, np.random.default_rng(61))
    params = AuroraSnarkParams(
        security_parameter=64, RS_extra_dimensions=2,
        fri_localization_parameter=2, pow_bits=8)
    proof = aurora_snark_prover(cs, primary, aux, params)
    blob = proof.serialize()
    assert aurora_snark_verifier(
        cs, primary, BCSTranscript.deserialize(blob), params)
