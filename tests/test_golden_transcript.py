"""Golden-vector pin of the byte-level proof format.

The C++ reference cannot be built in this environment (submodules absent), so
bit-exactness is pinned against THIS framework's own frozen vectors instead:
a fully deterministic (non-zk, pow-free) Aurora proof must serialize to the
same bytes forever.  If a change legitimately alters the format (hashchain
spec, leaf layout, transcript encoding), update the digest here consciously.
"""
import hashlib
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.relations.examples import generate_r1cs_example
from libiop_tpu.snark.aurora import AuroraSnarkParams, aurora_snark_prover

# sha256 of the canonical serialized transcript for the fixed configuration
# below (filled in by running this file's __main__)
GOLDEN_SHA256 = "ca51f9c12bb0f3383b696ad92bd3b7af9a13acd29463a760d5dd61d7d7db17ce"


def _deterministic_proof():
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(
        F, 16, 3, 15, np.random.default_rng(424242))
    params = AuroraSnarkParams(
        security_parameter=32, RS_extra_dimensions=2,
        fri_localization_parameter=1, make_zk=False, pow_bits=0,
        override_fri_queries=3, override_fri_interactive_repetitions=1,
        override_ldt_instances=1)
    proof = aurora_snark_prover(cs, primary, aux, params,
                                rng=np.random.default_rng(0))
    return proof.serialize()


def test_transcript_bytes_are_stable():
    blob = _deterministic_proof()
    digest = hashlib.sha256(blob).hexdigest()
    assert digest == GOLDEN_SHA256, (
        f"transcript format changed: sha256 now {digest}. If intentional, "
        "update GOLDEN_SHA256 (this pins hashchain order, leaf layouts and "
        "the serialization spec).")


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    print(hashlib.sha256(_deterministic_proof()).hexdigest())
