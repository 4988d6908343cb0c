"""Fractal SNARK: three-phase API (indexer -> prover -> verifier).

Counterpart of libiop/snark/fractal_snark.{hpp,tcc}: the indexer runs the
holographic round 0 once, producing a persistent prover index (the index
oracles) and verifier index (the index Merkle roots); the verifier injects
those roots into the transcript before replay (bcs_verifier.tcc:13-31), so a
cheating prover cannot substitute its own matrices.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..fields.prime import PrimeField
from ..bcs.common import BCSParameters, BCSTranscript
from ..bcs.prover import BCSProver
from ..bcs.verifier import BCSVerifier, BCSVerificationError
from ..protocols.fractal import FractalIOP, FractalIOPParams
from ..protocols.fri import FRISoundnessType
from ..protocols.ldt_reducer import LDTReducerSoundnessType
from ..relations.r1cs import R1CS


@dataclasses.dataclass
class FractalSnarkParams:
    security_parameter: int = 128
    RS_extra_dimensions: int = 3
    fri_localization_parameter: int = 2
    make_zk: bool = False
    hash_name: str = "blake2b"
    pow_bits: int = 0
    fri_soundness_type: str = FRISoundnessType.heuristic
    ldt_reducer_soundness_type: str = LDTReducerSoundnessType.optimistic_heuristic
    override_fri_queries: Optional[int] = None
    override_fri_interactive_repetitions: Optional[int] = None
    override_ldt_instances: Optional[int] = None
    override_lincheck_repetitions: Optional[int] = None

    def iop_params(self, F: PrimeField, r1cs: R1CS) -> FractalIOPParams:
        p = FractalIOPParams(
            F, self.security_parameter, self.pow_bits, self.RS_extra_dimensions,
            self.make_zk, r1cs, self.fri_localization_parameter,
            self.fri_soundness_type, self.ldt_reducer_soundness_type)
        if self.override_fri_queries is not None:
            p.fri_params.num_query_repetitions = self.override_fri_queries
        if self.override_fri_interactive_repetitions is not None:
            p.fri_params.num_interactive_repetitions = \
                self.override_fri_interactive_repetitions
        if self.override_ldt_instances is not None:
            p.ldt_reducer_params.num_output_LDT_instances = self.override_ldt_instances
        if self.override_lincheck_repetitions is not None:
            p.encoded_params.holographic_lincheck_params.num_repetitions = \
                self.override_lincheck_repetitions
        return p

    def bcs_params(self) -> BCSParameters:
        return BCSParameters(security_bits=self.security_parameter,
                             hash_name=self.hash_name, pow_bits=self.pow_bits)


def _setup(r1cs: R1CS, params: FractalSnarkParams, engine,
           rng: Optional[np.random.Generator] = None) -> FractalIOP:
    iop_params = params.iop_params(r1cs.F, r1cs)
    fr = FractalIOP(engine, r1cs, iop_params, rng=rng)
    fr.register_interactions()
    engine.seal_interaction_registrations()
    fr.register_queries()
    engine.seal_query_registrations()
    return fr


def fractal_snark_indexer(r1cs: R1CS, params: FractalSnarkParams,
                          rng: Optional[np.random.Generator] = None):
    """Returns (prover_index, verifier_index)."""
    iop = BCSProver(r1cs.F, params.bcs_params())
    fr = _setup(r1cs, params, iop, rng)
    fr.produce_index()
    prover_index = fr.get_index_artifact()
    verifier_index = {k: v for k, v in iop.mt_roots.items() if k[0] == 0}
    return prover_index, verifier_index


def fractal_snark_prover(r1cs: R1CS, primary: List[int], auxiliary: List[int],
                         prover_index, params: FractalSnarkParams,
                         rng: Optional[np.random.Generator] = None) -> BCSTranscript:
    iop = BCSProver(r1cs.F, params.bcs_params())
    fr = _setup(r1cs, params, iop, rng)
    fr.submit_index(prover_index)
    fr.produce_proof(primary, auxiliary)
    return iop.get_transcript()


def fractal_snark_verifier(r1cs: R1CS, primary: List[int],
                           verifier_index: Dict[Tuple[int, int], bytes],
                           transcript: BCSTranscript,
                           params: FractalSnarkParams) -> bool:
    # the verifier trusts only ITS index roots for round 0
    for k, root in verifier_index.items():
        transcript.mt_roots[k] = root
    iop = BCSVerifier(r1cs.F, params.bcs_params(), transcript)
    fr = _setup(r1cs, params, iop)
    if not iop.transcript_is_valid():
        return False
    iop.finalize_query_positions()
    try:
        return fr.verifier_predicate(primary)
    except BCSVerificationError:
        return False
