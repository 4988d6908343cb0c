"""Ligero SNARK: the BCS-compiled non-interactive argument.

Counterpart of libiop/snark/ligero_snark.{hpp,tcc}: parameter struct
(security, RS rate, height/width ratio, zk — ligero_snark.hpp:25-55) and the
prover/verifier free functions.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..bcs.common import BCSParameters, BCSTranscript
from ..bcs.prover import BCSProver
from ..bcs.verifier import BCSVerifier, BCSVerificationError
from ..protocols.ligero import LigeroIOP, LigeroIOPParams
from ..protocols.ldt_reducer import LDTReducerSoundnessType
from ..relations.r1cs import R1CS


@dataclasses.dataclass
class LigeroSnarkParams:
    security_parameter: int = 128
    RS_extra_dimensions: int = 3
    height_width_ratio: float = 1.0
    make_zk: bool = False
    hash_name: str = "blake2b"
    pow_bits: int = 0
    ldt_reducer_soundness_type: str = LDTReducerSoundnessType.optimistic_heuristic
    # test-only overrides
    override_num_interactions: Optional[int] = None
    override_num_queries: Optional[int] = None
    override_ldt_instances: Optional[int] = None

    def iop_params(self, F, r1cs: R1CS) -> LigeroIOPParams:
        p = LigeroIOPParams(
            F, self.security_parameter, self.RS_extra_dimensions,
            self.height_width_ratio, self.make_zk, r1cs.num_constraints,
            r1cs.num_variables, self.ldt_reducer_soundness_type)
        if self.override_num_interactions is not None:
            p.encoded_params.num_interactions = self.override_num_interactions
        if self.override_num_queries is not None:
            p.encoded_params.num_queries = self.override_num_queries
            p.direct_ldt_params.num_queries = self.override_num_queries
        if self.override_ldt_instances is not None:
            p.ldt_reducer_params.num_output_LDT_instances = self.override_ldt_instances
        return p

    def bcs_params(self) -> BCSParameters:
        return BCSParameters(security_bits=self.security_parameter,
                             hash_name=self.hash_name, pow_bits=self.pow_bits)


def ligero_snark_prover(r1cs: R1CS, primary: List[int], auxiliary: List[int],
                        params: LigeroSnarkParams,
                        rng: Optional[np.random.Generator] = None) -> BCSTranscript:
    F = r1cs.F
    iop = BCSProver(F, params.bcs_params())
    lig = LigeroIOP(iop, r1cs, params.iop_params(F, r1cs), rng=rng)
    lig.register_interactions()
    iop.seal_interaction_registrations()
    lig.register_queries()
    iop.seal_query_registrations()
    lig.produce_proof(primary, auxiliary)
    return iop.get_transcript()


def ligero_snark_verifier(r1cs: R1CS, primary: List[int],
                          transcript: BCSTranscript,
                          params: LigeroSnarkParams) -> bool:
    F = r1cs.F
    iop = BCSVerifier(F, params.bcs_params(), transcript)
    lig = LigeroIOP(iop, r1cs, params.iop_params(F, r1cs))
    lig.register_interactions()
    iop.seal_interaction_registrations()
    lig.register_queries()
    iop.seal_query_registrations()
    if not iop.transcript_is_valid():
        return False
    iop.finalize_query_positions()
    try:
        return lig.verifier_predicate(primary)
    except BCSVerificationError:
        return False
