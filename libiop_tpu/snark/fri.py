"""FRI-only benchmark SNARK over random low-degree oracles.

Counterpart of libiop/snark/fri_snark.{hpp,tcc} + the dummy protocol
(protocols/encoded/dummy_protocol.hpp:20-60): commits ``num_oracles`` random
RS codewords and runs multi-FRI on them through the BCS transform — the
FRI-isolation benchmark.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..algebra.generic import element_outside_of_subset, make_domain
from ..algebra.fft import fft
from ..bcs.common import BCSParameters, BCSTranscript
from ..bcs.prover import BCSProver
from ..bcs.verifier import BCSVerifier, BCSVerificationError
from ..iop.runtime import RoundParameters
from ..protocols.fri import FRIParameters, FRIProtocol, FRISoundnessType
from ..fields.prime import PrimeField


@dataclasses.dataclass
class FRISnarkParams:
    security_parameter: int = 128
    codeword_domain_dim: int = 12
    RS_extra_dimensions: int = 2
    localization_parameter: int = 2
    #: explicit per-round localization vector; overrides
    #: localization_parameter when set (instrument_fri_snark.cpp:90-96
    #: num_localization_steps role)
    localization_vector: Optional[List[int]] = None
    num_oracles: int = 1
    hash_name: str = "blake2b"
    pow_bits: int = 0
    override_fri_queries: Optional[int] = None
    override_fri_interactive_repetitions: Optional[int] = None

    def fri_params(self, F: PrimeField) -> FRIParameters:
        degree = 1 << (self.codeword_domain_dim - self.RS_extra_dimensions)
        if self.localization_vector is not None:
            loc = list(self.localization_vector)
        else:
            loc = FRIParameters.localization_parameter_to_array(
                self.localization_parameter, self.codeword_domain_dim,
                self.RS_extra_dimensions)
        degree = FRIParameters.next_testable_degree_bound(degree, loc)
        p = FRIParameters(
            F, self.security_parameter + 3,
            self.security_parameter + 1 - self.pow_bits,
            FRISoundnessType.heuristic, degree, self.codeword_domain_dim,
            self.RS_extra_dimensions,
            (1 << self.codeword_domain_dim) // 4, loc)
        if self.override_fri_queries is not None:
            p.num_query_repetitions = self.override_fri_queries
        if self.override_fri_interactive_repetitions is not None:
            p.num_interactive_repetitions = self.override_fri_interactive_repetitions
        return p


def _build(engine, F, params: FRISnarkParams):
    fri_params = params.fri_params(F)
    domain = make_domain(F, params.codeword_domain_dim,
                         shift=element_outside_of_subset(
                             F, params.codeword_domain_dim))
    cw = engine.register_domain(domain)
    degree = fri_params.poly_degree_bound
    handles = [engine.register_oracle(cw, degree)
               for _ in range(params.num_oracles)]
    engine.set_round_parameters(RoundParameters(
        1 << fri_params.localization_parameters[0]), round=0)
    fri = FRIProtocol(engine, fri_params, cw, handles)
    fri.register_interactions()
    engine.seal_interaction_registrations()
    fri.register_queries()
    engine.seal_query_registrations()
    return fri, domain, handles, degree


def fri_snark_prover(F: PrimeField, params: FRISnarkParams,
                     rng: Optional[np.random.Generator] = None) -> BCSTranscript:
    rng = rng or np.random.default_rng()
    iop = BCSProver(F, BCSParameters(params.security_parameter,
                                     params.hash_name, params.pow_bits))
    fri, domain, handles, degree = _build(iop, F, params)
    for h in handles:
        iop.submit_oracle(h, fft(F.random((degree,), rng), domain))
    iop.signal_prover_round_done()
    fri.calculate_and_submit_proof()
    return iop.get_transcript()


def fri_snark_verifier(F: PrimeField, transcript: BCSTranscript,
                       params: FRISnarkParams) -> bool:
    iop = BCSVerifier(F, BCSParameters(params.security_parameter,
                                       params.hash_name, params.pow_bits),
                      transcript)
    fri, _, _, _ = _build(iop, F, params)
    if not iop.transcript_is_valid():
        return False
    iop.finalize_query_positions()
    try:
        return fri.verifier_predicate()
    except BCSVerificationError:
        return False
