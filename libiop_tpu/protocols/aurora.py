"""Aurora IOP: encoded Aurora protocol + LDT instance reducer hosting FRI.

Counterpart of libiop/protocols/aurora_iop.{hpp,tcc}:
* domain construction (aurora_iop.tcc:278-291): constraint/variable domains
  are canonical subgroups; the codeword domain is a coset shifted by an
  element outside the subgroup (the field's multiplicative generator) so it
  is disjoint from the systematic domains;
* parameter object (aurora_iop.tcc:17-44, 64-78): domain dims from
  |constraints| and |variables|+1 (powers of two), security budget split
  (query soundness gets +1 - pow bits; each interactive component +3), and
  the zk query-bound fixed-point iteration (aurora_iop.tcc:115-185);
* round_parameters on the first two rounds use FRI's first localization coset
  so witness/lincheck oracles get coset-serialized leaves.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset
from ..algebra.generic import element_outside_of_subset, make_domain
from ..iop.runtime import IOPProtocol, RoundParameters
from ..relations.r1cs import R1CS
from .fri import FRIParameters, FRIProtocol, FRISoundnessType
from .ldt_reducer import (LDTInstanceReducer, LDTReducerParams,
                          LDTReducerSoundnessType)
from .r1cs_rs_iop import EncodedAurora, EncodedAuroraParams


class AuroraIOPParams:
    def __init__(self, F, security_parameter: int,
                 RS_extra_dimensions: int, make_zk: bool,
                 num_constraints: int, num_variables: int,
                 fri_localization_parameter: int = 2,
                 fri_soundness_type: str = FRISoundnessType.heuristic,
                 ldt_reducer_soundness_type: str = LDTReducerSoundnessType.optimistic_heuristic,
                 pow_bits: int = 0,
                 fri_localization_vector=None):
        assert num_constraints & (num_constraints - 1) == 0, \
            "num_constraints must be a power of two (pad the constraint system)"
        assert (num_variables + 1) & num_variables == 0, \
            "num_variables must be one less than a power of two"
        self.F = F
        self.security_parameter = security_parameter
        self.RS_extra_dimensions = RS_extra_dimensions
        self.make_zk = make_zk
        self.pow_bits = pow_bits
        self.constraint_domain_dim = num_constraints.bit_length() - 1
        self.variable_domain_dim = (num_variables + 1).bit_length() - 1
        self.summation_domain_dim = max(self.constraint_domain_dim,
                                        self.variable_domain_dim)
        extra_systematic_dims = 2 if make_zk else 0
        self.codeword_domain_dim = (self.summation_domain_dim
                                    + extra_systematic_dims + RS_extra_dimensions)
        self._fri_localization_vector = fri_localization_vector
        self._set_ldt_parameters(fri_localization_parameter, fri_soundness_type,
                                 ldt_reducer_soundness_type)

    def _set_ldt_parameters(self, localization_parameter, fri_soundness_type,
                            ldt_reducer_soundness_type):
        F = self.F
        query_bits = self.security_parameter + 1 - self.pow_bits
        interactive_bits = self.security_parameter + 3
        loc_array = (list(self._fri_localization_vector)
                     if self._fri_localization_vector is not None else
                     FRIParameters.localization_parameter_to_array(
                         localization_parameter, self.codeword_domain_dim,
                         self.RS_extra_dimensions))
        if not self.make_zk:
            self.query_bound = 0
            self.encoded_params = EncodedAuroraParams(
                F, interactive_bits, self.codeword_domain_dim,
                self.constraint_domain_dim, self.summation_domain_dim,
                0, False)
            tested = self.encoded_params.max_tested_degree_bound()
            tested = FRIParameters.next_testable_degree_bound(tested, loc_array)
            constraint = self.encoded_params.max_constraint_degree_bound()
            self.ldt_reducer_params = LDTReducerParams(
                F, interactive_bits, ldt_reducer_soundness_type,
                self.codeword_domain_dim, tested, constraint, False)
            self.fri_params = FRIParameters(
                F, interactive_bits, query_bits, fri_soundness_type,
                tested, self.codeword_domain_dim, self.RS_extra_dimensions,
                self.ldt_reducer_params.absolute_proximity_parameter, loc_array)
        else:
            # zk query-bound fixed point (aurora_iop.tcc:115-185)
            estimated = 0
            last = -1
            while estimated != last:
                query_bound = estimated + 1
                self.encoded_params = EncodedAuroraParams(
                    F, interactive_bits, self.codeword_domain_dim,
                    self.constraint_domain_dim, self.summation_domain_dim,
                    query_bound, True)
                tested = FRIParameters.next_testable_degree_bound(
                    self.encoded_params.max_tested_degree_bound(), loc_array)
                constraint = self.encoded_params.max_constraint_degree_bound()
                if tested > 1 << (self.codeword_domain_dim - self.RS_extra_dimensions):
                    self.codeword_domain_dim += 1
                    self._set_ldt_parameters(localization_parameter,
                                             fri_soundness_type,
                                             ldt_reducer_soundness_type)
                    return
                self.ldt_reducer_params = LDTReducerParams(
                    F, interactive_bits, ldt_reducer_soundness_type,
                    self.codeword_domain_dim, tested, constraint, True)
                self.fri_params = FRIParameters(
                    F, interactive_bits, query_bits, fri_soundness_type,
                    tested, self.codeword_domain_dim, self.RS_extra_dimensions,
                    self.ldt_reducer_params.absolute_proximity_parameter,
                    loc_array)
                last = estimated
                estimated = (self.fri_params.num_query_repetitions
                             << loc_array[0])
            self.query_bound = estimated + 1


class AuroraIOP:
    def __init__(self, iop: IOPProtocol, r1cs: R1CS, params: AuroraIOPParams,
                 rng: Optional[np.random.Generator] = None):
        self.iop = iop
        self.F = iop.F
        self.params = params
        F = self.F
        # systematic domains are canonical subgroups/subspaces; the codeword
        # domain is shifted by an element outside the same-size canonical
        # domain so it is disjoint (aurora_iop.tcc:278-291 for both families)
        constraint_domain = make_domain(F, params.constraint_domain_dim)
        variable_domain = make_domain(F, params.variable_domain_dim)
        codeword_domain = make_domain(
            F, params.codeword_domain_dim,
            shift=element_outside_of_subset(F, params.codeword_domain_dim))
        ch = iop.register_domain(constraint_domain)
        vh = iop.register_domain(variable_domain)
        self.codeword_handle = iop.register_domain(codeword_domain)
        self.protocol = EncodedAurora(iop, ch, vh, self.codeword_handle,
                                      r1cs, params.encoded_params, rng=rng)
        self.ldt_reducer = LDTInstanceReducer(
            iop, self.codeword_handle, params.ldt_reducer_params, rng=rng)
        first_coset = 1 << params.fri_params.localization_parameters[0]
        iop.set_round_parameters(RoundParameters(first_coset), round=0)

    def register_interactions(self):
        self.protocol.register_challenge()
        self.protocol.register_proof()
        first_coset = 1 << self.params.fri_params.localization_parameters[0]
        self.iop.set_round_parameters(RoundParameters(first_coset), round=1)
        handles = self.protocol.get_all_oracle_handles()
        self.ldt_reducer.set_ldt(lambda iop, cwh, combined: FRIProtocol(
            iop, self.params.fri_params, cwh, combined))
        self.ldt_reducer.register_interactions(handles)

    def register_queries(self):
        self.ldt_reducer.register_queries()

    def produce_proof(self, primary: List[int], auxiliary: List[int]):
        from ..utils.profiling import PROFILER
        with PROFILER.block("witness_encode"):
            self.protocol.submit_witness_oracles(primary, auxiliary)
            self.ldt_reducer.submit_masking_polynomial()
        with PROFILER.block("round1_commit"):
            self.iop.signal_prover_round_done()
        with PROFILER.block("sumcheck_lincheck"):
            self.protocol.calculate_and_submit_proof()
        with PROFILER.block("round2_commit"):
            self.iop.signal_prover_round_done()
        with PROFILER.block("fri_ldt"):
            self.ldt_reducer.calculate_and_submit_proof()

    def verifier_predicate(self, primary: List[int]) -> bool:
        self.protocol.construct_verifier_state(primary)
        return self.ldt_reducer.verifier_predicate()
