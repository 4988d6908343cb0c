"""Direct low-degree test (Ligero's LDT).

Counterpart of libiop/protocols/ldt/direct_ldt/direct_ldt.{hpp,tcc}: after
committing, the prover simply sends each tested polynomial's coefficients as
a prover message; the verifier spot-checks q random positions of the codeword
against an evaluation of those coefficients (direct_ldt.hpp:1-9,56-86);
queries = ceil(sec / -log(rho + delta)) (direct_ldt.tcc:13-26).
"""
from __future__ import annotations

import math
from typing import List

from ..algebra.generic import ifft_known_any
from ..iop.runtime import IOPProtocol, OracleHandle


class DirectLDTParams:
    def __init__(self, query_soundness_bits: int, poly_degree_bound: int,
                 RS_extra_dimensions: int, absolute_proximity_parameter: int):
        self.poly_degree_bound = poly_degree_bound
        self.codeword_domain_dim = (poly_degree_bound.bit_length() - 1
                                    + RS_extra_dimensions)
        N = 1 << self.codeword_domain_dim
        frac = absolute_proximity_parameter / N
        denom = math.log2(1 - frac)
        self.num_queries = max(1, int(math.ceil(-query_soundness_bits / denom)))


class DirectLDT:
    """multi-LDT duck-type peer of FRIProtocol (multi_ldt_base.hpp role)."""

    def __init__(self, iop: IOPProtocol, params: DirectLDTParams,
                 codeword_handle, poly_handles: List[OracleHandle]):
        self.iop = iop
        self.F = iop.F
        self.params = params
        self.codeword_handle = codeword_handle
        self.poly_handles = list(poly_handles)
        self.L = iop.get_domain(codeword_handle)

    def register_interactions(self):
        # empty verifier message forces the coefficients into the round after
        # the commitment (direct_ldt.tcc:91-101)
        self.iop.register_verifier_random_message(0)
        self.coeff_handles = [
            self.iop.register_prover_message(self.params.poly_degree_bound)
            for _ in self.poly_handles]

    def register_queries(self):
        self.position_handles = [
            self.iop.register_random_query_position(self.codeword_handle)
            for _ in range(self.params.num_queries)]
        self.query_handles = [
            [self.iop.register_query(ph, pos) for ph in self.poly_handles]
            for pos in self.position_handles]

    def calculate_and_submit_proof(self):
        F = self.F
        for ph, ch in zip(self.poly_handles, self.coeff_handles):
            evals = self.iop.get_oracle_evaluations(ph)
            coeffs = ifft_known_any(evals, self.L,
                                    self.params.poly_degree_bound)
            ints = [int(v) for v in
                    F.to_ints(coeffs[:, :self.params.poly_degree_bound])]
            self.iop.submit_prover_message(ch, ints)
        self.iop.signal_prover_round_done()

    def verifier_predicate(self) -> bool:
        # all positions x all tested polys in ONE device Horner dispatch per
        # poly (host-int Horner cost |coeffs| modmuls per (query, poly):
        # ~degree_bound x num_queries x instances host muls dominated the
        # Ligero verifier)
        from .ligero import _responses_at_positions
        F = self.F
        positions = [self.iop.obtain_query_position(ph)
                     for ph in self.position_handles]
        for i, ch in enumerate(self.coeff_handles):
            coeffs = self.iop.receive_prover_message(ch)
            vals = _responses_at_positions(
                F, F.from_ints(coeffs), self.L, positions)
            for k in range(len(positions)):
                if vals[k] != self.iop.obtain_query_response(
                        self.query_handles[k][i]):
                    return False
        return True
