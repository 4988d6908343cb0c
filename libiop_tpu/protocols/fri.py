"""FRI low-degree test over multiplicative cosets, TPU-first.

Counterpart of libiop/protocols/ldt/fri/fri_ldt.{hpp,tcc} + fri_aux.tcc:
* domain chain L^(i+1) = q^(i)(L^(i)) with q(x) = x^{2^eta_i} (per-round
  localization parameters, fri_ldt.tcc:280-339); with natural-order
  evaluations a size-c coset occupies strided positions
  {j, j+N/c, ..., j+(c-1)N/c}, so the fold is a plain reshape — no gathers;
* interactive phase: fold per coset at the verifier challenge x_i
  (fri_aux.tcc:107-250), final polynomial by IFFT truncated to the bound
  (fri_ldt.tcc:532-543);
* query phase: one random s0 per repetition, then deterministic coset-chasing
  (fri_ldt.tcc:401-473); round_parameters group each coset into one Merkle
  leaf so a full coset costs one leaf reveal;
* verifier: per-round coset interpolation + chain-consistency + final-poly
  check (fri_ldt.tcc:574-642).

TPU-native fold (replaces the reference's batch-inversion Lagrange path):
restricted to coset {h_j g^k}, f equals p_j(u) = sum_t a_t[j] u^t with
a_t[j] = (1/c) sum_k f[k,j] g^{-tk} — a c-point inverse NTT along the intra-
coset axis — and the folded value is p_j(x/h_j) = sum_t a_t[j] (x/shift)^t
G^{-jt}.  Everything is dense batched muls over (c, N/c) blocks; zero
inversions, no special case for x in the domain.
"""
from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset
from ..algebra.fft import ifft
from ..algebra.poly import horner_eval
from ..iop.runtime import IOPProtocol, OracleHandle, RoundParameters


def log2_field_size(F: PrimeField) -> float:
    """Soundness log2|F| (libff soundness_log_of_field_size_helper role)."""
    b = F.p.bit_length()
    return math.log2(F.p >> max(0, b - 53)) + max(0, b - 53)


class FRISoundnessType:
    proven = "proven"
    heuristic = "heuristic"


class FRIParameters:
    """Repetition counts from the FRI soundness analysis
    (fri_ldt.tcc:1-254, both proven and heuristic modes)."""

    def __init__(self, F: PrimeField,
                 interactive_soundness_bits: int,
                 query_soundness_bits: int,
                 soundness_type: str,
                 poly_degree_bound: int,
                 codeword_domain_dim: int,
                 RS_extra_dimensions: int,
                 absolute_proximity_parameter: int,
                 localization_parameters: List[int]):
        self.F = F
        self.soundness_type = soundness_type
        self.poly_degree_bound = poly_degree_bound
        self.codeword_domain_dim = codeword_domain_dim
        self.RS_extra_dimensions = RS_extra_dimensions
        self.localization_parameters = list(localization_parameters)
        total_loc = sum(self.localization_parameters)
        if poly_degree_bound % (1 << total_loc) != 0:
            raise ValueError("FRI degree bound must be a multiple of "
                             "2^{sum of localization parameters}")
        rate = 2.0 ** (-RS_extra_dimensions)
        codeword_domain_size = 2.0 ** codeword_domain_dim
        frac_prox = absolute_proximity_parameter / codeword_domain_size
        field_bits = log2_field_size(F)
        loc_coset_size = 2.0 ** self.localization_parameters[0]
        if soundness_type == FRISoundnessType.proven:
            term2 = (1 - 3 * rate - loc_coset_size / math.sqrt(codeword_domain_size)) / 4
            self.effective_proximity = min(frac_prox, term2)
            denom = math.log2(1 - self.effective_proximity)
            self.num_query_repetitions = max(
                1, int(math.ceil(-query_soundness_bits / denom)))
            per_interaction = math.log2(3) + codeword_domain_dim - field_bits
            self.num_interactive_repetitions = max(
                1, int(math.ceil(-interactive_soundness_bits / per_interaction)))
        else:
            self.effective_proximity = frac_prox
            denom = math.log2(1 - self.effective_proximity)
            self.num_query_repetitions = max(
                1, int(math.ceil(-query_soundness_bits / denom)))
            per_interaction = math.log2(loc_coset_size - 1.0) - field_bits
            self.num_interactive_repetitions = max(
                1, int(math.ceil(-interactive_soundness_bits / per_interaction)))

    @staticmethod
    def localization_parameter_to_array(localization_parameter: int,
                                        codeword_domain_dim: int,
                                        RS_extra_dimensions: int) -> List[int]:
        """[1, eta, eta, ...] until the final domain has dimension ~RS_extra
        (fri_ldt.tcc:132-160 behavior: first round always 1)."""
        num_reductions = max(1, (codeword_domain_dim - RS_extra_dimensions - 1)
                             // localization_parameter)
        return [1] + [localization_parameter] * (num_reductions - 1) \
            if localization_parameter > 0 else [1]

    @staticmethod
    def next_testable_degree_bound(degree: int, localization_parameters: List[int]) -> int:
        m = 1 << sum(localization_parameters)
        return -(-degree // m) * m


def fold_codeword(F: PrimeField, evals, domain: MultiplicativeCoset,
                  eta: int, x_int: int):
    """One FRI reduction of a natural-order codeword (see module docstring).
    Returns the folded (L, N/2^eta) codeword over q(domain), q(x)=x^{2^eta}."""
    c = 1 << eta
    N = domain.order
    nc = N // c
    p = F.p
    v = evals.reshape(F.L, c, nc)
    # per-coset inverse NTT along the intra axis: a_t = (1/c) sum_k v_k g^{-tk}
    g = pow(F.root_of_unity, 1 << (F.two_adicity - eta), p)  # canonical order-c gen
    c_inv = pow(c, p - 2, p)
    x_over_shift = x_int * pow(domain.shift, p - 2, p) % p
    Winv = domain.inverse_generator_powers()                 # (L, N): G^-m
    acc = None
    for t in range(c):
        # scalar weights: (1/c) * g^{-tk} folded with (x/shift)^t
        xt = pow(x_over_shift, t, p) * c_inv % p
        a_t = None
        for k in range(c):
            w = F.from_ints([pow(g, (p - 1 - (t * k) % (p - 1)) % (p - 1), p)
                             * xt % p]).reshape(F.L, 1)
            term = F.mul(v[:, k, :], w)
            a_t = term if a_t is None else F.add(a_t, term)
        # multiply by G^{-jt} over j: strided slice of cached inverse powers
        if t == 0:
            term = a_t
        else:
            term = F.mul(a_t, Winv[:, ::t][:, :nc] if t > 0 else None)
        acc = term if acc is None else F.add(acc, term)
    return acc


def interpolate_coset_at_point_ints(F: PrimeField, coset_values: List[int],
                                    coset_shift: int, eta: int, x: int) -> int:
    """Host-int mirror of one coset's fold (verifier side)."""
    c = 1 << eta
    p = F.p
    g = pow(F.root_of_unity, 1 << (F.two_adicity - eta), p)
    c_inv = pow(c, p - 2, p)
    x_over_h = x * pow(coset_shift, p - 2, p) % p
    total = 0
    for t in range(c):
        a_t = sum(coset_values[k] * pow(g, (-t * k) % (p - 1), p)
                  for k in range(c)) * c_inv % p
        total = (total + a_t * pow(x_over_h, t, p)) % p
    return total


class FRIProtocol:
    """Multi-FRI: several codewords share challenges and query positions
    (fri_ldt.hpp:38-43)."""

    def __init__(self, iop: IOPProtocol, params: FRIParameters,
                 codeword_handle, poly_handles: List[OracleHandle]):
        self.iop = iop
        self.F = iop.F
        self.params = params
        self.codeword_handle = codeword_handle
        self.poly_handles = list(poly_handles)
        self.num_reductions = len(params.localization_parameters)
        self._compute_domains()

    def _compute_domains(self):
        F = self.F
        dom0 = self.iop.get_domain(self.codeword_handle)
        self.domains: List[MultiplicativeCoset] = [dom0]
        shift, dim = dom0.shift, dom0.dim
        for eta in self.params.localization_parameters:
            shift = pow(shift, 1 << eta, F.p)
            dim -= eta
            self.domains.append(MultiplicativeCoset(F, dim, shift))

    # -- registration ------------------------------------------------------
    def register_interactions(self):
        ni = self.params.num_interactive_repetitions
        etas = self.params.localization_parameters
        self.domain_handles = [self.codeword_handle]
        # oracle_handles[i][j][ldt]: round i, interaction j, codeword ldt
        self.oracle_handles: List[List[List[OracleHandle]]] = [
            [list(self.poly_handles)]]
        self.challenge_handles = [
            [self.iop.register_verifier_random_message(1) for _ in range(ni)]]
        total_loc = etas[0]
        for i in range(1, self.num_reductions):
            total_loc += etas[i]
            degree_bound = self.params.poly_degree_bound >> sum(etas[:i])
            dh = self.iop.register_domain(self.domains[i])
            per_interaction = []
            for j in range(ni):
                per_interaction.append([
                    self.iop.register_oracle(dh, degree_bound, make_zk=False)
                    for _ in self.poly_handles])
            self.iop.set_round_parameters(RoundParameters(
                quotient_map_size=1 << etas[i]))
            self.domain_handles.append(dh)
            self.oracle_handles.append(per_interaction)
            self.challenge_handles.append(
                [self.iop.register_verifier_random_message(1) for _ in range(ni)])
        self.final_degree_bound = self.params.poly_degree_bound >> sum(etas)
        self.final_poly_handles = [
            [self.iop.register_prover_message(max(1, self.final_degree_bound))
             for _ in self.poly_handles]
            for _ in range(ni)]

    def register_queries(self):
        etas = self.params.localization_parameters
        self.query_sets = []
        for q in range(self.params.num_query_repetitions):
            s0 = self.iop.register_random_query_position(self.domain_handles[0])
            coset_handles = []
            s_handle = s0
            for i in range(self.num_reductions):
                nc = self.domains[i].order >> etas[i]
                handles = [self.iop.register_deterministic_query_position(
                    [s_handle], (lambda s, k=k, nc=nc: (s % nc) + k * nc))
                    for k in range(1 << etas[i])]
                coset_handles.append(handles)
                s_handle = handles[0]  # next round's s = coset index
            for j in range(self.params.num_interactive_repetitions):
                for ldt in range(len(self.poly_handles)):
                    qset = {
                        "s0": s0, "interaction": j, "ldt": ldt,
                        "coset_queries": []}
                    for i in range(self.num_reductions):
                        ji = 0 if i == 0 else j
                        qset["coset_queries"].append([
                            self.iop.register_query(
                                self.oracle_handles[i][ji][ldt], ph)
                            for ph in coset_handles[i]])
                    self.query_sets.append(qset)

    # -- proving -----------------------------------------------------------
    def calculate_and_submit_proof(self):
        F = self.F
        ni = self.params.num_interactive_repetitions
        etas = self.params.localization_parameters
        base_evals = [self.iop.get_oracle_evaluations(h) for h in self.poly_handles]
        per_interaction = [list(base_evals) for _ in range(ni)]
        for i in range(self.num_reductions):
            if i > 0:
                for j in range(ni):
                    for ldt, ev in enumerate(per_interaction[j]):
                        self.iop.submit_oracle(self.oracle_handles[i][j][ldt], ev)
                self.iop.signal_prover_round_done()
            for j in range(ni):
                x_i = self.iop.obtain_verifier_random_message(
                    self.challenge_handles[i][j])[0]
                per_interaction[j] = [
                    fold_codeword(F, ev, self.domains[i], etas[i], x_i)
                    for ev in per_interaction[j]]
        final_domain = self.domains[self.num_reductions]
        for j in range(ni):
            for ldt, ev in enumerate(per_interaction[j]):
                coeffs = ifft(ev, final_domain)
                ints = [int(v) for v in
                        F.to_ints(coeffs[:, :max(1, self.final_degree_bound)])]
                self.iop.submit_prover_message(self.final_poly_handles[j][ldt], ints)
        self.iop.signal_prover_round_done()

    # -- verification ------------------------------------------------------
    def verifier_predicate(self) -> bool:
        ok = True
        for qset in self.query_sets:
            if not self._predicate_for_query_set(qset):
                ok = False
        return ok

    def _predicate_for_query_set(self, qset) -> bool:
        F = self.F
        p = F.p
        etas = self.params.localization_parameters
        s_idx = self.iop.obtain_query_position(qset["s0"])
        s = self.domains[0].element_by_index_int(s_idx)
        last_interp = None
        for i in range(self.num_reductions):
            x_i = self.iop.obtain_verifier_random_message(
                self.challenge_handles[i][qset["interaction"]])[0]
            c = 1 << etas[i]
            dom = self.domains[i]
            si_j = dom.coset_index(s_idx, c)
            si_k = dom.intra_coset_index(s_idx, c)
            s_idx = si_j
            coset_vals = [self.iop.obtain_query_response(qh)
                          for qh in qset["coset_queries"][i]]
            if i > 0 and last_interp != coset_vals[si_k]:
                return False
            coset_shift = dom.element_by_index_int(
                dom.position_by_coset_indices(si_j, 0, c))
            last_interp = interpolate_coset_at_point_ints(
                F, coset_vals, coset_shift, etas[i], x_i)
            s = pow(s, c, p)
        final_coeffs = self.iop.receive_prover_message(
            self.final_poly_handles[qset["interaction"]][qset["ldt"]])
        val = 0
        for cf in reversed(final_coeffs):
            val = (val * s + cf) % p
        return val == last_interp
