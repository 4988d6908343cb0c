"""LDT instance reducer: combine all oracles (real + virtual, mixed degrees)
into a few random linear combinations that a single multi-LDT tests.

Counterpart of libiop/protocols/ldt/ldt_reducer.{hpp,tcc} + ldt_reducer_aux:
* each submaximal-degree oracle f gets an extra X^{Delta}-shifted term so
  everything is tested at the max degree (ldt_reducer_aux.hpp:27-54):
      combined = sum_i (c_i + c'_i x^{Delta_i}) f_i,  c_0 = 1 fixed;
* zk mode adds one fresh random blinding polynomial of max degree per output
  instance (ldt_reducer.tcc:242-258);
* the proximity parameter comes from the RS-encoded-IOP compiler soundness
  min(...) formula (ldt_reducer.tcc:20-57), soundness types proven /
  optimistic_heuristic (ldt_reducer.hpp:22-28);
* number of output instances from interactive soundness (ldt_reducer.tcc:44-58).
"""
from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset, device_powers
from ..algebra.generic import fft_any, is_additive
from ..iop.runtime import IOPProtocol, OracleHandle, VirtualOracle
from .fri import log2_field_size


class LDTReducerSoundnessType:
    proven = "proven"
    optimistic_heuristic = "optimistic_heuristic"


class LDTReducerParams:
    def __init__(self, F, interactive_soundness_bits: int,
                 soundness_type: str, codeword_domain_dim: int,
                 max_tested_degree_bound: int,
                 max_constraint_degree_bound: int, make_zk: bool):
        self.F = F
        self.soundness_type = soundness_type
        self.codeword_domain_dim = codeword_domain_dim
        self.max_tested_degree_bound = max_tested_degree_bound
        self.max_constraint_degree_bound = max_constraint_degree_bound
        self.make_zk = make_zk
        N = 1 << codeword_domain_dim
        if soundness_type == LDTReducerSoundnessType.proven:
            self.absolute_proximity_parameter = min(
                N - max_constraint_degree_bound,
                (N - 2 * max_tested_degree_bound) // 2,
                (N - max_tested_degree_bound) // 3) - 1
        else:
            self.absolute_proximity_parameter = min(
                N - max_constraint_degree_bound,
                N - max_tested_degree_bound) - 1
        field_bits = log2_field_size(F)
        denom = codeword_domain_dim - field_bits
        self.num_output_LDT_instances = max(
            1, int(math.ceil(-interactive_soundness_bits / denom)))


def x_power_evals(F, L, delta: int):
    """x^delta over the domain L, device-resident, memoized by VALUE
    (domain identity, delta) across proofs.  Multiplicative: shift^delta *
    g^{delta*k} — a strided slice of cached generator powers times one
    scalar.  Additive: batched square-and-multiply over the element array
    (O(log delta) squarings+muls at full width)."""
    from ..algebra.generic import device_memo

    def _compute():
        if is_additive(L):
            return F.pow_static(jnp.asarray(L.elements()), delta)
        N = L.order
        W = L.generator_powers()
        idx = (np.arange(N, dtype=np.int64) * (delta % N)) % N
        strided = jnp.take(jnp.asarray(W), jnp.asarray(idx), axis=1)
        s = F.from_ints([pow(L.shift, delta, F.p)]).reshape(F.L, 1)
        return F.mul(strided, s)

    return device_memo(("xpow", L._key(), delta), _compute)


class CombinedLDTOracle(VirtualOracle):
    """sum_i (c_i + c'_i x^{Delta_i}) f_i over the codeword domain."""

    def __init__(self, F, codeword_domain, input_degrees: List[int]):
        self.F = F
        self.L = codeword_domain
        self.input_degrees = list(input_degrees)
        self.n = len(input_degrees)
        self.max_degree = max(input_degrees)
        self.submaximal = [i for i, d in enumerate(input_degrees)
                           if d < self.max_degree]
        self.num_random_coefficients = 2 * self.n
        self.coefficients: Optional[List[int]] = None

    def set_coefficients(self, random_coeffs: List[int]):
        assert len(random_coeffs) >= self.num_random_coefficients
        self.coefficients = [1] + [self.F.sample_int(int(c))
                                   for c in random_coeffs]

    def _bump_powers(self, delta: int):
        return x_power_evals(self.F, self.L, delta)

    def evaluated_contents(self, evals):
        assert self.coefficients is not None, "challenge not set"
        F = self.F
        acc = None
        sub_counter = 0
        for i, ev in enumerate(evals):
            c_i = F.from_ints([self.coefficients[i]]).reshape(F.L, 1)
            if i in self.submaximal:
                delta = self.max_degree - self.input_degrees[i]
                cp = self.coefficients[self.n + sub_counter]
                sub_counter += 1
                bump = self._bump_powers(delta)
                cp_l = F.from_ints([cp]).reshape(F.L, 1)
                coeff = F.add(jnp.broadcast_to(c_i, bump.shape).astype(jnp.uint32),
                              F.mul(bump, cp_l))
                term = F.mul(ev, coeff)
            else:
                term = F.mul(ev, c_i)
            acc = term if acc is None else F.add(acc, term)
        return acc

    # fused-DAG tracing (see iop/runtime.py VirtualOracle notes)
    def traced_aux(self):
        if self.coefficients is None:
            return None
        F = self.F
        aux = [F.from_ints(self.coefficients[:self.n])]     # (L, n)
        if self.submaximal:
            aux.append(F.from_ints(
                self.coefficients[self.n:self.n + len(self.submaximal)]))
            aux.extend(self._bump_powers(self.max_degree - self.input_degrees[i])
                       for i in self.submaximal)
        return aux

    def traced_sig(self):
        return (self.n, tuple(self.input_degrees))

    def traced_contents(self, aux, evals):
        F = self.F
        cs = aux[0]
        bumps = aux[2:]
        acc = None
        sc = 0
        for i, ev in enumerate(evals):
            c_i = cs[:, i:i + 1]
            if i in self.submaximal:
                coeff = F.add(
                    jnp.broadcast_to(c_i, bumps[sc].shape).astype(jnp.uint32),
                    F.mul(bumps[sc], aux[1][:, sc:sc + 1]))
                sc += 1
                term = F.mul(ev, coeff)
            else:
                term = F.mul(ev, c_i)
            acc = term if acc is None else F.add(acc, term)
        return acc

    def evaluation_at_point(self, position, x, vals):
        assert self.coefficients is not None, "challenge not set"
        F = self.F
        total = 0
        sub_counter = 0
        for i, v in enumerate(vals):
            c = self.coefficients[i]
            if i in self.submaximal:
                delta = self.max_degree - self.input_degrees[i]
                cp = self.coefficients[self.n + sub_counter]
                sub_counter += 1
                c = F.add_ints(c, F.mul_ints(cp, F.pow_int(x, delta)))
            total = F.add_ints(total, F.mul_ints(c, v))
        return total


class LDTInstanceReducer:
    """Hosts the multi-LDT (FRI or direct) over the combined oracles
    (multi_ldt_base.hpp:17-47 role via duck typing)."""

    def __init__(self, iop: IOPProtocol, codeword_handle,
                 params: LDTReducerParams,
                 rng: Optional[np.random.Generator] = None):
        self.iop = iop
        self.F = iop.F
        self.codeword_handle = codeword_handle
        self.params = params
        self.L = iop.get_domain(codeword_handle)
        self.rng = rng or np.random.default_rng()
        self.blinding_handles: List[OracleHandle] = []
        if params.make_zk:
            self.blinding_handles = [
                self.iop.register_oracle(codeword_handle,
                                         params.max_tested_degree_bound,
                                         make_zk=True)
                for _ in range(params.num_output_LDT_instances)]
        self.multi_ldt = None

    def set_ldt(self, ldt_factory):
        """ldt_factory(iop, codeword_handle, combined_handles) -> LDT object
        with register_interactions/register_queries/calculate_and_submit_proof/
        verifier_predicate."""
        self._ldt_factory = ldt_factory

    def register_interactions(self, oracle_handles: List[OracleHandle]):
        self.input_handles = list(oracle_handles)
        degrees = [self.iop.get_oracle_degree_bound(h) for h in oracle_handles]
        for d in degrees:
            assert d <= self.params.max_tested_degree_bound, (
                f"oracle degree {d} exceeds max tested bound "
                f"{self.params.max_tested_degree_bound}")
        if self.params.make_zk:
            degrees = degrees + [self.params.max_tested_degree_bound]
        self.num_random_coefficients = 2 * len(self.input_handles) + \
            (2 if self.params.make_zk else 0)
        self.combined_oracles: List[CombinedLDTOracle] = []
        self.combined_handles: List[OracleHandle] = []
        for i in range(self.params.num_output_LDT_instances):
            constituents = list(self.input_handles)
            if self.params.make_zk:
                constituents.append(self.blinding_handles[i])
            oracle = CombinedLDTOracle(self.F, self.L, degrees)
            handle = self.iop.register_virtual_oracle(
                self.codeword_handle, self.params.max_tested_degree_bound,
                constituents, oracle)
            self.combined_oracles.append(oracle)
            self.combined_handles.append(handle)
        self.coefficient_handles = [
            self.iop.register_verifier_random_message(self.num_random_coefficients)
            for _ in range(self.params.num_output_LDT_instances)]
        self.multi_ldt = self._ldt_factory(
            self.iop, self.codeword_handle, self.combined_handles)
        self.multi_ldt.register_interactions()

    def register_queries(self):
        self.multi_ldt.register_queries()

    def submit_masking_polynomial(self):
        if not self.params.make_zk:
            return
        for h in self.blinding_handles:
            coeffs = self.F.random((self.params.max_tested_degree_bound,), self.rng)
            self.iop.submit_oracle(h, fft_any(coeffs, self.L))

    def _set_challenges(self):
        for i, oracle in enumerate(self.combined_oracles):
            challenge = self.iop.obtain_verifier_random_message(
                self.coefficient_handles[i])
            oracle.set_coefficients(challenge)

    def calculate_and_submit_proof(self):
        self._set_challenges()
        self.multi_ldt.calculate_and_submit_proof()

    def verifier_predicate(self) -> bool:
        self._set_challenges()
        return self.multi_ldt.verifier_predicate()
