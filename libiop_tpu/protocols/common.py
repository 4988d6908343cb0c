"""Common virtual oracles shared across protocols.

Counterparts of libiop/protocols/encoded/common/: random_linear_combination
(random_linear_combination.hpp:20-38) and helpers.  Linear combinations are
accumulated lazily limb-wise and reduced once (see PrimeField.lazy_sum_reduce)
— one wide Montgomery reduction instead of one per term.
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..iop.runtime import VirtualOracle


def lazy_linear_combination(F, coeff_ints: List[int], evals_list):
    """sum_i c_i * f_i over device eval arrays, c_i canonical host ints.
    Field-generic: XOR accumulation for additive fields, lazy limb sums with
    one wide reduction would be the prime-field optimization (adds here)."""
    assert len(coeff_ints) == len(evals_list)
    acc = None
    for c, ev in zip(coeff_ints, evals_list):
        c_l = F.from_ints([c]).reshape(F.L, 1)
        term = F.mul(ev, c_l)
        acc = term if acc is None else F.add(acc, term)
    return acc


class SingleBoundaryConstraint(VirtualOracle):
    """(f(x) - v) / (x - beta): proves f(beta) = v
    (libiop boundary_constraint.{hpp,tcc})."""

    def __init__(self, F: PrimeField, codeword_domain):
        self.F = F
        self.L = codeword_domain
        self.eval_point = None
        self.oracle_eval = None

    def set_evaluation_point_and_eval(self, beta: int, value: int):
        self.eval_point = self.F.sample_int(beta)
        self.oracle_eval = self.F.sample_int(value)

    def evaluated_contents(self, evals):
        assert self.eval_point is not None
        F = self.F
        beta = F.from_ints([self.eval_point]).reshape(F.L, 1)
        v = F.from_ints([self.oracle_eval]).reshape(F.L, 1)
        elems = self.L.elements()
        denom = F.sub(elems, jnp.broadcast_to(beta, elems.shape).astype(jnp.uint32))
        num = F.sub(evals[0], jnp.broadcast_to(v, evals[0].shape).astype(jnp.uint32))
        return F.mul(num, F.inv(denom))

    def evaluation_at_point(self, position, x, vals):
        assert self.eval_point is not None
        F = self.F
        return F.mul_ints(F.sub_ints(vals[0], self.oracle_eval),
                          F.inv_int(F.sub_ints(x, self.eval_point)))


class CombinedDenominator(VirtualOracle):
    """Product of all constituent denominators
    (rational_linear_combination.tcc:12-60)."""

    def __init__(self, F: PrimeField, num_rationals: int):
        self.F = F
        self.n = num_rationals

    def evaluated_contents(self, evals):
        acc = evals[0]
        for ev in evals[1:]:
            acc = self.F.mul(acc, ev)
        return acc

    def evaluation_at_point(self, position, x, vals):
        F = self.F
        acc = 1
        for v in vals:
            acc = F.mul_ints(acc, v)
        return acc


class CombinedNumerator(VirtualOracle):
    """sum_i c_i N_i prod_{j != i} D_j; constituents = (N_0..N_{n-1},
    D_0..D_{n-1}) (rational_linear_combination.tcc:64-140)."""

    def __init__(self, F: PrimeField, num_rationals: int):
        self.F = F
        self.n = num_rationals
        self.coefficients = None

    def set_coefficients(self, coeffs):
        assert len(coeffs) == self.n
        self.coefficients = [self.F.sample_int(int(c)) for c in coeffs]

    def evaluated_contents(self, evals):
        assert self.coefficients is not None
        F = self.F
        nums, dens = evals[:self.n], evals[self.n:]
        acc = None
        for i in range(self.n):
            c = F.from_ints([self.coefficients[i]]).reshape(F.L, 1)
            term = F.mul(nums[i], c)
            for j in range(self.n):
                if j != i:
                    term = F.mul(term, dens[j])
            acc = term if acc is None else F.add(acc, term)
        return acc

    def evaluation_at_point(self, position, x, vals):
        assert self.coefficients is not None
        F = self.F
        nums, dens = vals[:self.n], vals[self.n:]
        total = 0
        for i in range(self.n):
            cur = F.mul_ints(self.coefficients[i], nums[i])
            for j in range(self.n):
                if j != i:
                    cur = F.mul_ints(cur, dens[j])
            total = F.add_ints(total, cur)
        return total


class RationalLinearCombination:
    """Wires combined numerator/denominator virtual oracles
    (rational_linear_combination.hpp:22-88)."""

    def __init__(self, iop, num_rationals: int, numerator_handles,
                 denominator_handles, codeword_handle,
                 numerator_degree: int, denominator_degree: int):
        self.iop = iop
        self.F = iop.F
        self.n = num_rationals
        self.numerator_oracle = CombinedNumerator(self.F, num_rationals)
        self.denominator_oracle = CombinedDenominator(self.F, num_rationals)
        self.numerator_handle = iop.register_virtual_oracle(
            codeword_handle, numerator_degree,
            list(numerator_handles) + list(denominator_handles),
            self.numerator_oracle)
        self.denominator_handle = iop.register_virtual_oracle(
            codeword_handle, denominator_degree, list(denominator_handles),
            self.denominator_oracle)

    def set_coefficients(self, coeffs):
        self.numerator_oracle.set_coefficients(coeffs)

    def values_over_K(self, F, coeff_ints, numerators_over_K, denominators_over_K):
        """sum_i c_i N_i(k)/D_i(k) over K (prover side, for rational sumcheck)."""
        acc = None
        for c, n_ev, d_ev in zip(coeff_ints, numerators_over_K, denominators_over_K):
            c_l = F.from_ints([c]).reshape(F.L, 1)
            term = F.mul(F.mul(n_ev, F.inv(d_ev)), c_l)
            acc = term if acc is None else F.add(acc, term)
        return acc


class RandomLinearCombinationOracle(VirtualOracle):
    """sum_i c_i f_i; coefficients set after the verifier's challenge."""

    def __init__(self, F: PrimeField, num_oracles: int):
        self.F = F
        self.num_oracles = num_oracles
        self.coefficients: Optional[List[int]] = None

    def set_coefficients(self, coeffs: List[int]):
        assert len(coeffs) == self.num_oracles
        self.coefficients = [self.F.sample_int(int(c)) for c in coeffs]

    def evaluated_contents(self, evals):
        assert self.coefficients is not None, "challenge not yet set"
        return lazy_linear_combination(self.F, self.coefficients, evals)

    # fused-DAG tracing (see iop/runtime.py VirtualOracle notes)
    def traced_aux(self):
        if self.coefficients is None:
            return None
        return [self.F.from_ints(self.coefficients)]        # (L, n)

    def traced_sig(self):
        return (self.num_oracles,)

    def traced_contents(self, aux, evals):
        F = self.F
        (carr,) = aux
        acc = None
        for i, ev in enumerate(evals):
            term = F.mul(ev, carr[:, i:i + 1])
            acc = term if acc is None else F.add(acc, term)
        return acc

    def evaluation_at_point(self, position, point_int, vals):
        assert self.coefficients is not None, "challenge not yet set"
        F = self.F
        acc = 0
        for c, v in zip(self.coefficients, vals):
            acc = F.add_ints(acc, F.mul_ints(c, v))
        return acc
