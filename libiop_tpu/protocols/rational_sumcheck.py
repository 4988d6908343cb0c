"""Rational sumcheck over the index domain K ([COS19], Fractal).

Counterpart of libiop/protocols/encoded/sumcheck/rational_sumcheck.{hpp,tcc},
both domain families (rational_sumcheck.tcc:75-160, 224-245):
* multiplicative: the prover sends the re-extension p of N/D over K with the
  CONSTANT coefficient dropped (it encodes the claimed sum, sum_K = |K|*c_0);
  constraint q(x) = (D(x) * (x*p(x) + mu/|K|) - N(x)) / Z_K(x);
* additive: the TOP coefficient is dropped (sum_K = eps * c_{|K|-1}, eps the
  linear coefficient of the linearized Z_K);
  constraint q(x) = (D(x) * (p(x) + eps^{-1} mu x^{|K|-1}) - N(x)) / Z_K(x).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..algebra.generic import (fft_any, ifft_any, is_additive,
                               linearized_vanishing, vanishing_eval_int,
                               vanishing_inverse_evals_over_any)
from ..iop.runtime import IOPProtocol, OracleHandle, VirtualOracle


class SumcheckConstraintOracle(VirtualOracle):
    """Constituents: (p, N, D)."""

    def __init__(self, F, K, L):
        self.F = F
        self.K = K
        self.L = L
        self.additive = is_additive(K)
        self.claimed_sum: Optional[int] = None

    def set_claimed_sum(self, mu: int):
        F = self.F
        self.claimed_sum = F.sample_int(mu)
        if self.additive:
            eps = linearized_vanishing(self.K).epsilon
            self.mu_scaled = F.mul_ints(self.claimed_sum, F.inv_int(eps))
        else:
            self.mu_scaled = F.mul_ints(self.claimed_sum,
                                        F.inv_int(self.K.order % F.p))

    def evaluated_contents(self, evals):
        assert self.claimed_sum is not None
        F = self.F
        p_evals, n_evals, d_evals = evals
        z_inv = vanishing_inverse_evals_over_any(self.K, self.L)
        mu_l = F.from_ints([self.mu_scaled]).reshape(F.L, 1)
        if self.additive:
            x_pow = F.pow_static(jnp.asarray(self.L.elements()),
                                 self.K.order - 1)
            inner = F.add(p_evals, F.mul(x_pow, mu_l))
        else:
            xp = F.mul(self.L.elements(), p_evals)
            inner = F.add(xp, jnp.broadcast_to(mu_l, xp.shape).astype(jnp.uint32))
        return F.mul(F.sub(F.mul(d_evals, inner), n_evals), z_inv)

    def evaluation_at_point(self, position, x, vals):
        assert self.claimed_sum is not None
        F = self.F
        p_x, n_x, d_x = vals
        z_x = vanishing_eval_int(self.K, x)
        if self.additive:
            inner = F.add_ints(p_x, F.mul_ints(
                self.mu_scaled, F.pow_int(x, self.K.order - 1)))
        else:
            inner = F.add_ints(F.mul_ints(x, p_x), self.mu_scaled)
        return F.mul_ints(F.sub_ints(F.mul_ints(d_x, inner), n_x),
                          F.inv_int(z_x))


class RationalSumcheck:
    def __init__(self, iop: IOPProtocol, summation_handle, codeword_handle,
                 numerator_degree_bound: int, denominator_degree_bound: int):
        self.iop = iop
        self.F = iop.F
        self.K = iop.get_domain(summation_handle)
        self.L = iop.get_domain(codeword_handle)
        self.codeword_handle = codeword_handle
        self.reextended_degree = self.K.order - 1
        self.constraint_degree = max(
            numerator_degree_bound,
            denominator_degree_bound + self.K.order - 1) - self.K.order
        self.claimed_sum: Optional[int] = None

    def register_summation_oracle(self, numerator_handle: OracleHandle,
                                  denominator_handle: OracleHandle):
        self.numerator_handle = numerator_handle
        self.denominator_handle = denominator_handle

    def register_proof(self):
        self.reextended_handle = self.iop.register_oracle(
            self.codeword_handle, self.reextended_degree, make_zk=False)
        self.constraint_oracle = SumcheckConstraintOracle(self.F, self.K, self.L)
        self.constraint_handle = self.iop.register_virtual_oracle(
            self.codeword_handle, self.constraint_degree,
            [self.reextended_handle, self.numerator_handle,
             self.denominator_handle],
            self.constraint_oracle)

    def calculate_and_submit_proof(self, rational_over_K):
        """rational_over_K: (L, |K|) values of N/D on K (natural order)."""
        F = self.F
        coeffs = ifft_any(rational_over_K, self.K)
        if is_additive(self.K):
            top = int(F.to_ints(coeffs[:, -1:])[0])
            eps = linearized_vanishing(self.K).epsilon
            self.claimed_sum = F.mul_ints(eps, top)
            reext = coeffs[:, :-1]  # drop the top coefficient
        else:
            c0 = int(F.to_ints(coeffs[:, :1])[0])
            self.claimed_sum = F.mul_ints(c0, self.K.order % F.p)
            reext = coeffs[:, 1:]  # drop the constant coefficient
        self.iop.submit_oracle(self.reextended_handle, fft_any(reext, self.L))
        self.constraint_oracle.set_claimed_sum(self.claimed_sum)

    def get_claimed_sum(self) -> int:
        return self.claimed_sum

    def construct_verifier_state(self, claimed_sum: int):
        self.claimed_sum = self.F.sample_int(claimed_sum)
        self.constraint_oracle.set_claimed_sum(self.claimed_sum)

    def ldt_oracle_handles(self):
        return [self.reextended_handle, self.constraint_handle]
