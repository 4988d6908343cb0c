"""Rational sumcheck over the index domain K ([COS19], Fractal).

Counterpart of libiop/protocols/encoded/sumcheck/rational_sumcheck.{hpp,tcc}:
the prover sends the re-extension p of N/D over K (constant coefficient
dropped — it encodes the claimed sum: sum_K N/D = |K| * c_0); the virtual
constraint oracle
    q(x) = (D(x) * (x*p(x) + mu/|K|) - N(x)) / Z_K(x)
is low-degree iff p agrees with N/D on K and the claimed sum is mu
(rational_sumcheck.tcc:100-170, multiplicative case).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset
from ..algebra.fft import fft, ifft
from ..algebra.poly import vanishing_inverse_evals_over
from ..iop.runtime import IOPProtocol, OracleHandle, VirtualOracle


class SumcheckConstraintOracle(VirtualOracle):
    """Constituents: (p, N, D)."""

    def __init__(self, F: PrimeField, K: MultiplicativeCoset,
                 L: MultiplicativeCoset):
        self.F = F
        self.K = K
        self.L = L
        self.claimed_sum: Optional[int] = None

    def set_claimed_sum(self, mu: int):
        self.claimed_sum = mu % self.F.p
        self.mu_over_K = mu * pow(self.K.order, self.F.p - 2, self.F.p) % self.F.p

    def evaluated_contents(self, evals):
        assert self.claimed_sum is not None
        F = self.F
        p_evals, n_evals, d_evals = evals
        z_inv = vanishing_inverse_evals_over(self.K, self.L)
        mu_l = F.from_ints([self.mu_over_K]).reshape(F.L, 1)
        xp = F.mul(self.L.elements(), p_evals)
        inner = F.add(xp, jnp.broadcast_to(mu_l, xp.shape).astype(jnp.uint32))
        return F.mul(F.sub(F.mul(d_evals, inner), n_evals), z_inv)

    def evaluation_at_point(self, position, x, vals):
        assert self.claimed_sum is not None
        p = self.F.p
        p_x, n_x, d_x = vals
        z_x = (pow(x, self.K.order, p) - pow(self.K.shift, self.K.order, p)) % p
        return (d_x * (x * p_x + self.mu_over_K) - n_x) * pow(z_x, p - 2, p) % p


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
        coeffs = ifft(rational_over_K, self.K)
        c0 = int(F.to_ints(coeffs[:, :1])[0])
        self.claimed_sum = c0 * self.K.order % F.p
        reext = coeffs[:, 1:]  # drop the constant coefficient
        self.iop.submit_oracle(self.reextended_handle, fft(reext, self.L))
        self.constraint_oracle.set_claimed_sum(self.claimed_sum)

    def get_claimed_sum(self) -> int:
        return self.claimed_sum

    def construct_verifier_state(self, claimed_sum: int):
        self.claimed_sum = claimed_sum % self.F.p
        self.constraint_oracle.set_claimed_sum(self.claimed_sum)

    def ldt_oracle_handles(self):
        return [self.reextended_handle, self.constraint_handle]
