"""Univariate (Aurora) batch sumcheck over a multiplicative subgroup/coset.

Counterpart of libiop/protocols/encoded/sumcheck/sumcheck.{hpp,tcc}:
* claim: sum over H of f equals mu, for f of degree < degree_bound;
* prover decomposes f = Z_H*h + x*g + mu/|H| and sends h (sumcheck.tcc:
  calculate_and_submit_proof); the verifier reconstructs g virtually:
      g(x) = (f(x) - mu/|H| - Z_H(x) h(x)) * x^{-1}        (sumcheck.tcc:15-56)
  and g, h are low-degree-tested (deg g < |H|-1, deg h < degree_bound-|H|);
* batching: many claims are combined by a random linear combination
  (sumcheck.tcc:233-268); in zk mode a random masking polynomial summing to
  zero over H is added with its own coefficient (sumcheck.tcc:290-343 — for a
  multiplicative H, sum_H m = |H| * m(0), so m(0) is forced to zero).

TPU realization: the combined-f codeword is built with lazily-reduced linear
combinations; h comes from one degree-aware IFFT + the block division by
Z_H (algebra.poly.divide_by_vanishing) + one degree-aware FFT — all dense
tensor ops.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset
from ..algebra.fft import fft, ifft_of_known_degree
from ..algebra.generic import (divide_by_vanishing_any, fft_any,
                               ifft_known_any, linearized_vanishing,
                               mul_by_vanishing_any, vanishing_evals_over_any)
from ..algebra.poly import mul_by_vanishing, vanishing_evals_over
from ..iop.runtime import IOPProtocol, OracleHandle, VirtualOracle
from .common import RandomLinearCombinationOracle


class SumcheckGOracle(VirtualOracle):
    """The reconstructed-g virtual oracle (sumcheck.tcc:15-56):
    multiplicative H: g(x) = (f(x) - mu/|H| - Z_H(x) h(x)) * x^{-1};
    additive H:       g(x) = f(x) - eps^{-1} mu x^{|H|-1} - Z_H(x) h(x),
    eps the linear coefficient of the linearized Z_H."""

    def __init__(self, F, summation_domain, codeword_domain):
        self.F = F
        self.H = summation_domain
        self.L = codeword_domain
        self.additive = summation_domain.kind == "affine_subspace"
        if self.additive:
            self.Z = linearized_vanishing(summation_domain)
        self.claimed_sum: Optional[int] = None

    def set_claimed_sum(self, mu: int):
        F = self.F
        self.claimed_sum = F.sample_int(mu)
        if self.additive:
            self.mu_scaled = F.mul_ints(self.claimed_sum,
                                        F.inv_int(self.Z.epsilon))
        else:
            self.mu_scaled = F.mul_ints(self.claimed_sum,
                                        F.inv_int(self.H.order % F.p))

    def evaluated_contents(self, evals):
        assert self.claimed_sum is not None, "claimed sum not set"
        F = self.F
        f_evals, h_evals = evals
        if self.additive:
            z_evals = jnp.asarray(self.Z.evals_over(self.L))
            x_pow = F.pow_static(jnp.asarray(self.L.elements()),
                                 self.H.order - 1)
            mu_l = F.from_ints([self.mu_scaled]).reshape(F.L, 1)
            return F.sub(F.sub(f_evals, F.mul(x_pow, mu_l)),
                         F.mul(z_evals, h_evals))
        z_evals = vanishing_evals_over(self.H, self.L)
        mu_l = F.from_ints([self.mu_scaled]).reshape(F.L, 1)
        num = F.sub(F.sub(f_evals, jnp.broadcast_to(
            mu_l, f_evals.shape).astype(jnp.uint32)), F.mul(z_evals, h_evals))
        return F.mul(num, jnp.asarray(self.L.inverse_elements()))

    # fused-DAG tracing (see iop/runtime.py VirtualOracle notes)
    def traced_aux(self):
        if self.claimed_sum is None:
            return None
        F = self.F
        mu_l = F.from_ints([self.mu_scaled]).reshape(F.L, 1)
        if self.additive:
            from ..algebra.generic import device_memo
            from .ldt_reducer import x_power_evals
            z = device_memo(("zH_add", self.H._key(), self.L._key()),
                            lambda: self.Z.evals_over(self.L))
            return [z, x_power_evals(F, self.L, self.H.order - 1), mu_l]
        from ..algebra.generic import device_memo
        inv_x = device_memo(("inv_elems", self.L._key()),
                            self.L.inverse_elements)
        return [vanishing_evals_over_any(self.H, self.L), inv_x, mu_l]

    def traced_sig(self):
        return (self.additive,)

    def traced_contents(self, aux, evals):
        F = self.F
        f_evals, h_evals = evals
        if self.additive:
            z, xpow, mu_l = aux
            return F.sub(F.sub(f_evals, F.mul(xpow, mu_l)),
                         F.mul(z, h_evals))
        z, inv_x, mu_l = aux
        num = F.sub(F.sub(f_evals, jnp.broadcast_to(
            mu_l, f_evals.shape).astype(jnp.uint32)), F.mul(z, h_evals))
        return F.mul(num, inv_x)

    def evaluation_at_point(self, position, x, vals):
        assert self.claimed_sum is not None, "claimed sum not set"
        F = self.F
        f_x, h_x = vals
        if self.additive:
            z_x = self.Z.eval_at_point_int(x)
            t = F.mul_ints(self.mu_scaled, F.pow_int(x, self.H.order - 1))
            return F.sub_ints(F.sub_ints(f_x, t), F.mul_ints(z_x, h_x))
        p = self.F.p
        z_x = (pow(x, self.H.order, p) - pow(self.H.shift, self.H.order, p)) % p
        return (f_x - self.mu_scaled - z_x * h_x) * pow(x, p - 2, p) % p


# aliases kept for call-site brevity (dispatch lives in algebra.generic)
_fft_any = fft_any
_ifft_known_any = ifft_known_any


class BatchSumcheck:
    """Drives registration and proving of one batch-sumcheck instance
    (libiop batch_sumcheck_protocol role); multiplicative and additive
    summation domains."""

    def __init__(self, iop: IOPProtocol, summation_handle, codeword_handle,
                 degree_bound: int, make_zk: bool,
                 rng: Optional[np.random.Generator] = None):
        self.iop = iop
        self.F = iop.F
        self.summation_handle = summation_handle
        self.codeword_handle = codeword_handle
        self.H = iop.get_domain(summation_handle)
        self.L = iop.get_domain(codeword_handle)
        self.additive = self.H.kind == "affine_subspace"
        self.degree_bound = degree_bound
        self.make_zk = make_zk
        self.rng = rng or np.random.default_rng()
        self.g_degree = self.H.order - 1
        self.h_degree = degree_bound - self.H.order
        self.attached_handles: List[OracleHandle] = []
        self.claimed_sums: List[int] = []
        self.masking_handle: Optional[OracleHandle] = None

    # -- registration ------------------------------------------------------
    def register_masking_polynomial(self):
        self.masking_handle = self.iop.register_oracle(
            self.codeword_handle, self.degree_bound, make_zk=self.make_zk)

    def attach_oracle_for_summing(self, handle: OracleHandle, claimed_sum: int = 0):
        self.attached_handles.append(handle)
        self.claimed_sums.append(self.F.sample_int(claimed_sum))

    def set_oracle_claimed_sum(self, handle: OracleHandle, claimed_sum: int):
        idx = self.attached_handles.index(handle)
        self.claimed_sums[idx] = self.F.sample_int(claimed_sum)

    def register_challenge(self):
        n = len(self.attached_handles) + (1 if self.make_zk else 0)
        self.challenge_handle = self.iop.register_verifier_random_message(n)

    def register_proof(self):
        self.h_handle = self.iop.register_oracle(
            self.codeword_handle, self.h_degree, make_zk=False)
        constituents = ([self.masking_handle] if self.make_zk else []) \
            + list(self.attached_handles)
        self.combined_f_oracle = RandomLinearCombinationOracle(self.F, len(constituents))
        self.combined_f_handle = self.iop.register_virtual_oracle(
            self.codeword_handle, self.degree_bound, constituents,
            self.combined_f_oracle)
        self.g_oracle = SumcheckGOracle(self.F, self.H, self.L)
        self.g_handle = self.iop.register_virtual_oracle(
            self.codeword_handle, self.g_degree,
            [self.combined_f_handle, self.h_handle], self.g_oracle)

    # -- proving -----------------------------------------------------------
    def submit_masking_polynomial(self):
        """Random poly of degree < degree_bound summing to 0 over H:
        m = Z_H * h' + g' with g'(0) = 0 (multiplicative) or with the
        x^{|H|-1} coefficient zeroed (additive — sumcheck.tcc:290-343)."""
        assert self.make_zk
        F = self.F
        g_coeffs = F.random((self.H.order,), self.rng)
        h_coeffs = F.random((max(self.h_degree, 1),), self.rng)
        if self.additive:
            g_coeffs = g_coeffs.at[:, self.H.order - 1].set(0)
            Z = linearized_vanishing(self.H)
            m = jnp.zeros((F.L, self.degree_bound), dtype=jnp.uint32)
            hl = h_coeffs.shape[1]
            for deg, c in Z.coeffs_dense_positions():
                c_l = F.from_ints([c]).reshape(F.L, 1)
                seg = F.add(m[:, deg:deg + hl], F.mul(h_coeffs, c_l))
                m = m.at[:, deg:deg + hl].set(seg)
        else:
            g_coeffs = g_coeffs.at[:, 0].set(0)  # g'(0)=0 => sum over H is 0
            m = mul_by_vanishing(h_coeffs, self.H)  # Z_H * h'
        m = m.at[:, :self.H.order].set(F.add(m[:, :self.H.order], g_coeffs))
        evals = _fft_any(m, self.L)
        self.iop.submit_oracle(self.masking_handle, evals)

    def _combined_claimed_sum(self, challenge: List[int]) -> int:
        F = self.F
        start = 1 if self.make_zk else 0
        acc = 0
        for i, s in enumerate(self.claimed_sums):
            acc = F.add_ints(acc, F.mul_ints(challenge[i + start], s))
        return acc

    def calculate_and_submit_proof(self):
        F = self.F
        challenge = self.iop.obtain_verifier_random_message(self.challenge_handle)
        self.combined_f_oracle.set_coefficients(challenge)
        combined_evals = self.iop.get_fused_oracle_evaluations(
            [self.combined_f_handle])[0]
        coeffs = _ifft_known_any(combined_evals, self.L, self.degree_bound)
        coeffs = coeffs[:, :max(self.degree_bound, 1)]
        mu = self._combined_claimed_sum(challenge)
        self.g_oracle.set_claimed_sum(mu)
        quotient, _rem = divide_by_vanishing_any(coeffs, self.H)
        if quotient.shape[1] == 0:
            quotient = jnp.zeros((F.L, 1), dtype=jnp.uint32)
        d = 1 << (max(quotient.shape[1], 1) - 1).bit_length()
        if quotient.shape[1] != d:
            quotient = jnp.concatenate(
                [quotient, jnp.zeros((F.L, d - quotient.shape[1]), dtype=jnp.uint32)],
                axis=1)
        h_evals = _fft_any(quotient, self.L)
        self.iop.submit_oracle(self.h_handle, h_evals)

    # -- verification ------------------------------------------------------
    def construct_verifier_state(self):
        challenge = self.iop.obtain_verifier_random_message(self.challenge_handle)
        self.combined_f_oracle.set_coefficients(challenge)
        self.g_oracle.set_claimed_sum(self._combined_claimed_sum(challenge))

    # -- LDT interface -----------------------------------------------------
    def ldt_oracle_handles(self) -> List[OracleHandle]:
        handles = []
        if self.make_zk:
            handles.append(self.masking_handle)
        handles.append(self.h_handle)
        handles.append(self.g_handle)
        return handles
