"""Holographic (multi-)lincheck — Fractal's two-challenge lincheck.

Counterpart of libiop/protocols/encoded/lincheck/holographic_lincheck.{hpp,tcc}
+ holographic_lincheck_aux.tcc:

Round structure (holographic_lincheck.tcc:262-330):
* challenge alpha (+ r_M coefficients);
* response alpha: prover sends t ~= p_M(alpha, .) (the LDE over H of
  sum_M r_M M^T applied to the unnormalized Lagrange p_alpha), and the
  lincheck virtual oracle
      q(x) = p_alpha(x) * sum_M r_M f_Mz(x) - t(x) * f_z(x)
  is attached to a standard sumcheck over H with claimed sum 0;
* challenge beta (+ sumcheck challenge);
* response beta: prover sends M'(alpha,beta) as a message; a boundary
  constraint ties t(beta) to it; and a rational sumcheck over the index
  domain K checks M'(alpha,beta) = sum_K N/D with
      N = sum_M r_M Z_H(alpha) Z_H(beta) val_M,
      D_M = (row_M - beta)(col_M - alpha)
  expressed through the indexed row/col/val/row*col oracles
  (holographic_lincheck.tcc:436-546).
"""
from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset
from ..algebra.generic import (fft_any, ifft_any,
                               lagrange_poly_eval_at_point_int_any,
                               lagrange_poly_evals_over_any,
                               vanishing_eval_int)
from ..iop.runtime import IOPProtocol, OracleHandle, VirtualOracle
from ..relations.sparse import SparseMatrix
from .common import RationalLinearCombination, SingleBoundaryConstraint
from .fri import log2_field_size
from .rational_sumcheck import RationalSumcheck
from .sumcheck import BatchSumcheck


class HolographicLincheckParams:
    def __init__(self, F, interactive_security_parameter: int,
                 constraint_domain_dim: int, make_zk: bool):
        self.F = F
        self.constraint_domain_dim = constraint_domain_dim
        self.make_zk = make_zk
        per_rep = (1 + constraint_domain_dim) - log2_field_size(F)
        self.num_repetitions = max(1, int(
            math.ceil(-interactive_security_parameter / per_rep)))

    def tested_degree_bound(self) -> int:
        return 3 * (1 << self.constraint_domain_dim)

    def constraint_degree_bound(self) -> int:
        return 4 * (1 << self.constraint_domain_dim)


class HolographicLincheckVirtualOracle(VirtualOracle):
    """q(x) = p_alpha(x) * f_combined_Mz(x) - t(x) * f_z(x).
    Constituents: [fz, fAz, fBz, fCz, t]."""

    def __init__(self, F, codeword_domain, summation_domain,
                 num_matrices: int):
        self.F = F
        self.L = codeword_domain
        self.H = summation_domain
        self.num_matrices = num_matrices
        self.alpha: Optional[int] = None

    def set_challenge(self, alpha: int, r_Mz: List[int]):
        self.alpha = self.F.sample_int(alpha)
        self.r_Mz = [self.F.sample_int(int(r)) for r in r_Mz]

    def evaluated_contents(self, evals):
        assert self.alpha is not None
        F = self.F
        fz = evals[0]
        t = evals[self.num_matrices + 1]
        p_alpha_cw = lagrange_poly_evals_over_any(self.H, self.alpha, self.L)
        combined = None
        for m in range(self.num_matrices):
            c = F.from_ints([self.r_Mz[m]]).reshape(F.L, 1)
            term = F.mul(evals[m + 1], c)
            combined = term if combined is None else F.add(combined, term)
        return F.sub(F.mul(combined, p_alpha_cw), F.mul(fz, t))

    def evaluation_at_point(self, position, x, vals):
        assert self.alpha is not None
        F = self.F
        fz, t = vals[0], vals[self.num_matrices + 1]
        pa = lagrange_poly_eval_at_point_int_any(self.H, self.alpha, x)
        combined = 0
        for r, v in zip(self.r_Mz, vals[1:]):
            combined = F.add_ints(combined, F.mul_ints(r, v))
        return F.sub_ints(F.mul_ints(combined, pa), F.mul_ints(fz, t))


class SingleMatrixDenominator(VirtualOracle):
    """(row(x) - row_qp)(col(x) - col_qp) via row, col, row*col oracles
    (holographic_lincheck_aux.tcc:99-165)."""

    def __init__(self, F):
        self.F = F
        self.row_qp = None
        self.col_qp = None

    def set_challenge(self, row_query_point: int, col_query_point: int):
        self.row_qp = self.F.sample_int(row_query_point)
        self.col_qp = self.F.sample_int(col_query_point)

    def evaluated_contents(self, evals):
        assert self.row_qp is not None
        F = self.F
        row, col, rowcol = evals
        a = F.from_ints([F.neg_int(self.col_qp)]).reshape(F.L, 1)
        b = F.from_ints([F.neg_int(self.row_qp)]).reshape(F.L, 1)
        c = F.from_ints([F.mul_ints(self.row_qp, self.col_qp)]).reshape(F.L, 1)
        out = F.add(F.mul(row, a), F.mul(col, b))
        out = F.add(out, rowcol)
        return F.add(out, jnp.broadcast_to(c, out.shape).astype(jnp.uint32))

    def evaluation_at_point(self, position, x, vals):
        assert self.row_qp is not None
        F = self.F
        row, col, rowcol = vals
        out = F.sub_ints(rowcol, F.mul_ints(self.col_qp, row))
        out = F.sub_ints(out, F.mul_ints(self.row_qp, col))
        return F.add_ints(out, F.mul_ints(self.row_qp, self.col_qp))


def compute_p_alpha_M_evals(F, input_variable_dim: int,
                            summation_domain: MultiplicativeCoset,
                            p_alpha_over_H, r_Mz: List[int],
                            matrices: List[SparseMatrix]):
    """(L, |H|) evals of sum_M r_M (M^T p_alpha) scattered to variable slots
    (encoded/lincheck/common.tcc:4-38), all on device."""
    Hs = summation_domain
    acc = None
    for m, M in enumerate(matrices):
        v = M.matvec_transpose(p_alpha_over_H[:, :M.num_rows])
        c = F.from_ints([r_Mz[m]]).reshape(F.L, 1)
        term = F.mul(v, c)
        acc = term if acc is None else F.add(acc, term)
    nv = Hs.order
    if acc.shape[1] < nv:
        acc = jnp.concatenate(
            [acc, jnp.zeros((F.L, nv - acc.shape[1]), dtype=jnp.uint32)], axis=1)
    reindex = np.array(
        [Hs.reindex_by_subgroup(input_variable_dim, j) for j in range(nv)],
        dtype=np.int64)
    from ..algebra.generic import place_columns
    return place_columns(acc[:, :nv], reindex, nv)


class HolographicMultiLincheck:
    def __init__(self, iop: IOPProtocol, codeword_handle, summation_handle,
                 input_variable_dim: int, matrices: List[SparseMatrix],
                 fz_handle: OracleHandle, Mz_handles: List[OracleHandle],
                 params: HolographicLincheckParams,
                 rng: Optional[np.random.Generator] = None):
        self.iop = iop
        self.F = iop.F
        self.params = params
        self.codeword_handle = codeword_handle
        self.summation_handle = summation_handle
        self.H = iop.get_domain(summation_handle)
        self.L = iop.get_domain(codeword_handle)
        self.input_variable_dim = input_variable_dim
        self.matrices = matrices
        self.num_matrices = len(matrices)
        self.constituents = [fz_handle] + list(Mz_handles)
        fz_degree = iop.get_oracle_degree_bound(fz_handle)
        Mz_degree = iop.get_oracle_degree_bound(Mz_handles[0])
        self.lincheck_degree = self.H.order + max(fz_degree, Mz_degree) - 1
        self.sumcheck_H: List[BatchSumcheck] = []
        self.lincheck_oracles: List[HolographicLincheckVirtualOracle] = []
        self.t_boundary: List[SingleBoundaryConstraint] = []
        for _ in range(params.num_repetitions):
            sc = BatchSumcheck(iop, summation_handle, codeword_handle,
                               self.lincheck_degree, params.make_zk, rng=rng)
            if params.make_zk:
                sc.register_masking_polynomial()
            self.sumcheck_H.append(sc)
            self.lincheck_oracles.append(HolographicLincheckVirtualOracle(
                self.F, self.L, self.H, self.num_matrices))
            self.t_boundary.append(SingleBoundaryConstraint(self.F, self.L))

    def set_index_oracles(self, index_handle, indexed_handles):
        """indexed_handles: per matrix, [row, col, val, row*col]."""
        assert len(indexed_handles) == self.num_matrices
        self.index_handle = index_handle
        self.K = self.iop.get_domain(index_handle)
        k = self.K.order
        single_num_deg = k
        single_den_deg = k
        self.combined_num_degree = single_num_deg + \
            (self.num_matrices - 1) * single_den_deg - (self.num_matrices - 1)
        self.combined_den_degree = \
            self.num_matrices * single_den_deg - (self.num_matrices - 1)
        reps = self.params.num_repetitions
        self.matrix_denominators = []
        self.matrix_numerator_handles = []
        self.matrix_denominator_handles = []
        self.sumcheck_K: List[RationalSumcheck] = []
        self.indexed_handles = indexed_handles
        for rep in range(reps):
            dens, num_hs, den_hs = [], [], []
            for i in range(self.num_matrices):
                row_h, col_h, val_h, rc_h = indexed_handles[i]
                den_oracle = SingleMatrixDenominator(self.F)
                den_h = self.iop.register_virtual_oracle(
                    self.codeword_handle, single_den_deg,
                    [row_h, col_h, rc_h], den_oracle)
                dens.append(den_oracle)
                num_hs.append(val_h)
                den_hs.append(den_h)
            self.matrix_denominators.append(dens)
            self.matrix_numerator_handles.append(num_hs)
            self.matrix_denominator_handles.append(den_hs)
            self.sumcheck_K.append(RationalSumcheck(
                self.iop, self.index_handle, self.codeword_handle,
                self.combined_num_degree, self.combined_den_degree))

    # -- registration ------------------------------------------------------
    def register_challenge_alpha(self):
        reps = self.params.num_repetitions
        self.alpha_handles = [self.iop.register_verifier_random_message(1)
                              for _ in range(reps)]
        self.r_handles = [self.iop.register_verifier_random_message(self.num_matrices)
                          for _ in range(reps)]

    def register_response_alpha(self):
        reps = self.params.num_repetitions
        self.t_handles = []
        self.lincheck_handles = []
        for rep in range(reps):
            t_h = self.iop.register_oracle(self.codeword_handle, self.H.order,
                                           make_zk=False)
            self.t_handles.append(t_h)
            lh = self.iop.register_virtual_oracle(
                self.codeword_handle, self.lincheck_degree,
                self.constituents + [t_h], self.lincheck_oracles[rep])
            self.lincheck_handles.append(lh)
            self.sumcheck_H[rep].attach_oracle_for_summing(lh, 0)

    def register_challenge_beta(self):
        reps = self.params.num_repetitions
        self.beta_handles = [self.iop.register_verifier_random_message(1)
                             for _ in range(reps)]
        for rep in range(reps):
            self.sumcheck_H[rep].register_challenge()

    def register_response_beta(self):
        reps = self.params.num_repetitions
        self.M_at_alpha_beta = [self.iop.register_prover_message(1)
                                for _ in range(reps)]
        self.rational_lc: List[RationalLinearCombination] = []
        self.t_boundary_handles = []
        for rep in range(reps):
            rlc = RationalLinearCombination(
                self.iop, self.num_matrices,
                self.matrix_numerator_handles[rep],
                self.matrix_denominator_handles[rep],
                self.codeword_handle,
                self.combined_num_degree, self.combined_den_degree)
            self.rational_lc.append(rlc)
            self.sumcheck_K[rep].register_summation_oracle(
                rlc.numerator_handle, rlc.denominator_handle)
            tb_h = self.iop.register_virtual_oracle(
                self.codeword_handle, self.H.order - 1,
                [self.t_handles[rep]], self.t_boundary[rep])
            self.t_boundary_handles.append(tb_h)
            self.sumcheck_H[rep].register_proof()
            self.sumcheck_K[rep].register_proof()

    # -- proving -----------------------------------------------------------
    def submit_sumcheck_masking_polynomials(self):
        if self.params.make_zk:
            for sc in self.sumcheck_H:
                sc.submit_masking_polynomial()

    def _challenges(self, rep):
        alpha = self.iop.obtain_verifier_random_message(self.alpha_handles[rep])[0]
        r_Mz = self.iop.obtain_verifier_random_message(self.r_handles[rep])
        return alpha, r_Mz

    def calculate_response_alpha(self):
        F = self.F
        for rep in range(self.params.num_repetitions):
            alpha, r_Mz = self._challenges(rep)
            p_alpha_over_H = lagrange_poly_evals_over_any(self.H, alpha, self.H)
            p_alpha_M_over_H = compute_p_alpha_M_evals(
                F, self.input_variable_dim, self.H, p_alpha_over_H, r_Mz,
                self.matrices)
            coeffs = ifft_any(p_alpha_M_over_H, self.H)
            self.iop.submit_oracle(self.t_handles[rep], fft_any(coeffs, self.L))
            self.lincheck_oracles[rep].set_challenge(alpha, r_Mz)

    def _set_beta_state(self, rep):
        F = self.F
        alpha, r_Mz = self._challenges(rep)
        beta = self.iop.obtain_verifier_random_message(self.beta_handles[rep])[0]
        z_a = vanishing_eval_int(self.H, alpha)
        z_b = vanishing_eval_int(self.H, beta)
        shift = F.mul_ints(z_a, z_b)
        coeffs = [F.mul_ints(shift, F.sample_int(int(r))) for r in r_Mz]
        self.rational_lc[rep].set_coefficients(coeffs)
        for i in range(self.num_matrices):
            self.matrix_denominators[rep][i].set_challenge(beta, alpha)
        return alpha, beta, coeffs

    def calculate_response_beta(self):
        F = self.F
        for rep in range(self.params.num_repetitions):
            alpha, beta, coeffs = self._set_beta_state(rep)
            # rational function values over K, via the indexed K-vectors
            nums_over_K, dens_over_K = [], []
            for i in range(self.num_matrices):
                row, col, val, rc = self._index_vectors_over_K(i)
                nums_over_K.append(val)
                den = self.matrix_denominators[rep][i]
                dens_over_K.append(den.evaluated_contents([row, col, rc]))
            combined = self.rational_lc[rep].values_over_K(
                F, coeffs, nums_over_K, dens_over_K)
            self.sumcheck_K[rep].calculate_and_submit_proof(combined)
            mab = self.sumcheck_K[rep].get_claimed_sum()
            self.iop.submit_prover_message(self.M_at_alpha_beta[rep], [mab])
            self.t_boundary[rep].set_evaluation_point_and_eval(beta, mab)
            self.sumcheck_H[rep].calculate_and_submit_proof()

    def set_index_vectors_over_K(self, vectors_per_matrix):
        """Prover-side: the (row,col,val,rowcol) device arrays over K, as
        computed by the indexer (list per matrix)."""
        self._index_vectors = vectors_per_matrix

    def _index_vectors_over_K(self, i):
        return self._index_vectors[i]

    # -- verification ------------------------------------------------------
    def construct_verifier_state(self):
        for rep in range(self.params.num_repetitions):
            alpha, r_Mz = self._challenges(rep)
            self.lincheck_oracles[rep].set_challenge(alpha, r_Mz)
            alpha, beta, coeffs = self._set_beta_state(rep)
            mab = self.iop.receive_prover_message(self.M_at_alpha_beta[rep])[0]
            self.t_boundary[rep].set_evaluation_point_and_eval(beta, mab)
            self.sumcheck_H[rep].construct_verifier_state()
            self.sumcheck_K[rep].construct_verifier_state(mab)

    def ldt_oracle_handles(self) -> List[OracleHandle]:
        out = []
        for rep in range(self.params.num_repetitions):
            out.append(self.t_handles[rep])
            out.append(self.t_boundary_handles[rep])
            out.extend(self.sumcheck_H[rep].ldt_oracle_handles())
            out.extend(self.sumcheck_K[rep].ldt_oracle_handles())
        return out
