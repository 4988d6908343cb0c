"""Ligero: interleaved Reed–Solomon R1CS protocol.

Counterpart of libiop/protocols/encoded/ligero/{ligero,interleaved_lincheck_ot,
interleaved_rowcheck}.{hpp,tcc} + libiop/protocols/ligero_iop.{hpp,tcc}:

* the witness z (width-padded) is packed into a matrix of rows of length
  |H| (systematic domain); each row is RS-encoded over the codeword domain as
  one oracle (ligero.hpp:27-37); target vectors a=Az, b=Bz, c=Cz likewise;
* lincheck-OT (interleaved_lincheck_ot.tcc): per interaction the verifier
  sends a random vector r over the padded constraint rows; the prover
  responds with the coefficients of
      p0 = sum_i r_blk_i * f_{target,i} - sum_i s_blk_i * f_{input,i} (+ blind)
  where s = M^T r; the verifier checks (a) sum of p0 over the systematic
  domain is 0 and (b) consistency of p0 with the oracles at q random columns;
* rowcheck (interleaved_rowcheck.tcc): random vector over all rows; response
  p0 = sum_i r_i (f_a_i f_b_i - f_c_i) (+ blind) must VANISH on the
  systematic domain and agree with oracle values at the queried columns;
* zk via blinding rows summing to zero / vanishing on the systematic domain
  (ligero.tcc:335-385), encoding independence 3;
* parameterization (ligero_iop.tcc:20-215): systematic domain ~
  sqrt(vars/height_width_ratio), interactive reps = ceil(sec/log|F|), query
  reps from the proximity analysis with the zk query-bound fixed point.

TPU realization: all row encodes are a single batched IFFT/FFT over a
(L, rows, |H|) tensor; M^T r is the transpose sparse matvec; responses are
one batched IFFT over the codeword domain.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset
from ..algebra.generic import (element_outside_of_subset, fft_any,
                               ifft_any, make_domain)
from ..iop.runtime import IOPProtocol, OracleHandle
from ..relations.r1cs import R1CS
from ..relations.sparse import SparseMatrix
from .common import lazy_linear_combination
from .fri import log2_field_size
from .direct_ldt import DirectLDTParams, DirectLDT
from .ldt_reducer import (LDTInstanceReducer, LDTReducerParams,
                          LDTReducerSoundnessType)


_HORNER_JITS = {}


def _responses_at_positions(F, resp_dev, L, positions: List[int]) -> List[int]:
    """response(x_j) for every queried column in ONE device Horner dispatch
    + ONE d2h (the per-position host-int Horner cost |response| modmuls per
    query; the per-position device call cost one tunnel round-trip each).
    Positions pad to the next power of two so repeated proofs share one
    compiled shape."""
    import jax
    from ..algebra.poly import horner_eval
    n = len(positions)
    m = 1 << max(0, (n - 1).bit_length())
    xs = F.from_ints([L.element_by_index_int(int(j)) for j in positions]
                     + [0] * (m - n))
    key = (F.name, resp_dev.shape, m)
    fn = _HORNER_JITS.get(key)
    if fn is None:
        fn = _HORNER_JITS[key] = jax.jit(
            lambda c, xx: horner_eval(F, c, xx))
    return [int(v) for v in F.to_ints(fn(resp_dev, xs))[:n]]


@dataclasses.dataclass
class EncodedLigeroParams:
    make_zk: bool
    matrix_width: int
    matrix_height: int
    num_oracles_input: int
    num_oracles_vectors: int
    num_interactions: int = 1
    num_queries: int = 1
    encoding_independence: int = 3


def _encode_rows(F, rows_mat, systematic_domain, codeword_domain):
    """(L, R, |H|) systematic values -> (L, R, |L|) codewords (batched)."""
    coeffs = ifft_any(rows_mat, systematic_domain)
    return fft_any(coeffs, codeword_domain)


def _row_sum(F, term):
    """Sum a (L, R, N) tensor over the row axis, field-generically: XOR fold
    for char 2, lazy limb accumulation + one wide Montgomery reduction
    otherwise."""
    if F.kind == "additive":
        acc = term[:, 0, :]
        for i in range(1, term.shape[1]):
            acc = acc ^ term[:, i, :]
        return acc
    return F.lazy_sum_reduce(jnp.moveaxis(
        jnp.sum(jnp.moveaxis(term, 0, -1), axis=0), -1, 0))


class InterleavedLincheckOT:
    def __init__(self, iop, codeword_h, systematic_h, extended_h,
                 num_oracles_input: int, num_oracles_target: int,
                 num_queries: int, num_interactions: int, make_zk: bool,
                 matrix: SparseMatrix):
        self.iop = iop
        self.F = iop.F
        self.codeword_h = codeword_h
        self.L = iop.get_domain(codeword_h)
        self.H = iop.get_domain(systematic_h)
        self.extended = iop.get_domain(extended_h)
        self.num_oracles_input = num_oracles_input
        self.num_oracles_target = num_oracles_target
        self.num_queries = num_queries
        self.num_interactions = num_interactions
        self.make_zk = make_zk
        self.matrix = matrix  # height x width
        self.response_size = 2 * self.H.order
        self.input_handles: List[OracleHandle] = []
        self.target_handles: List[OracleHandle] = []
        self.blinding_handles: List[OracleHandle] = []

    def attach_input_vector_row_oracles(self, handles):
        self.input_handles = list(handles)

    def attach_target_vector_row_oracles(self, handles):
        self.target_handles = list(handles)

    def attach_blinding_vector_row_oracles(self, handles):
        self.blinding_handles = list(handles)

    def register_linear_combinations(self):
        self.rlc_handles = [
            self.iop.register_verifier_random_message(self.matrix.num_rows)
            for _ in range(self.num_interactions)]

    def register_responses(self):
        self.response_handles = [
            self.iop.register_prover_message(self.response_size)
            for _ in range(self.num_interactions)]

    def register_queries_for_given_positions(self, position_handles):
        self.position_handles = list(position_handles)
        self.input_queries = [
            [self.iop.register_query(h, pos) for h in self.input_handles]
            for pos in self.position_handles]
        self.target_queries = [
            [self.iop.register_query(h, pos) for h in self.target_handles]
            for pos in self.position_handles]
        if self.make_zk:
            self.blinding_queries = [
                [self.iop.register_query(h, pos) for h in self.blinding_handles]
                for pos in self.position_handles]

    def all_random_linear_combinations(self):
        return [self.iop.obtain_verifier_random_message(h)
                for h in self.rlc_handles]

    # -- shared prover/verifier math --------------------------------------
    def _blocks(self, vec_ints, num_blocks):
        """Host ints -> (L, num_blocks, |H|) Montgomery systematic values."""
        F = self.F
        h = self.H.order
        vals = list(vec_ints) + [0] * (num_blocks * h - len(vec_ints))
        return F.from_ints(np.array(vals, dtype=object).reshape(num_blocks, h))

    def _r_and_s_blocks(self, r: List[int]):
        """r split into target blocks; s = M^T r split into input blocks."""
        F = self.F
        r_dev = F.from_ints(r)
        s_dev = self.matrix.matvec_transpose(r_dev)  # (L, width)
        r_blocks = r_dev.reshape(F.L, self.num_oracles_target, self.H.order)
        s_blocks = s_dev.reshape(F.L, self.num_oracles_input, self.H.order)
        return r_blocks, s_blocks

    def calculate_and_submit_responses(self, supplementary_input: List[int],
                                       rlcs: List[List[int]]):
        F = self.F
        supp_in = _encode_rows(
            F, self._blocks(supplementary_input, self.num_oracles_input),
            self.H, self.L)
        target_evals = jnp.stack(
            [self.iop.get_oracle_evaluations(h) for h in self.target_handles],
            axis=1)
        input_evals = jnp.stack(
            [self.iop.get_oracle_evaluations(h) for h in self.input_handles],
            axis=1)
        input_evals = F.add(input_evals, supp_in)
        for h_idx in range(self.num_interactions):
            r = rlcs[h_idx]
            r_blocks, s_blocks = self._r_and_s_blocks(r)
            r_cw = _encode_rows(F, r_blocks, self.H, self.L)
            s_cw = _encode_rows(F, s_blocks, self.H, self.L)
            pos_term = F.mul(r_cw, target_evals)
            neg_term = F.mul(s_cw, input_evals)
            resp = F.sub(_row_sum(F, pos_term), _row_sum(F, neg_term))
            if self.make_zk:
                resp = F.add(resp, self.iop.get_oracle_evaluations(
                    self.blinding_handles[h_idx]))
            coeffs = ifft_any(resp, self.L)
            ints = [int(v) for v in F.to_ints(coeffs[:, :self.response_size])]
            self.iop.submit_prover_message(self.response_handles[h_idx], ints)

    def verifier_predicate(self, supplementary_input: List[int],
                           rlcs: List[List[int]]) -> bool:
        F = self.F
        h_ord = self.H.order
        supp_in = _encode_rows(
            F, self._blocks(supplementary_input, self.num_oracles_input),
            self.H, self.L)
        # batch EVERY queried column into one gather + one d2h per array —
        # the per-(interaction, position) column fetch cost one tunnel
        # round-trip each (~50-200 ms x |Q| x interactions dominated the
        # 19-34 s round-4 Ligero verifier)
        positions = [self.iop.obtain_query_position(ph)
                     for ph in self.position_handles]
        pos_arr = jnp.asarray(np.asarray(positions, np.int64))
        supp_cols = F.to_ints(jnp.take(supp_in, pos_arr, axis=2))
        for h_idx in range(self.num_interactions):
            response = self.iop.receive_prover_message(self.response_handles[h_idx])
            # equality: sum of response over the systematic domain == 0
            resp_dev = F.from_ints(response)
            ext_evals = fft_any(resp_dev, self.extended)
            idx = [self.extended.reindex_by_subgroup(self.H.dim, d)
                   for d in range(h_ord)]
            vals = F.to_ints(jnp.take(ext_evals, jnp.asarray(idx), axis=1))
            total = 0
            for v in vals:
                total = F.add_ints(total, int(v))
            if total != 0:
                return False
            # consistency at each queried column
            r = rlcs[h_idx]
            r_blocks, s_blocks = self._r_and_s_blocks(r)
            r_cw = _encode_rows(F, r_blocks, self.H, self.L)
            s_cw = _encode_rows(F, s_blocks, self.H, self.L)
            r_cols = F.to_ints(jnp.take(r_cw, pos_arr, axis=2))
            s_cols = F.to_ints(jnp.take(s_cw, pos_arr, axis=2))
            resp_at = _responses_at_positions(F, resp_dev, self.L, positions)
            for k, j in enumerate(positions):
                lhs = 0
                for i in range(self.num_oracles_target):
                    tv = self.iop.obtain_query_response(self.target_queries[k][i])
                    lhs = F.add_ints(lhs, F.mul_ints(int(r_cols[i, k]), tv))
                for i in range(self.num_oracles_input):
                    iv = F.add_ints(self.iop.obtain_query_response(
                        self.input_queries[k][i]), int(supp_cols[i, k]))
                    lhs = F.sub_ints(lhs, F.mul_ints(int(s_cols[i, k]), iv))
                if self.make_zk:
                    lhs = F.add_ints(lhs, self.iop.obtain_query_response(
                        self.blinding_queries[k][h_idx]))
                if lhs != resp_at[k]:
                    return False
        return True


class InterleavedLincheckET:
    """Interleaved lincheck with an EXPLICIT public target vector b: tests
    that the message encoded by the interleaved RS code satisfies M·x = b
    (Test-Linear-Constraints, [ACIV17] §4.2).  Counterpart of
    interleaved_lincheck_et.{hpp,tcc} — tested but unused in the reference's
    main Ligero path (which routes targets through oracles via the OT
    variant); provided for full protocol-inventory parity.

    Per interaction: verifier sends r (one entry per matrix row); prover
    responds with the low part of the coefficients of
    q = sum_i s_i · U_i (+ blinding), s = M^T r split into row blocks
    (interleaved_lincheck_et.tcc:137-206).  Verifier checks
    (1) sum_{d in H} q(zeta_d) == r^T b  and (2) consistency of q against
    the row oracles at each queried column (tcc:209-341)."""

    def __init__(self, iop, codeword_h, systematic_h, extended_h,
                 num_oracles: int, num_queries: int, num_interactions: int,
                 make_zk: bool, matrix: SparseMatrix,
                 target_vector: List[int]):
        self.iop = iop
        self.F = iop.F
        self.codeword_h = codeword_h
        self.L = iop.get_domain(codeword_h)
        self.H = iop.get_domain(systematic_h)
        self.extended = iop.get_domain(extended_h)
        self.num_oracles = num_oracles
        self.num_queries = num_queries
        self.num_interactions = num_interactions
        self.make_zk = make_zk
        self.matrix = matrix
        self.target_vector = list(target_vector)
        assert len(self.target_vector) == matrix.num_rows
        self.response_size = 2 * self.H.order
        self.input_handles: List[OracleHandle] = []
        self.blinding_handles: List[OracleHandle] = []

    def attach_input_vector_row_oracles(self, handles):
        assert len(handles) == self.num_oracles
        self.input_handles = list(handles)

    def attach_blinding_vector_row_oracles(self, handles):
        assert len(handles) == self.num_interactions
        self.blinding_handles = list(handles)

    def register_linear_combinations(self):
        self.rlc_handles = [
            self.iop.register_verifier_random_message(self.matrix.num_rows)
            for _ in range(self.num_interactions)]

    def register_responses(self):
        self.response_handles = [
            self.iop.register_prover_message(self.response_size)
            for _ in range(self.num_interactions)]

    def register_queries(self):
        self.register_queries_for_given_positions([
            self.iop.register_random_query_position(self.codeword_h)
            for _ in range(self.num_queries)])

    def register_queries_for_given_positions(self, position_handles):
        self.position_handles = list(position_handles)
        self.input_queries = [
            [self.iop.register_query(h, pos) for h in self.input_handles]
            for pos in self.position_handles]
        if self.make_zk:
            self.blinding_queries = [
                [self.iop.register_query(h, pos) for h in self.blinding_handles]
                for pos in self.position_handles]

    def _s_blocks(self, r: List[int]):
        """s = M^T r split into (L, num_oracles, |H|) row blocks."""
        F = self.F
        s_dev = self.matrix.matvec_transpose(F.from_ints(r))
        return s_dev.reshape(F.L, self.num_oracles, self.H.order)

    def calculate_and_submit_responses(self):
        F = self.F
        input_evals = jnp.stack(
            [self.iop.get_oracle_evaluations(h) for h in self.input_handles],
            axis=1)
        for h_idx in range(self.num_interactions):
            r = self.iop.obtain_verifier_random_message(
                self.rlc_handles[h_idx])
            s_cw = _encode_rows(F, self._s_blocks(r), self.H, self.L)
            resp = _row_sum(F, F.mul(s_cw, input_evals))
            if self.make_zk:
                resp = F.add(resp, self.iop.get_oracle_evaluations(
                    self.blinding_handles[h_idx]))
            coeffs = ifft_any(resp, self.L)
            ints = [int(v) for v in F.to_ints(coeffs[:, :self.response_size])]
            self.iop.submit_prover_message(self.response_handles[h_idx], ints)

    def verifier_predicate(self) -> bool:
        F = self.F
        h_ord = self.H.order
        for h_idx in range(self.num_interactions):
            r = self.iop.obtain_verifier_random_message(
                self.rlc_handles[h_idx])
            response = self.iop.receive_prover_message(
                self.response_handles[h_idx])
            # equality test: sum of q over the systematic domain == r^T b
            resp_dev = F.from_ints(response)
            ext_evals = fft_any(resp_dev, self.extended)
            idx = [self.extended.reindex_by_subgroup(self.H.dim, d)
                   for d in range(h_ord)]
            vals = F.to_ints(jnp.take(ext_evals, jnp.asarray(idx), axis=1))
            lhs = 0
            for v in vals:
                lhs = F.add_ints(lhs, int(v))
            rhs = 0
            for rj, bj in zip(r, self.target_vector):
                rhs = F.add_ints(rhs, F.mul_ints(rj, bj))
            if lhs != rhs:
                return False
            # consistency test at each queried column (batched gather — see
            # the OT predicate note)
            s_cw = _encode_rows(F, self._s_blocks(r), self.H, self.L)
            positions = [self.iop.obtain_query_position(ph)
                         for ph in self.position_handles]
            pos_arr = jnp.asarray(np.asarray(positions, np.int64))
            s_cols = F.to_ints(jnp.take(s_cw, pos_arr, axis=2))
            resp_at = _responses_at_positions(F, resp_dev, self.L, positions)
            for k, j in enumerate(positions):
                acc = 0
                for i in range(self.num_oracles):
                    uv = self.iop.obtain_query_response(
                        self.input_queries[k][i])
                    acc = F.add_ints(acc, F.mul_ints(int(s_cols[i, k]), uv))
                if self.make_zk:
                    acc = F.add_ints(acc, self.iop.obtain_query_response(
                        self.blinding_queries[k][h_idx]))
                if acc != resp_at[k]:
                    return False
        return True


class InterleavedRowcheck:
    def __init__(self, iop, codeword_h, systematic_h, extended_h,
                 num_oracles: int, num_queries: int, num_interactions: int,
                 make_zk: bool):
        self.iop = iop
        self.F = iop.F
        self.L = iop.get_domain(codeword_h)
        self.H = iop.get_domain(systematic_h)
        self.extended = iop.get_domain(extended_h)
        self.num_oracles = num_oracles
        self.num_queries = num_queries
        self.num_interactions = num_interactions
        self.make_zk = make_zk
        self.response_size = 2 * self.H.order
        self.blinding_handles: List[OracleHandle] = []

    def attach_vector_row_oracles(self, xs, ys, zs):
        self.x_handles, self.y_handles, self.z_handles = list(xs), list(ys), list(zs)

    def attach_blinding_vector_row_oracles(self, handles):
        self.blinding_handles = list(handles)

    def register_linear_combinations(self):
        self.rlc_handles = [
            self.iop.register_verifier_random_message(self.num_oracles)
            for _ in range(self.num_interactions)]

    def register_responses(self):
        self.response_handles = [
            self.iop.register_prover_message(self.response_size)
            for _ in range(self.num_interactions)]

    def register_queries_for_given_positions(self, position_handles):
        self.position_handles = list(position_handles)
        self.x_queries = [[self.iop.register_query(h, pos) for h in self.x_handles]
                          for pos in self.position_handles]
        self.y_queries = [[self.iop.register_query(h, pos) for h in self.y_handles]
                          for pos in self.position_handles]
        self.z_queries = [[self.iop.register_query(h, pos) for h in self.z_handles]
                          for pos in self.position_handles]
        if self.make_zk:
            self.blinding_queries = [
                [self.iop.register_query(h, pos) for h in self.blinding_handles]
                for pos in self.position_handles]

    def calculate_and_submit_responses(self):
        F = self.F
        xs = jnp.stack([self.iop.get_oracle_evaluations(h) for h in self.x_handles], axis=1)
        ys = jnp.stack([self.iop.get_oracle_evaluations(h) for h in self.y_handles], axis=1)
        zs = jnp.stack([self.iop.get_oracle_evaluations(h) for h in self.z_handles], axis=1)
        vals = F.sub(F.mul(xs, ys), zs)  # (L, R, N)
        for h_idx in range(self.num_interactions):
            r = self.iop.obtain_verifier_random_message(self.rlc_handles[h_idx])
            resp = lazy_linear_combination(
                F, r, [vals[:, i, :] for i in range(self.num_oracles)])
            if self.make_zk:
                resp = F.add(resp, self.iop.get_oracle_evaluations(
                    self.blinding_handles[h_idx]))
            coeffs = ifft_any(resp, self.L)
            ints = [int(v) for v in F.to_ints(coeffs[:, :self.response_size])]
            self.iop.submit_prover_message(self.response_handles[h_idx], ints)

    def verifier_predicate(self) -> bool:
        F = self.F
        for h_idx in range(self.num_interactions):
            response = self.iop.receive_prover_message(self.response_handles[h_idx])
            resp_dev = F.from_ints(response)
            ext_evals = fft_any(resp_dev, self.extended)
            idx = [self.extended.reindex_by_subgroup(self.H.dim, d)
                   for d in range(self.H.order)]
            vals = F.to_ints(jnp.take(ext_evals, jnp.asarray(idx), axis=1))
            if any(int(v) != 0 for v in vals):
                return False
            r = self.iop.obtain_verifier_random_message(self.rlc_handles[h_idx])
            positions = [self.iop.obtain_query_position(ph)
                         for ph in self.position_handles]
            resp_at = _responses_at_positions(F, resp_dev, self.L, positions)
            for k, j in enumerate(positions):
                lhs = 0
                for i in range(self.num_oracles):
                    xv = self.iop.obtain_query_response(self.x_queries[k][i])
                    yv = self.iop.obtain_query_response(self.y_queries[k][i])
                    zv = self.iop.obtain_query_response(self.z_queries[k][i])
                    lhs = F.add_ints(lhs, F.mul_ints(
                        F.sample_int(int(r[i])),
                        F.sub_ints(F.mul_ints(xv, yv), zv)))
                if self.make_zk:
                    lhs = F.add_ints(lhs, self.iop.obtain_query_response(
                        self.blinding_queries[k][h_idx]))
                if lhs != resp_at[k]:
                    return False
        return True


class InterleavedR1CS:
    """Glue: witness packing, oracle registration, sub-protocol wiring
    (ligero.tcc role)."""

    def __init__(self, iop: IOPProtocol, codeword_h, systematic_h, extended_h,
                 r1cs: R1CS, params: EncodedLigeroParams,
                 rng: Optional[np.random.Generator] = None):
        self.iop = iop
        self.F = iop.F
        self.r1cs = r1cs
        self.params = params
        self.rng = rng or np.random.default_rng()
        self.codeword_h = codeword_h
        self.L = iop.get_domain(codeword_h)
        self.H = iop.get_domain(systematic_h)
        self.extended = iop.get_domain(extended_h)
        F = self.F
        pr = params
        # padded matrices (height x width) over z indices
        self.padded = []
        for M in r1cs.matrices():
            self.padded.append(SparseMatrix(
                F, pr.matrix_height, pr.matrix_width, M.rows, M.cols, M.vals))
        self.linchecks = [InterleavedLincheckOT(
            iop, codeword_h, systematic_h, extended_h, pr.num_oracles_input,
            pr.num_oracles_vectors, pr.num_queries, pr.num_interactions,
            pr.make_zk, Mp) for Mp in self.padded]
        self.rowcheck = InterleavedRowcheck(
            iop, codeword_h, systematic_h, extended_h, pr.num_oracles_vectors,
            pr.num_queries, pr.num_interactions, pr.make_zk)
        degree = self.H.order
        self.w_handles = [iop.register_oracle(codeword_h, degree, pr.make_zk)
                          for _ in range(pr.num_oracles_input)]
        self.a_handles, self.b_handles, self.c_handles = [], [], []
        for _ in range(pr.num_oracles_vectors):
            self.a_handles.append(iop.register_oracle(codeword_h, degree, pr.make_zk))
            self.b_handles.append(iop.register_oracle(codeword_h, degree, pr.make_zk))
            self.c_handles.append(iop.register_oracle(codeword_h, degree, pr.make_zk))
        self.blinding = {}
        if pr.make_zk:
            for key in ["A", "B", "C", "row"]:
                self.blinding[key] = [
                    iop.register_oracle(codeword_h, degree, True)
                    for _ in range(pr.num_interactions)]
        # wire up
        for lc, key, tgt in zip(self.linchecks, ["A", "B", "C"],
                                [self.a_handles, self.b_handles, self.c_handles]):
            lc.attach_input_vector_row_oracles(self.w_handles)
            lc.attach_target_vector_row_oracles(tgt)
            if pr.make_zk:
                lc.attach_blinding_vector_row_oracles(self.blinding[key])
        self.rowcheck.attach_vector_row_oracles(
            self.a_handles, self.b_handles, self.c_handles)
        if pr.make_zk:
            self.rowcheck.attach_blinding_vector_row_oracles(self.blinding["row"])

    def concatenated_vector_handles(self):
        return (self.w_handles + self.a_handles + self.b_handles + self.c_handles)

    def register_linear_combinations(self):
        self.linchecks[0].register_linear_combinations()  # shared by B and C
        self.rowcheck.register_linear_combinations()

    def register_responses(self):
        for lc in self.linchecks:
            lc.register_responses()
        self.rowcheck.register_responses()

    def register_queries(self):
        positions = [self.iop.register_random_query_position(self.codeword_h)
                     for _ in range(self.params.num_queries)]
        for lc in self.linchecks:
            lc.register_queries_for_given_positions(positions)
        self.rowcheck.register_queries_for_given_positions(positions)

    # -- proving -----------------------------------------------------------
    def _supplementary_input(self, primary: List[int]) -> List[int]:
        width = self.params.matrix_width
        supp = [1] + [self.F.sample_int(int(v)) for v in primary]
        return supp + [0] * (width - len(supp))

    def submit_witness_oracles(self, primary: List[int], auxiliary: List[int]):
        F = self.F
        pr = self.params
        h_ord = self.H.order
        z = [1] + [F.sample_int(int(v)) for v in primary] \
            + [F.sample_int(int(v)) for v in auxiliary]
        z += [0] * (pr.matrix_width - len(z))
        # w oracles carry the auxiliary-only witness (public prefix zeroed)
        aux_only = [0] * (1 + len(primary)) + [F.sample_int(int(v)) for v in auxiliary]
        aux_only += [0] * (pr.matrix_width - len(aux_only))
        w_mat = F.from_ints(np.array(aux_only, dtype=object).reshape(
            pr.num_oracles_input, h_ord))
        w_cw = _encode_rows(F, w_mat, self.H, self.L)
        for i, h in enumerate(self.w_handles):
            self.iop.submit_oracle(h, w_cw[:, i, :])
        z_dev = F.from_ints(z)
        for M, handles in zip(self.padded,
                              [self.a_handles, self.b_handles, self.c_handles]):
            v = M.matvec(z_dev)  # (L, height)
            mat = v.reshape(F.L, pr.num_oracles_vectors, h_ord)
            cw = _encode_rows(F, mat, self.H, self.L)
            for i, h in enumerate(handles):
                self.iop.submit_oracle(h, cw[:, i, :])
        if pr.make_zk:
            self._submit_blinding_oracles()

    def _submit_blinding_oracles(self):
        F = self.F
        h_ord = self.H.order
        for key in ["A", "B", "C"]:
            for h in self.blinding[key]:
                # random row summing to zero over the systematic domain
                # (uniform full-field draws — low-entropy masks would leak)
                vals = F.random_ints(h_ord - 1, self.rng)
                acc = 0
                for v in vals:
                    acc = F.add_ints(acc, v)
                vals.append(F.neg_int(acc))
                row = F.from_ints(np.array(vals, dtype=object).reshape(1, h_ord))
                cw = _encode_rows(F, row, self.H, self.L)
                self.iop.submit_oracle(h, cw[:, 0, :])
        for h in self.blinding["row"]:
            # vanishes on the systematic domain: random at the first
            # encoding_independence extra slots of the extended domain
            ext = self.extended
            vals = [0] * ext.order
            draws = F.random_ints(self.params.encoding_independence, self.rng)
            for off, i in enumerate(
                    range(h_ord, h_ord + self.params.encoding_independence)):
                idx = ext.reindex_by_subgroup(self.H.dim, i)
                vals[idx] = draws[off]
            row = F.from_ints(np.array(vals, dtype=object).reshape(1, ext.order))
            coeffs = ifft_any(row, ext)
            cw = fft_any(coeffs, self.L)
            self.iop.submit_oracle(h, cw[:, 0, :])

    def calculate_and_submit_proof(self, primary: List[int]):
        supp = self._supplementary_input(primary)
        rlcs = self.linchecks[0].all_random_linear_combinations()
        for lc in self.linchecks:
            lc.calculate_and_submit_responses(supp, rlcs)
        self.rowcheck.calculate_and_submit_responses()

    def verifier_predicate(self, primary: List[int]) -> bool:
        supp = self._supplementary_input(primary)
        rlcs = self.linchecks[0].all_random_linear_combinations()
        for lc in self.linchecks:
            if not lc.verifier_predicate(supp, rlcs):
                return False
        return self.rowcheck.verifier_predicate()


class LigeroIOPParams:
    """ligero_iop.tcc:20-215 parameterization."""

    def __init__(self, F, security_parameter: int,
                 RS_extra_dimensions: int, height_width_ratio: float,
                 make_zk: bool, num_constraints: int, num_variables: int,
                 soundness_type: str = LDTReducerSoundnessType.optimistic_heuristic):
        self.F = F
        self.security_parameter = security_parameter
        self.RS_extra_dimensions = RS_extra_dimensions
        self.make_zk = make_zk
        num_vars = num_variables + 1
        sys_size = 1 << max(1, math.ceil(
            math.sqrt(num_vars / height_width_ratio)) - 1).bit_length()
        self.systematic_domain_dim = sys_size.bit_length() - 1
        self.codeword_domain_dim = self.systematic_domain_dim + RS_extra_dimensions
        self.num_constraints = num_constraints
        self.num_variables = num_variables
        self._set_soundness(soundness_type)

    def _set_soundness(self, soundness_type):
        F = self.F
        interactive_bits = self.security_parameter + 2
        query_bits = self.security_parameter + 2
        sys_size = 1 << self.systematic_domain_dim
        max_tested = sys_size
        self.ldt_reducer_params = LDTReducerParams(
            F, interactive_bits, soundness_type, self.codeword_domain_dim,
            max_tested, max_tested, self.make_zk)
        # matrix shape
        num_vars = self.num_variables + 1
        self.num_oracles_input = -(-num_vars // sys_size)
        matrix_width = sys_size * self.num_oracles_input
        matrix_height = self.num_constraints
        if matrix_height % sys_size:
            matrix_height += sys_size - matrix_height % sys_size
        self.num_oracles_vectors = matrix_height // sys_size
        # interactive repetitions: ceil(sec / log|F|)
        reps = max(1, math.ceil(interactive_bits / log2_field_size(F)))
        N = 1 << self.codeword_domain_dim

        def prox(query_bound):
            min_abs = (N - 2 * sys_size - 2 * query_bound + 1) // 4 - 1
            return min(self.ldt_reducer_params.absolute_proximity_parameter, min_abs)

        if not self.make_zk:
            self.query_bound = 0
            abs_prox = prox(0)
            if abs_prox < 1:
                self.RS_extra_dimensions += 1
                self.codeword_domain_dim += 1
                self._set_soundness(soundness_type)
                return
            self.direct_ldt_params = DirectLDTParams(
                query_bits, max_tested, self.RS_extra_dimensions, abs_prox)
            q_err = (2 * sys_size - 2) / N
            per_query = math.log2(q_err + abs_prox / N)
            nq = max(1, math.ceil(-query_bits / per_query))
        else:
            estimated, last = 1, 0
            while estimated != last:
                qb = estimated + 1
                q_num = 2 * sys_size + 2 * qb - 2
                abs_prox = prox(qb)
                if q_num + 1 > N or abs_prox < 1:
                    self.RS_extra_dimensions += 1
                    self.codeword_domain_dim += 1
                    self._set_soundness(soundness_type)
                    return
                self.direct_ldt_params = DirectLDTParams(
                    query_bits, max_tested, self.RS_extra_dimensions, abs_prox)
                per_query = math.log2(q_num / N + abs_prox / N)
                nq_enc = max(1, math.ceil(-query_bits / per_query))
                estimated = last
                last = nq_enc + self.direct_ldt_params.num_queries
            nq = max(1, estimated - self.direct_ldt_params.num_queries)
            self.query_bound = estimated + 1
        self.encoded_params = EncodedLigeroParams(
            make_zk=self.make_zk, matrix_width=matrix_width,
            matrix_height=matrix_height,
            num_oracles_input=self.num_oracles_input,
            num_oracles_vectors=self.num_oracles_vectors,
            num_interactions=reps, num_queries=nq)


class LigeroIOP:
    """ligero_iop.tcc composition: interleaved R1CS + LDT reducer(direct LDT)."""

    def __init__(self, iop: IOPProtocol, r1cs: R1CS, params: LigeroIOPParams,
                 rng: Optional[np.random.Generator] = None):
        self.iop = iop
        self.F = iop.F
        self.params = params
        F = self.F
        systematic = make_domain(F, params.systematic_domain_dim)
        extended = make_domain(F, params.systematic_domain_dim + 1)
        codeword = make_domain(
            F, params.codeword_domain_dim,
            shift=element_outside_of_subset(F, params.codeword_domain_dim))
        sh = iop.register_domain(systematic)
        eh = iop.register_domain(extended)
        self.codeword_h = iop.register_domain(codeword)
        self.protocol = InterleavedR1CS(iop, self.codeword_h, sh, eh, r1cs,
                                        params.encoded_params, rng=rng)
        self.ldt_reducer = LDTInstanceReducer(
            iop, self.codeword_h, params.ldt_reducer_params, rng=rng)

    def register_interactions(self):
        self.protocol.register_linear_combinations()
        self.protocol.register_responses()
        handles = self.protocol.concatenated_vector_handles()
        self.ldt_reducer.set_ldt(lambda iop, cwh, combined: DirectLDT(
            iop, self.params.direct_ldt_params, cwh, combined))
        self.ldt_reducer.register_interactions(handles)

    def register_queries(self):
        self.protocol.register_queries()
        self.ldt_reducer.register_queries()

    def produce_proof(self, primary: List[int], auxiliary: List[int]):
        self.protocol.submit_witness_oracles(primary, auxiliary)
        self.ldt_reducer.submit_masking_polynomial()
        self.iop.signal_prover_round_done()
        self.protocol.calculate_and_submit_proof(primary)
        self.iop.signal_prover_round_done()
        self.ldt_reducer.calculate_and_submit_proof()

    def verifier_predicate(self, primary: List[int]) -> bool:
        if not self.protocol.verifier_predicate(primary):
            return False
        return self.ldt_reducer.verifier_predicate()
