"""Fractal matrix indexer: the holographic preprocessing of A/B/C.

Counterpart of libiop/protocols/encoded/r1cs_rs_iop/fractal_indexer.{hpp,tcc}:
per matrix M, four indexed oracles over the index domain K (|K| >= nnz(M)),
LDE'd to the codeword domain: row, col (elements of the matrix domain H),
val (coefficient normalized by the bivariate-Lagrange derivative u_H(col,col)
= Z'_H(col)), and row*col (so denominators stay degree < |K|).  The transpose
swap (row<->col) matches fractal_indexer.tcc:108 — the protocol works with
M' where M'_ij = M_ji * u_H(j,j).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..algebra.generic import (fft_any, ifft_any,
                               vanishing_derivative_int_at_element)
from ..iop.runtime import IOPProtocol, OracleHandle
from ..relations.sparse import SparseMatrix


class MatrixIndexer:
    def __init__(self, iop: IOPProtocol, index_handle, matrix_handle,
                 codeword_handle, input_variable_dim: int, matrix: SparseMatrix):
        self.iop = iop
        self.F = iop.F
        self.index_handle = index_handle
        self.K = iop.get_domain(index_handle)
        self.H = iop.get_domain(matrix_handle)
        self.L = iop.get_domain(codeword_handle)
        self.codeword_handle = codeword_handle
        self.input_variable_dim = input_variable_dim
        self.matrix = matrix
        assert self.K.order >= max(1, matrix.num_nonzero)

    def register_oracles(self):
        bound = self.K.order
        self.row_handle = self.iop.register_index_oracle(self.codeword_handle, bound)
        self.col_handle = self.iop.register_index_oracle(self.codeword_handle, bound)
        self.val_handle = self.iop.register_index_oracle(self.codeword_handle, bound)
        self.row_times_col_handle = self.iop.register_index_oracle(
            self.codeword_handle, bound)

    def get_all_oracle_handles(self) -> List[OracleHandle]:
        return [self.row_handle, self.col_handle, self.val_handle,
                self.row_times_col_handle]

    def compute_oracles_over_K(self):
        """Host assembly of the four |K|-vectors (canonical ints), mirroring
        fractal_indexer.tcc:53-124 (including the transpose swap)."""
        F = self.F
        H = self.H
        row_evals, col_evals, val_evals, rc_evals = [], [], [], []
        # iterate entries grouped by row (row-major like get_row loops)
        order = np.lexsort((self.matrix.cols, self.matrix.rows))
        for idx in order:
            i = int(self.matrix.rows[idx])
            var = int(self.matrix.cols[idx])
            coeff = self._val_int(idx)
            row_elem = H.element_by_index_int(i)
            col_index = H.reindex_by_subgroup(self.input_variable_dim, var)
            col_elem = H.element_by_index_int(col_index)
            # u_H(col,col) = Z'_H(col): h*col^{h-1} (coset) / eps (subspace)
            deriv = vanishing_derivative_int_at_element(H, col_index)
            val = F.mul_ints(coeff, F.inv_int(deriv))
            row_evals.append(row_elem)
            col_evals.append(col_elem)
            val_evals.append(val)
            rc_evals.append(F.mul_ints(row_elem, col_elem))
        pad_elem = H.element_by_index_int(0)
        pad_rc = F.mul_ints(pad_elem, pad_elem)
        while len(row_evals) < self.K.order:
            row_evals.append(pad_elem)
            col_evals.append(pad_elem)
            val_evals.append(0)
            rc_evals.append(pad_rc)
        # transpose: swap row and col (val already indexed for M')
        row_evals, col_evals = col_evals, row_evals
        return row_evals, col_evals, val_evals, rc_evals

    def _val_int(self, idx: int) -> int:
        if not hasattr(self, "_vals_cache"):
            self._vals_cache = [int(v) for v in self.F.to_ints(self.matrix.vals)]
        return self._vals_cache[idx]

    def compute_oracles(self):
        """LDE each K-vector to the codeword domain and submit
        (fractal_indexer.tcc:126-150)."""
        F = self.F
        vectors = self.compute_oracles_over_K()
        handles = [self.row_handle, self.col_handle, self.val_handle,
                   self.row_times_col_handle]
        for vec, handle in zip(vectors, handles):
            coeffs = ifft_any(F.from_ints(vec), self.K)
            self.iop.submit_oracle(handle, fft_any(coeffs, self.L))
