"""Sparse matrices over either field family, with TPU-native matvec.

Counterpart of libiop/relations/sparse_matrix.{hpp,tcc} (row-wise sparse
views of R1CS A/B/C).  The TPU design bakes the static COO structure into
trace-time gather indices; ``matvec`` is gather -> batched field mul ->
``segment_sum`` with lazy limb accumulation and one wide Montgomery
reduction at the end (see PrimeField.lazy_sum_reduce) — no per-entry carries,
no sequential row loops.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.prime import PrimeField

# segment sums accumulate canonical 16-bit limbs in uint32; cap terms per row
# so columns stay < 2^28 (see PrimeField.mont_reduce_wide)
MAX_ROW_NNZ = 1 << 12


class SparseMatrix:
    """COO sparse matrix; values in Montgomery form on device."""

    def __init__(self, F, num_rows: int, num_cols: int,
                 rows: np.ndarray, cols: np.ndarray, vals):
        self.F = F
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.rows = np.asarray(rows, dtype=np.int32)
        self.cols = np.asarray(cols, dtype=np.int32)
        assert self.rows.shape == self.cols.shape
        self.vals = vals  # (L, nnz) Montgomery device array
        if len(self.rows):
            counts = np.bincount(self.rows, minlength=num_rows)
            assert counts.max(initial=0) <= MAX_ROW_NNZ, "row too dense for lazy accumulation"
            countsT = np.bincount(self.cols, minlength=num_cols)
            assert countsT.max(initial=0) <= MAX_ROW_NNZ, "col too dense for lazy accumulation"
        self._rows_dev = jnp.asarray(self.rows)
        self._cols_dev = jnp.asarray(self.cols)

    @property
    def num_nonzero(self) -> int:
        return len(self.rows)

    @classmethod
    def from_entries(cls, F, num_rows: int, num_cols: int,
                     entries):
        """entries: list of (row, col, int_value)."""
        rows = np.array([e[0] for e in entries], dtype=np.int32)
        cols = np.array([e[1] for e in entries], dtype=np.int32)
        vals = F.from_ints([e[2] for e in entries])
        return cls(F, num_rows, num_cols, rows, cols, vals)

    def _segsum(self, prod, seg_ids, num_segments):
        """prod (L, nnz) -> (L, num_segments), field-generic segment
        reduction (lazy-limb mod-p sums / XOR bit-plane parity)."""
        return self.F.segment_reduce(prod, seg_ids, num_segments)

    def matvec(self, z):
        """M @ z for z (L, num_cols) Montgomery -> (L, num_rows)."""
        F = self.F
        gathered = jnp.take(z, self._cols_dev, axis=1)   # (L, nnz)
        prod = F.mul(self.vals, gathered)
        return self._segsum(prod, self._rows_dev, self.num_rows)

    def matvec_transpose(self, y):
        """M^T @ y for y (L, num_rows) -> (L, num_cols).  Hot path of
        lincheck's p_alpha^M computation (basic_lincheck_aux.hpp:36-55)."""
        F = self.F
        gathered = jnp.take(y, self._rows_dev, axis=1)
        prod = F.mul(self.vals, gathered)
        return self._segsum(prod, self._cols_dev, self.num_cols)
