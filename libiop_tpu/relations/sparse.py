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

    def _ell_plan(self, seg_ids: np.ndarray, src_ids: np.ndarray,
                  num_segments: int):
        """Static ELL layout for a segment reduction: pad every segment to
        the max segment degree K so the reduction is a dense reshape+sum of
        gathers — NO scatter (TPU segment_sum lowers to serialized scatter-
        adds; it dominated the sync-profiled 2^18 witness-encode/lincheck).
        Returns (entry_idx (S*K,), src_flat (S*K,), K) with sentinel entries
        pointing at an appended zero value, or None when padding would blow
        memory (> 4x nnz; callers fall back to segment_sum)."""
        nnz = len(seg_ids)
        counts = np.bincount(seg_ids, minlength=num_segments)
        K = int(counts.max(initial=1))
        if K * num_segments > 4 * nnz + 4096:
            return None
        order = np.argsort(seg_ids, kind="stable")
        sseg = seg_ids[order].astype(np.int64)
        starts = np.zeros(num_segments + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        slot = np.arange(nnz, dtype=np.int64) - starts[sseg]
        flat_pos = sseg * K + slot
        entry_idx = np.full(num_segments * K, nnz, dtype=np.int32)
        entry_idx[flat_pos] = order
        src_flat = np.zeros(num_segments * K, dtype=np.int32)
        src_flat[flat_pos] = src_ids[order]
        return (jnp.asarray(entry_idx), jnp.asarray(src_flat), K)

    def _ell_apply(self, plan, vec, num_segments: int):
        F = self.F
        entry_idx, src_flat, K = plan
        vals_pad = jnp.concatenate(
            [self.vals, jnp.zeros(self.vals.shape[:-1] + (1,), jnp.uint32)],
            axis=-1)
        prod = F.mul(jnp.take(vals_pad, entry_idx, axis=1),
                     jnp.take(vec, src_flat, axis=1))
        prod3 = prod.reshape(prod.shape[:-1] + (num_segments, K))
        if hasattr(F, "p"):
            # limbs < 2^16, K <= MAX_ROW_NNZ: exact uint32 sums, one wide
            # Montgomery reduction (same math as segment_reduce)
            return F.lazy_sum_reduce(jnp.sum(prod3, axis=-1))
        return jax.lax.reduce(prod3, jnp.uint32(0), jax.lax.bitwise_xor,
                              dimensions=[prod3.ndim - 1])

    def matvec(self, z):
        """M @ z for z (L, num_cols) Montgomery -> (L, num_rows)."""
        F = self.F
        plan = getattr(self, "_mv_plan", False)
        if plan is False:
            plan = self._mv_plan = self._ell_plan(
                self.rows, self.cols, self.num_rows)
        if plan is not None:
            return self._ell_apply(plan, z, self.num_rows)
        gathered = jnp.take(z, self._cols_dev, axis=1)   # (L, nnz)
        prod = F.mul(self.vals, gathered)
        return self._segsum(prod, self._rows_dev, self.num_rows)

    def matvec_transpose(self, y):
        """M^T @ y for y (L, num_rows) -> (L, num_cols).  Hot path of
        lincheck's p_alpha^M computation (basic_lincheck_aux.hpp:36-55)."""
        F = self.F
        plan = getattr(self, "_mvT_plan", False)
        if plan is False:
            plan = self._mvT_plan = self._ell_plan(
                self.cols, self.rows, self.num_cols)
        if plan is not None:
            return self._ell_apply(plan, y, self.num_cols)
        gathered = jnp.take(y, self._rows_dev, axis=1)
        prod = F.mul(self.vals, gathered)
        return self._segsum(prod, self._cols_dev, self.num_cols)
