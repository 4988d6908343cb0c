"""R1CS constraint systems: <A,z>*<B,z> = <C,z> with z = (1, primary, aux).

Counterpart of libiop/relations/r1cs.{hpp,tcc}: constraints over variables
(variable 0 is the constant 1), A/B/C matrix views over the full z vector,
satisfaction checking, and Az/Bz/Cz computation (r1cs.hpp:113-152).

Host representation keeps constraints as int triples; device representation
is three SparseMatrix objects built once per constraint system.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from ..fields.prime import PrimeField
from .sparse import SparseMatrix

# a linear combination is a list of (variable_index, int_coeff); index 0 = const 1
LinearCombination = List[Tuple[int, int]]


class R1CS:
    def __init__(self, F: PrimeField, num_inputs: int, num_variables: int):
        self.F = F
        self.num_inputs = num_inputs          # primary input size
        self.num_variables = num_variables    # total (primary + auxiliary)
        self.constraints: List[Tuple[LinearCombination, LinearCombination, LinearCombination]] = []
        self._mats = None

    @property
    def num_constraints(self) -> int:
        return len(self.constraints)

    def add_constraint(self, A, B, C):
        """Add the constraint <A,z>*<B,z> = <C,z>.  Each side may be raw
        [(index, coeff)] pairs or any operator-built expression from
        relations.variable (Variable / LinearTerm / LinearCombination / int
        constant) — the reference's r1cs_constraint + variable DSL
        (r1cs.hpp:35-60, variable.hpp)."""
        from .variable import as_term_pairs
        self.constraints.append(
            (as_term_pairs(A), as_term_pairs(B), as_term_pairs(C)))
        self._mats = None

    # -- matrices ----------------------------------------------------------
    def matrices(self):
        """(A, B, C) as SparseMatrix over z (dim: num_constraints x (num_variables+1))."""
        if self._mats is None:
            ncols = self.num_variables + 1
            mats = []
            for which in range(3):
                entries = []
                for i, cons in enumerate(self.constraints):
                    for (var, coeff) in cons[which]:
                        entries.append((i, var, self.F.sample_int(coeff)))
                if not entries:
                    entries = []
                mats.append(SparseMatrix.from_entries(
                    self.F, self.num_constraints, ncols, entries)
                    if entries else
                    SparseMatrix(self.F, self.num_constraints, ncols,
                                 np.zeros(0, np.int32), np.zeros(0, np.int32),
                                 self.F.zeros((0,))))
            self._mats = tuple(mats)
        return self._mats

    # -- assignments -------------------------------------------------------
    def full_assignment(self, primary: List[int], auxiliary: List[int]):
        """z = (1, primary, aux) as (L, num_variables+1) Montgomery array."""
        assert len(primary) == self.num_inputs
        assert len(primary) + len(auxiliary) == self.num_variables
        return self.F.from_ints([1] + list(primary) + list(auxiliary))

    def Az_Bz_Cz(self, z):
        """Sparse matvecs (r1cs.hpp:146-152 role): returns three (L, m) arrays."""
        A, B, C = self.matrices()
        return A.matvec(z), B.matvec(z), C.matvec(z)

    def is_satisfied(self, primary: List[int], auxiliary: List[int]) -> bool:
        z = self.full_assignment(primary, auxiliary)
        Az, Bz, Cz = self.Az_Bz_Cz(z)
        F = self.F
        return bool(jnp.all(F.eq(F.mul(Az, Bz), Cz)))
