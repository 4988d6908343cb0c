"""Random satisfiable R1CS instances, same distribution as the reference
generator (libiop/relations/examples/r1cs_examples.tcc:24-79): constraint i is
  z[A_idx+1] * z[B_idx+1] = coeff * z[C_idx+1]
with A_idx = i % n, B_idx = (i+7) % n, C_idx = (2i+1) % n, coeff chosen to
satisfy a random assignment (falling back to the constant column when the
C-variable is zero).
"""
from __future__ import annotations

import numpy as np

from .r1cs import R1CS


def generate_r1cs_example(F, num_constraints: int, num_inputs: int,
                          num_variables: int, rng: np.random.Generator | None = None):
    """Returns (r1cs, primary_input, auxiliary_input) with int inputs."""
    assert num_inputs <= num_variables
    rng = rng or np.random.default_rng()
    assignment = F.random_ints(num_variables, rng)

    cs = R1CS(F, num_inputs, num_variables)
    for i in range(num_constraints):
        a_idx = i % num_variables
        b_idx = (i + 7) % num_variables
        c_idx = (2 * i + 1) % num_variables
        ab = F.mul_ints(assignment[a_idx], assignment[b_idx])
        if assignment[c_idx] == 0:
            C = [(0, ab)]
        else:
            C = [(c_idx + 1, F.mul_ints(ab, F.inv_int(assignment[c_idx])))]
        cs.add_constraint([(a_idx + 1, 1)], [(b_idx + 1, 1)], C)

    primary = assignment[:num_inputs]
    auxiliary = assignment[num_inputs:]
    return cs, primary, auxiliary
