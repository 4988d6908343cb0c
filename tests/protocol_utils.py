"""Shared helpers for interactive protocol tests (role of
tests/protocols/utilities.cpp: sum_over_field_subset, oracle consistency).
Field/domain-generic."""
import numpy as np

from libiop_tpu.algebra.generic import ifft_any


def sum_over_domain_ints(F, evals_over_domain):
    """Host: sum of a codeword's values (canonical ints)."""
    vals = F.to_ints(evals_over_domain)
    acc = 0
    for v in vals:
        acc = F.add_ints(acc, int(v))
    return acc


def oracle_is_low_degree(iop, handle) -> bool:
    """Interpolate the oracle over its domain; check coefficients beyond its
    registered degree bound vanish (interactive-test stand-in for the LDT)."""
    dom = iop.get_oracle_domain(handle)
    bound = iop.get_oracle_degree_bound(handle)
    evals = iop.get_oracle_evaluations(handle)
    coeffs = ifft_any(evals, dom)
    ints = iop.F.to_ints(coeffs[:, bound:])
    return all(int(v) == 0 for v in ints)


def sweep_all_virtual_oracles(iop, positions):
    """Pointwise-vs-vectorized agreement for EVERY registered virtual oracle
    (the reference's test_oracle_consistency run as a blanket sweep)."""
    from libiop_tpu.iop.runtime import OracleHandle
    for vid, reg in enumerate(iop.virtual_regs):
        n = iop.get_domain(reg.domain).num_elements()
        pos = sorted({p % n for p in positions})
        assert_oracle_consistency(iop, OracleHandle(vid, virtual=True), pos)


def assert_oracle_consistency(iop, handle, positions):
    """Pointwise (host-int) evaluation must agree with the vectorized
    codeword (test_oracle_consistency pattern, utilities.cpp:20-130)."""
    evals = iop.get_oracle_evaluations(handle)
    F = iop.F
    for pos in positions:
        vec_val = int(F.to_ints(evals[:, pos:pos + 1])[0])
        pt_val = iop.get_oracle_evaluation_at_position(handle, pos)
        assert vec_val == pt_val, (pos, vec_val, pt_val)
