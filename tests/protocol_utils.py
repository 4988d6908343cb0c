"""Shared helpers for interactive protocol tests (role of
tests/protocols/utilities.cpp: sum_over_field_subset, oracle consistency)."""
import numpy as np

from libiop_tpu.algebra.fft import ifft


def sum_over_domain_ints(F, evals_over_domain):
    """Host: sum of a codeword's values (canonical ints)."""
    vals = F.to_ints(evals_over_domain)
    return int(sum(int(v) for v in vals) % F.p)


def oracle_is_low_degree(iop, handle) -> bool:
    """Interpolate the oracle over its domain; check coefficients beyond its
    registered degree bound vanish (interactive-test stand-in for the LDT)."""
    dom = iop.get_oracle_domain(handle)
    bound = iop.get_oracle_degree_bound(handle)
    evals = iop.get_oracle_evaluations(handle)
    coeffs = ifft(evals, dom)
    ints = iop.F.to_ints(coeffs[:, bound:])
    return all(int(v) == 0 for v in ints)


def assert_oracle_consistency(iop, handle, positions):
    """Pointwise (host-int) evaluation must agree with the vectorized
    codeword (test_oracle_consistency pattern, utilities.cpp:20-130)."""
    evals = iop.get_oracle_evaluations(handle)
    F = iop.F
    for pos in positions:
        vec_val = int(F.to_ints(evals[:, pos:pos + 1])[0])
        pt_val = iop.get_oracle_evaluation_at_position(handle, pos)
        assert vec_val == pt_val, (pos, vec_val, pt_val)
