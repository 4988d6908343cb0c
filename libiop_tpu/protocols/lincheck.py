"""Basic (multi-)lincheck: reduce "f_Mz is consistent with f_z under M for
M in {A,B,C}" to one batch sumcheck per repetition.

Counterpart of libiop/protocols/encoded/lincheck/basic_lincheck.{hpp,tcc} +
basic_lincheck_aux.{hpp,tcc}: the verifier sends alpha and r_M; the virtual
oracle is
    q(x) = p_alpha^1(x) * sum_M r_M f_Mz(x)  -  p_alpha^2(x) * f_z(x)
where p_alpha^1 is the LDE of (alpha^i at the constraint-domain positions of
the summation domain, 0 elsewhere) and p_alpha^2 the LDE of
sum_M r_M (M^T alpha-powers) scattered to variable positions
(basic_lincheck_aux.tcc:29-103, quasilinear algorithm rationale at
basic_lincheck_aux.hpp:36-55).  The sum of q over the summation domain is 0
iff all three linchecks hold (whp over alpha), delegated to sumcheck with
claimed sum 0.  Repetitions per the soundness formula
ceil(-sec / (constraint_dim - log|F|)) (basic_lincheck.tcc:14-57).

TPU realization: alpha-powers via the log-depth powers kernel; M^T alpha via
the gather/segment-sum transpose matvec; scatters use static precomputed
reindex arrays; two degree-aware IFFT/FFT pairs per repetition.
"""
from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset, device_powers
from ..algebra.generic import fft_any, ifft_any
from ..iop.runtime import IOPProtocol, OracleHandle, VirtualOracle
from ..relations.sparse import SparseMatrix
from .fri import log2_field_size
from .sumcheck import BatchSumcheck


class LincheckParams:
    def __init__(self, F, interactive_security_parameter: int,
                 constraint_domain_dim: int, make_zk: bool):
        self.F = F
        self.interactive_security_parameter = interactive_security_parameter
        self.constraint_domain_dim = constraint_domain_dim
        self.make_zk = make_zk
        denom = constraint_domain_dim - log2_field_size(F)
        reps = math.ceil(-interactive_security_parameter / denom)
        self.repetitions = max(1, int(reps))


_HORNER_PAIR_JITS = {}


def _horner_pair_jit(F):
    """Process-global jitted (p1(x), p2(x)) batch Horner, keyed by field.
    Caching on the per-proof oracle instance retraced the scan body every
    verifier call (~4 s of pure-Python tracing, round-4 cProfile)."""
    fn = _HORNER_PAIR_JITS.get(F.name)
    if fn is None:
        import jax
        from ..algebra.poly import horner_eval

        fn = _HORNER_PAIR_JITS[F.name] = jax.jit(
            lambda c1, c2, xx: (horner_eval(F, c1, xx),
                                horner_eval(F, c2, xx)))
    return fn


class MultiLincheckVirtualOracle(VirtualOracle):
    """q(x) as above; constituents [fz, fAz, fBz, fCz]."""

    def __init__(self, F, codeword_domain, constraint_domain,
                 variable_domain, summation_domain, input_variable_dim: int,
                 matrices: List[SparseMatrix]):
        self.F = F
        self.L = codeword_domain
        self.constraint_domain = constraint_domain
        self.variable_domain = variable_domain
        self.summation_domain = summation_domain
        self.matrices = matrices
        # static reindex maps (subgroup.tcc:147-174 formulas)
        self.constraint_to_sum = np.array(
            [summation_domain.reindex_by_subgroup(constraint_domain.dim, i)
             for i in range(constraint_domain.order)], dtype=np.int64)
        var_to_var = [variable_domain.reindex_by_subgroup(input_variable_dim, i)
                      for i in range(variable_domain.order)]
        self.var_to_sum = np.array(
            [summation_domain.reindex_by_subgroup(variable_domain.dim, v)
             for v in var_to_var], dtype=np.int64)
        self._p1_coeffs = None
        self._p2_coeffs = None

    def set_challenge(self, alpha: int, r_M: List[int]):
        from ..utils.profiling import PROFILER
        with PROFILER.block("lincheck_set_challenge"):
            self._set_challenge(alpha, r_M)

    def _set_challenge(self, alpha: int, r_M: List[int]):
        F = self.F
        Hs = self.summation_domain
        alpha_l = F.from_ints([alpha]).reshape(F.L)
        alpha_powers = device_powers(F, alpha_l, self.constraint_domain.order)
        # p_alpha^1 evals over summation domain (gather-placed; TPU scatter
        # of 2^18 columns serialized — see generic.place_columns)
        from ..algebra.generic import place_columns
        p1 = place_columns(alpha_powers, self.constraint_to_sum, Hs.order)
        # p_alpha^2 = sum_M r_M M^T(alpha_powers), scattered to variable slots
        acc = None
        for m, M in enumerate(self.matrices):
            v = M.matvec_transpose(alpha_powers)  # (L, num_cols)
            r_l = F.from_ints([r_M[m]]).reshape(F.L, 1)
            term = F.mul(v, r_l)
            acc = term if acc is None else F.add(acc, term)
        # pad/truncate columns to the variable domain order
        nv = self.variable_domain.order
        if acc.shape[1] < nv:
            acc = jnp.concatenate(
                [acc, jnp.zeros((F.L, nv - acc.shape[1]), dtype=jnp.uint32)], axis=1)
        else:
            assert acc.shape[1] == nv, (acc.shape, nv)
        p2 = place_columns(acc, self.var_to_sum, Hs.order)
        self._p1_coeffs = ifft_any(p1, Hs)
        self._p2_coeffs = ifft_any(p2, Hs)
        self._p_cw = None
        self._pt_eval_cache = {}
        self.r_M = [F.sample_int(int(r)) for r in r_M]

    def evaluated_contents(self, evals):
        assert self._p1_coeffs is not None, "challenge not set"
        F = self.F
        fz = evals[0]
        p1_cw, p2_cw = self._p_codewords()
        combined_Mz = None
        for m, ev in enumerate(evals[1:]):
            r_l = F.from_ints([self.r_M[m]]).reshape(F.L, 1)
            term = F.mul(ev, r_l)
            combined_Mz = term if combined_Mz is None else F.add(combined_Mz, term)
        return F.sub(F.mul(combined_Mz, p1_cw), F.mul(fz, p2_cw))

    def _p_codewords(self):
        """p_alpha^{1,2} codeword evaluations, computed once per challenge
        (two degree-aware FFT dispatches)."""
        if getattr(self, "_p_cw", None) is None:
            self._p_cw = (fft_any(self._p1_coeffs, self.L),
                          fft_any(self._p2_coeffs, self.L))
        return self._p_cw

    # fused-DAG tracing (see iop/runtime.py VirtualOracle notes)
    def traced_aux(self):
        if self._p1_coeffs is None:
            return None
        p1_cw, p2_cw = self._p_codewords()
        return [p1_cw, p2_cw, self.F.from_ints(self.r_M)]

    def traced_sig(self):
        return (len(self.matrices),)

    def traced_contents(self, aux, evals):
        F = self.F
        p1_cw, p2_cw, r_arr = aux
        fz = evals[0]
        combined_Mz = None
        for m, ev in enumerate(evals[1:]):
            term = F.mul(ev, r_arr[:, m:m + 1])
            combined_Mz = term if combined_Mz is None else F.add(combined_Mz, term)
        return F.sub(F.mul(combined_Mz, p1_cw), F.mul(fz, p2_cw))

    def prefetch_points(self, positions, points):
        """Batch p_alpha^{1,2} at EVERY query point in ONE device Horner
        dispatch + ONE device->host transfer (a per-point round-trip costs
        ~50-200 ms through the remote-TPU tunnel; with ~10^2 distinct query
        points that dominated the whole Aurora verifier)."""
        F = self.F
        fn = _horner_pair_jit(F)
        # pad to the next power of two so repeated proofs with slightly
        # different query counts reuse one compiled shape
        n = len(points)
        m = 1 << max(0, (n - 1).bit_length())
        xl = F.from_ints(list(points) + [0] * (m - n))
        p1, p2 = fn(self._p1_coeffs, self._p2_coeffs, xl)
        ints1, ints2 = F.to_ints(p1), F.to_ints(p2)
        for x, a, b in zip(points, ints1, ints2):
            self._pt_eval_cache[int(x)] = (int(a), int(b))

    def _eval_p_at(self, x: int):
        """p_alpha^1(x), p_alpha^2(x): served from the ``prefetch_points``
        batch; the fallback path (interactive simulation querying positions
        that were never registered) pays one device Horner round-trip."""
        cache = getattr(self, "_pt_eval_cache", None)
        if cache is None:
            cache = self._pt_eval_cache = {}
        hit = cache.get(x)
        if hit is not None:
            return hit
        self.prefetch_points([0], [x])
        out = self._pt_eval_cache[x]
        # the single-point fallback cached under key points[0]=x already
        return out

    def evaluation_at_point(self, position, x, vals):
        assert self._p1_coeffs is not None, "challenge not set"
        F = self.F
        p1_x, p2_x = self._eval_p_at(x)
        fz_x = vals[0]
        combined = 0
        for r, v in zip(self.r_M, vals[1:]):
            combined = F.add_ints(combined, F.mul_ints(r, v))
        return F.sub_ints(F.mul_ints(combined, p1_x), F.mul_ints(fz_x, p2_x))


class MultiLincheck:
    def __init__(self, iop: IOPProtocol, codeword_handle, constraint_handle,
                 variable_handle, input_variable_dim: int,
                 matrices: List[SparseMatrix], fz_handle: OracleHandle,
                 Mz_handles: List[OracleHandle], params: LincheckParams,
                 rng: Optional[np.random.Generator] = None):
        self.iop = iop
        self.F = iop.F
        self.params = params
        self.codeword_handle = codeword_handle
        constraint_domain = iop.get_domain(constraint_handle)
        variable_domain = iop.get_domain(variable_handle)
        if constraint_domain.dim > variable_domain.dim:
            self.summation_handle = constraint_handle
        else:
            self.summation_handle = variable_handle
        summation_domain = iop.get_domain(self.summation_handle)
        self.constituents = [fz_handle] + list(Mz_handles)
        fz_degree = iop.get_oracle_degree_bound(fz_handle)
        Mz_degree = iop.get_oracle_degree_bound(Mz_handles[0])
        self.lincheck_degree = summation_domain.order + max(fz_degree, Mz_degree) - 1
        self.sumchecks: List[BatchSumcheck] = []
        self.oracles: List[MultiLincheckVirtualOracle] = []
        for _ in range(params.repetitions):
            sc = BatchSumcheck(iop, self.summation_handle, codeword_handle,
                               self.lincheck_degree, params.make_zk, rng=rng)
            if params.make_zk:
                sc.register_masking_polynomial()
            self.sumchecks.append(sc)
            self.oracles.append(MultiLincheckVirtualOracle(
                self.F, iop.get_domain(codeword_handle), constraint_domain,
                variable_domain, summation_domain, input_variable_dim, matrices))

    def register_challenge(self):
        self.alpha_handles = [self.iop.register_verifier_random_message(1)
                              for _ in range(self.params.repetitions)]
        self.r_handles = [self.iop.register_verifier_random_message(
            len(self.constituents) - 1) for _ in range(self.params.repetitions)]
        self.lincheck_handles = []
        for i, sc in enumerate(self.sumchecks):
            h = self.iop.register_virtual_oracle(
                self.codeword_handle, self.lincheck_degree, self.constituents,
                self.oracles[i])
            self.lincheck_handles.append(h)
            sc.attach_oracle_for_summing(h, 0)
            sc.register_challenge()

    def register_proof(self):
        for sc in self.sumchecks:
            sc.register_proof()

    def submit_sumcheck_masking_polynomials(self):
        if self.params.make_zk:
            for sc in self.sumchecks:
                sc.submit_masking_polynomial()

    def _set_challenges(self):
        for i in range(self.params.repetitions):
            alpha = self.iop.obtain_verifier_random_message(self.alpha_handles[i])[0]
            r_M = self.iop.obtain_verifier_random_message(self.r_handles[i])
            self.oracles[i].set_challenge(alpha, r_M)

    def calculate_and_submit_proof(self):
        self._set_challenges()
        for sc in self.sumchecks:
            sc.calculate_and_submit_proof()

    def construct_verifier_state(self):
        self._set_challenges()
        for sc in self.sumchecks:
            sc.construct_verifier_state()

    def ldt_oracle_handles(self) -> List[OracleHandle]:
        out = []
        for sc in self.sumchecks:
            out.extend(sc.ldt_oracle_handles())
        return out
