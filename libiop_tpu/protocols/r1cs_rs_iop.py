"""The RS-encoded Aurora protocol: witness oracles fw/fAz/fBz/fCz, the fz and
rowcheck virtual oracles, and dispatch into multi-lincheck.

Counterpart of libiop/protocols/encoded/r1cs_rs_iop/r1cs_rs_iop.{hpp,tcc}:
* oracle degrees (r1cs_rs_iop.tcc:296-386): fw: n-(k+1)+b, fA/B/Cz: m+b,
  fz (virtual) = n+b, rowcheck (virtual) = m+2b-1, with b the zk query bound;
* fz = fw * Z_{input} + f_{1,v} where f_{1,v} interpolates (1, primary) over
  the input-variable domain (r1cs_rs_iop.tcc:144-258);
* rowcheck = (fAz*fBz - fCz)/Z_{constraint} exploiting the |H|-to-1 structure
  of Z over the codeword domain (rowcheck.tcc, tiled inverse);
* prover pipeline (r1cs_rs_iop.tcc:481-615): f_{1,v} IFFT/FFT, fw via
  scatter -> IFFT -> (zk mask) -> exact division by Z_input -> FFT, and
  f_Mz via sparse matvec -> IFFT -> (zk mask) -> FFT.

All prover steps are dense device ops; scatters use static reindex arrays.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset
from ..algebra.generic import (divide_by_vanishing_any, fft_any, ifft_any,
                               lagrange_coeffs_ints_any, mul_by_vanishing_any,
                               vanishing_eval_int, vanishing_evals_over_any,
                               vanishing_inverse_evals_over_any)
from ..iop.runtime import IOPProtocol, OracleHandle, VirtualOracle
from ..relations.r1cs import R1CS
from .lincheck import LincheckParams, MultiLincheck


class FzOracle(VirtualOracle):
    """fz = fw * Z_input + f_{1,v} (r1cs_rs_iop.tcc:144-258)."""

    def __init__(self, F, input_domain, codeword_domain):
        self.F = F
        self.input_domain = input_domain
        self.L = codeword_domain
        self.primary: Optional[List[int]] = None
        self._f1v_cw = None

    def set_primary_input(self, primary: List[int]):
        self.primary = [self.F.sample_int(int(v)) for v in primary]
        self._f1v_cw = None

    def _f1v_over_codeword(self):
        if self._f1v_cw is None:
            F = self.F
            vals = F.from_ints([1] + self.primary)
            coeffs = ifft_any(vals, self.input_domain)
            self._f1v_cw = fft_any(coeffs, self.L)
        return self._f1v_cw

    def evaluated_contents(self, evals):
        assert self.primary is not None
        F = self.F
        fw = evals[0]
        z_in = vanishing_evals_over_any(self.input_domain, self.L)
        return F.add(F.mul(fw, z_in), self._f1v_over_codeword())

    # fused-DAG tracing (see iop/runtime.py VirtualOracle notes)
    def traced_aux(self):
        if self.primary is None:
            return None
        return [vanishing_evals_over_any(self.input_domain, self.L),
                self._f1v_over_codeword()]

    def traced_contents(self, aux, evals):
        z_in, f1v = aux
        return self.F.add(self.F.mul(evals[0], z_in), f1v)

    def evaluation_at_point(self, position, x, vals):
        assert self.primary is not None
        F = self.F
        fw_x = vals[0]
        lag = lagrange_coeffs_ints_any(self.input_domain, x)
        f1v_x = lag[0]
        for l, v in zip(lag[1:], self.primary):
            f1v_x = F.add_ints(f1v_x, F.mul_ints(l, v))
        z_x = vanishing_eval_int(self.input_domain, x)
        return F.add_ints(F.mul_ints(fw_x, z_x), f1v_x)


class RowcheckOracle(VirtualOracle):
    """(fAz*fBz - fCz) / Z_constraint over the codeword domain."""

    def __init__(self, F, codeword_domain, constraint_domain):
        self.F = F
        self.L = codeword_domain
        self.constraint_domain = constraint_domain

    def evaluated_contents(self, evals):
        F = self.F
        az, bz, cz = evals
        z_inv = vanishing_inverse_evals_over_any(self.constraint_domain, self.L)
        return F.mul(F.sub(F.mul(az, bz), cz), z_inv)

    # fused-DAG tracing (see iop/runtime.py VirtualOracle notes)
    def traced_aux(self):
        return [vanishing_inverse_evals_over_any(self.constraint_domain,
                                                 self.L)]

    def traced_contents(self, aux, evals):
        F = self.F
        az, bz, cz = evals
        return F.mul(F.sub(F.mul(az, bz), cz), aux[0])

    def evaluation_at_point(self, position, x, vals):
        F = self.F
        az, bz, cz = vals
        z_x = vanishing_eval_int(self.constraint_domain, x)
        return F.mul_ints(F.sub_ints(F.mul_ints(az, bz), cz), F.inv_int(z_x))


class EncodedAuroraParams:
    def __init__(self, F, interactive_security_bits: int,
                 codeword_domain_dim: int, constraint_domain_dim: int,
                 summation_domain_dim: int, query_bound: int, make_zk: bool,
                 holographic: bool = False, index_domain_dim: int = 0):
        self.F = F
        self.codeword_domain_dim = codeword_domain_dim
        self.constraint_domain_dim = constraint_domain_dim
        self.summation_domain_dim = summation_domain_dim
        self.query_bound = 0 if not make_zk else query_bound
        self.make_zk = make_zk
        self.holographic = holographic
        self.index_domain_dim = index_domain_dim
        if holographic:
            from .holographic_lincheck import HolographicLincheckParams
            self.holographic_lincheck_params = HolographicLincheckParams(
                F, interactive_security_bits, constraint_domain_dim, make_zk)
        else:
            self.lincheck_params = LincheckParams(
                F, interactive_security_bits, constraint_domain_dim, make_zk)

    def max_tested_degree_bound(self) -> int:
        """r1cs_rs_iop.tcc:56-77 formulas; holographic bounds use the actual
        index domain (3|K|) rather than the reference's 3|H| approximation,
        and include the zk query-bound contribution the reference's TODO
        acknowledges omitting."""
        if self.holographic:
            lincheck = max(
                3 * (1 << max(self.index_domain_dim, self.constraint_domain_dim)),
                2 * (1 << self.summation_domain_dim) + self.query_bound - 1)
        elif not self.make_zk:
            return 1 << self.summation_domain_dim
        else:
            lincheck = 2 * (1 << self.summation_domain_dim) + self.query_bound - 1
        rowcheck = (1 << self.constraint_domain_dim) + 2 * self.query_bound - 1
        return max(lincheck, rowcheck)

    def max_constraint_degree_bound(self) -> int:
        if self.holographic:
            lincheck = 4 * (1 << max(self.index_domain_dim,
                                     self.constraint_domain_dim))
        else:
            lincheck = 2 * (1 << self.summation_domain_dim) + self.query_bound - 1
        rowcheck = 2 * (1 << self.constraint_domain_dim) + 2 * self.query_bound - 1
        return max(lincheck, rowcheck)


class EncodedAurora:
    def __init__(self, iop: IOPProtocol, constraint_handle, variable_handle,
                 codeword_handle, r1cs: R1CS, params: EncodedAuroraParams,
                 rng: Optional[np.random.Generator] = None):
        self.iop = iop
        self.F = iop.F
        self.params = params
        self.r1cs = r1cs
        self.rng = rng or np.random.default_rng()
        self.constraint_domain = iop.get_domain(constraint_handle)
        self.variable_domain = iop.get_domain(variable_handle)
        self.L = iop.get_domain(codeword_handle)
        self.codeword_handle = codeword_handle
        F = self.F
        k = r1cs.num_inputs
        assert (k + 1) & k == 0, "num_inputs + 1 must be a power of two"
        assert r1cs.num_constraints == self.constraint_domain.order
        assert r1cs.num_variables + 1 == self.variable_domain.order
        self.input_domain = self.variable_domain.get_subset_of_order(k + 1)
        n = self.variable_domain.order
        m = self.constraint_domain.order
        b = params.query_bound
        self.fw_degree = n - (k + 1) + b
        self.fw_mask_degree = b
        fABCz_degree = m + b
        self.fw_handle = iop.register_oracle(codeword_handle, self.fw_degree,
                                             make_zk=params.make_zk)
        self.fAz_handle = iop.register_oracle(codeword_handle, fABCz_degree,
                                              make_zk=params.make_zk)
        self.fBz_handle = iop.register_oracle(codeword_handle, fABCz_degree,
                                              make_zk=params.make_zk)
        self.fCz_handle = iop.register_oracle(codeword_handle, fABCz_degree,
                                              make_zk=params.make_zk)
        self.fz_oracle = FzOracle(F, self.input_domain, self.L)
        fz_degree = self.fw_degree + k + 1
        self.fz_handle = iop.register_virtual_oracle(
            codeword_handle, fz_degree, [self.fw_handle], self.fz_oracle)
        A, B, C = r1cs.matrices()
        if params.holographic:
            from .holographic_lincheck import HolographicMultiLincheck
            self.multi_lincheck = HolographicMultiLincheck(
                iop, codeword_handle, constraint_handle,
                self.input_domain.dim, [A, B, C], self.fz_handle,
                [self.fAz_handle, self.fBz_handle, self.fCz_handle],
                params.holographic_lincheck_params, rng=self.rng)
        else:
            self.multi_lincheck = MultiLincheck(
                iop, codeword_handle, constraint_handle, variable_handle,
                self.input_domain.dim, [A, B, C], self.fz_handle,
                [self.fAz_handle, self.fBz_handle, self.fCz_handle],
                params.lincheck_params, rng=self.rng)
        rowcheck_degree = m + 2 * b - 1 if params.make_zk else m - 1
        # non-zk: deg((fAz*fBz - fCz)/Z_m) = 2m-1-m = m-1; zk: m+2b-1
        self.rowcheck_oracle = RowcheckOracle(F, self.L, self.constraint_domain)
        self.rowcheck_handle = iop.register_virtual_oracle(
            codeword_handle, m + 2 * b - 1,
            [self.fAz_handle, self.fBz_handle, self.fCz_handle],
            self.rowcheck_oracle)
        # static scatter maps
        self.var_reindex = np.array(
            [self.variable_domain.reindex_by_subgroup(self.input_domain.dim, j)
             for j in range(n)], dtype=np.int64)

    # -- registration ------------------------------------------------------
    def set_index_oracles(self, index_handle, indexed_handles):
        assert self.params.holographic
        self.multi_lincheck.set_index_oracles(index_handle, indexed_handles)

    def set_index_vectors_over_K(self, vectors_per_matrix):
        assert self.params.holographic
        self.multi_lincheck.set_index_vectors_over_K(vectors_per_matrix)

    def register_challenge(self):
        if self.params.holographic:
            self.multi_lincheck.register_challenge_alpha()
        else:
            self.multi_lincheck.register_challenge()

    def register_proof(self):
        if self.params.holographic:
            self.multi_lincheck.register_response_alpha()
            self.multi_lincheck.register_challenge_beta()
            self.multi_lincheck.register_response_beta()
        else:
            self.multi_lincheck.register_proof()

    # -- proving -----------------------------------------------------------
    def _encode_fn(self):
        """ONE jitted function computing all four witness codewords — eager
        per-op dispatch is catastrophic under remote-TPU latency (measured
        276s -> one dispatch at 2^14).  Cached on the R1CS instance (matrices
        ride along as trace constants; XLA's persistent cache dedupes the
        compile across prover instances)."""
        import jax
        F = self.F
        k = self.r1cs.num_inputs
        n = self.variable_domain.order
        b = self.params.query_bound
        make_zk = self.params.make_zk
        key = ("encode", self.L.order, n, self.constraint_domain.order,
               make_zk, b)
        cache = getattr(self.r1cs, "_encode_jit_cache", None)
        if cache is None:
            cache = self.r1cs._encode_jit_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn
        aux_positions = np.asarray(self.var_reindex[k + 1:], dtype=np.int64)
        A, B, C = self.r1cs.matrices()
        input_domain, variable_domain = self.input_domain, self.variable_domain
        constraint_domain, L = self.constraint_domain, self.L

        def encode(f1_in, aux_mont, z, masks):
            # f_{1,v}: interpolate (1, primary) over the input domain
            f1v_coeffs = ifft_any(f1_in, input_domain)
            f1v_vd = fft_any(f1v_coeffs, variable_domain)
            # fw' over the variable domain: aux - f1v at witness slots
            # (gather-placed: TPU scatters serialize; generic.place_columns)
            from ..algebra.generic import place_columns
            fw_prime = place_columns(
                F.sub(aux_mont, f1v_vd[:, jnp.asarray(aux_positions)]),
                aux_positions, n)
            fw_coeffs = ifft_any(fw_prime, variable_domain)
            if make_zk:
                # += Z_var * R_w, R_w random of degree < b
                zr = mul_by_vanishing_any(masks[0], variable_domain)
                fw_coeffs = zr.at[:, :n].set(F.add(zr[:, :n], fw_coeffs))
            quotient, _rem = divide_by_vanishing_any(fw_coeffs, input_domain)
            fw_cw = fft_any(quotient, L) if quotient.shape[1] else \
                jnp.zeros((F.L, L.order), dtype=jnp.uint32)
            outs = [fw_cw]
            for idx, M in enumerate([A, B, C]):
                coeffs = ifft_any(M.matvec(z), constraint_domain)
                if make_zk:
                    m_ord = constraint_domain.order
                    zr = mul_by_vanishing_any(masks[1 + idx], constraint_domain)
                    coeffs = zr.at[:, :m_ord].set(F.add(zr[:, :m_ord], coeffs))
                outs.append(fft_any(coeffs, L))
            return tuple(outs)

        fn = cache[key] = jax.jit(encode)
        return fn

    def submit_witness_oracles(self, primary: List[int], auxiliary: List[int]):
        F = self.F
        self.fz_oracle.set_primary_input(primary)
        self.multi_lincheck.submit_sumcheck_masking_polynomials()
        b = self.params.query_bound
        f1_in = F.from_ints([1] + list(primary))
        aux_mont = F.from_ints(list(auxiliary))
        z = self.r1cs.full_assignment(primary, auxiliary)
        masks = tuple(F.random((max(b, 1),), self.rng)
                      for _ in range(4)) if self.params.make_zk else ()
        fw_cw, az_cw, bz_cw, cz_cw = self._encode_fn()(
            f1_in, aux_mont, z, masks)
        self.iop.submit_oracle(self.fw_handle, fw_cw)
        self.iop.submit_oracle(self.fAz_handle, az_cw)
        self.iop.submit_oracle(self.fBz_handle, bz_cw)
        self.iop.submit_oracle(self.fCz_handle, cz_cw)

    def calculate_and_submit_proof(self):
        if self.params.holographic:
            self.multi_lincheck.calculate_response_alpha()
            self.iop.signal_prover_round_done()
            self.multi_lincheck.calculate_response_beta()
        else:
            self.multi_lincheck.calculate_and_submit_proof()

    # -- verification ------------------------------------------------------
    def construct_verifier_state(self, primary: List[int]):
        self.fz_oracle.set_primary_input(primary)
        self.multi_lincheck.construct_verifier_state()

    def get_all_oracle_handles(self) -> List[OracleHandle]:
        out = self.multi_lincheck.ldt_oracle_handles()
        out.extend([self.fw_handle, self.fAz_handle, self.fBz_handle,
                    self.fCz_handle, self.rowcheck_handle])
        return out
