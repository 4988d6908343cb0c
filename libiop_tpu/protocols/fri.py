"""FRI low-degree test over BOTH domain families, TPU-first.

Counterpart of libiop/protocols/ldt/fri/fri_ldt.{hpp,tcc} + fri_aux.tcc +
localizer_polynomial.{hpp,tcc}:
* domain chain L^(i+1) = q^(i)(L^(i)) with per-round localization parameters
  (fri_ldt.tcc:280-339): multiplicative q(x) = x^{2^eta_i}; additive
  q(x) = Z_{V_i}(x), the linearized vanishing polynomial of the localizer
  subspace V_i = span(first eta_i basis vectors) — next basis/shift are the
  images of the remaining basis vectors / shift under q;
* coset layout follows the domain (natural order): multiplicative cosets are
  strided {j, j+N/c, ...} so the fold is a plain reshape; additive cosets are
  contiguous [j*c, (j+1)*c);
* interactive phase: fold per coset at the verifier challenge x_i
  (fri_aux.tcc:37-105 additive, 107-250 multiplicative), final polynomial by
  IFFT truncated to the bound (fri_ldt.tcc:532-543);
* query phase: one random s0 per repetition, then deterministic coset-chasing
  through the domain's index arithmetic (fri_ldt.tcc:401-473);
* verifier: per-round coset interpolation + chain-consistency + final-poly
  check (fri_ldt.tcc:574-642).

TPU-native folds:
* multiplicative (replaces the reference's batch-inversion Lagrange path):
  restricted to coset {h_j g^k}, f equals p_j(u) = sum_t a_t[j] u^t with
  a_t[j] = (1/c) sum_k f[k,j] g^{-tk} — a c-point inverse NTT along the
  intra-coset axis — and the folded value is p_j(x/h_j); zero inversions;
* additive (fri_aux.tcc:37-105 math, batched): Lagrange coefficient of coset
  element e is eps^{-1} * Z_j(x) / (x - e) with Z_j the coset's vanishing
  polynomial (= unshifted Z_V offset by a per-coset constant, F2-linearity)
  and eps = Z_V's linear coefficient; one full-width batched Itoh-Tsujii
  inversion replaces the reference's per-coset sequential batch_inverse,
  and the x-in-domain special case is a masked select instead of a branch.
"""
from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..algebra.domains import MultiplicativeCoset
from ..algebra.subspace import AffineSubspace, subset_sums_ints
from ..algebra.linearized import LinearizedVanishing
from ..algebra.generic import ifft_known_any, is_additive
from ..iop.runtime import IOPProtocol, OracleHandle, RoundParameters


def log2_field_size(F) -> float:
    """Soundness log2|F| for either family (libff
    soundness_log_of_field_size_helper role)."""
    if F.kind == "additive":
        return float(F.k)
    b = F.p.bit_length()
    return math.log2(F.p >> max(0, b - 53)) + max(0, b - 53)


class FRISoundnessType:
    proven = "proven"
    heuristic = "heuristic"


class FRIParameters:
    """Repetition counts from the FRI soundness analysis
    (fri_ldt.tcc:1-254, both proven and heuristic modes)."""

    def __init__(self, F,
                 interactive_soundness_bits: int,
                 query_soundness_bits: int,
                 soundness_type: str,
                 poly_degree_bound: int,
                 codeword_domain_dim: int,
                 RS_extra_dimensions: int,
                 absolute_proximity_parameter: int,
                 localization_parameters: List[int]):
        self.F = F
        self.soundness_type = soundness_type
        self.poly_degree_bound = poly_degree_bound
        self.codeword_domain_dim = codeword_domain_dim
        self.RS_extra_dimensions = RS_extra_dimensions
        self.localization_parameters = list(localization_parameters)
        total_loc = sum(self.localization_parameters)
        if poly_degree_bound % (1 << total_loc) != 0:
            raise ValueError("FRI degree bound must be a multiple of "
                             "2^{sum of localization parameters}")
        rate = 2.0 ** (-RS_extra_dimensions)
        codeword_domain_size = 2.0 ** codeword_domain_dim
        frac_prox = absolute_proximity_parameter / codeword_domain_size
        field_bits = log2_field_size(F)
        loc_coset_size = 2.0 ** self.localization_parameters[0]
        if soundness_type == FRISoundnessType.proven:
            term2 = (1 - 3 * rate - loc_coset_size / math.sqrt(codeword_domain_size)) / 4
            self.effective_proximity = min(frac_prox, term2)
            denom = math.log2(1 - self.effective_proximity)
            self.num_query_repetitions = max(
                1, int(math.ceil(-query_soundness_bits / denom)))
            per_interaction = math.log2(3) + codeword_domain_dim - field_bits
            self.num_interactive_repetitions = max(
                1, int(math.ceil(-interactive_soundness_bits / per_interaction)))
        else:
            self.effective_proximity = frac_prox
            denom = math.log2(1 - self.effective_proximity)
            self.num_query_repetitions = max(
                1, int(math.ceil(-query_soundness_bits / denom)))
            per_interaction = math.log2(loc_coset_size - 1.0) - field_bits
            self.num_interactive_repetitions = max(
                1, int(math.ceil(-interactive_soundness_bits / per_interaction)))

    @staticmethod
    def localization_parameter_to_array(localization_parameter: int,
                                        codeword_domain_dim: int,
                                        RS_extra_dimensions: int) -> List[int]:
        """[1, eta, eta, ...] until the final domain has dimension ~RS_extra
        (fri_ldt.tcc:132-160 behavior: first round always 1)."""
        num_reductions = max(1, (codeword_domain_dim - RS_extra_dimensions - 1)
                             // localization_parameter)
        return [1] + [localization_parameter] * (num_reductions - 1) \
            if localization_parameter > 0 else [1]

    @staticmethod
    def next_testable_degree_bound(degree: int, localization_parameters: List[int]) -> int:
        m = 1 << sum(localization_parameters)
        return -(-degree // m) * m


# ---------------------------------------------------------------------------
# multiplicative fold — batched + jitted: one compiled call per (domain, eta),
# the challenge enters as a device scalar so eta=3-4 folds cost ONE dispatch
# instead of O(c^2) eager chains (fri_aux.tcc:107-250 semantics)
# ---------------------------------------------------------------------------
_FOLD_FN_CACHE = {}


def _build_fold_fn(F, domain: MultiplicativeCoset, eta: int):
    import functools
    import jax
    from ..algebra.domains import _powers_doubling
    from ..algebra.fft import _INGRAPH_CONST_N, _device_powers_of

    c = 1 << eta
    N = domain.order
    nc = N // c
    p = F.p
    g_inv = pow(pow(F.root_of_unity, 1 << (F.two_adicity - eta), p), p - 2, p)
    c_inv = pow(c, p - 2, p)
    # static host tables (numpy — cache-safe): intra-coset inverse-NTT rows
    # (1/c) g^{-tk}; the per-t output twiddles G^{-jt} = (G^{-t})^j are (L, nc)
    # EACH — at 2^20+ they are computed in-graph from the scalar G^{-t}
    # (closure constants inline into the HLO; see algebra/fft.py notes)
    rows = np.stack([F.from_ints_np(
        [pow(g_inv, (t * k) % c, p) * c_inv % p for k in range(c)])
        for t in range(c)], axis=1)                      # (L, c_t, c_k)
    big = N >= _INGRAPH_CONST_N
    G_inv = pow(domain.g, p - 2, p)
    if not big:
        Winv = np.asarray(domain.inverse_generator_powers())  # (L, N)
        tw_host = [Winv[:, (np.arange(nc) * t) % N] for t in range(c)]
    shift_inv = F.from_ints_np([pow(domain.shift, p - 2, p)])

    def fold(evals, x):
        v = evals.reshape(F.L, c, nc)
        x_over_shift = F.mul(x.reshape(F.L, 1),
                             jnp.asarray(shift_inv).reshape(F.L, 1))
        xpow = _powers_doubling(F, x_over_shift.reshape(F.L), c)  # (L, c)
        acc = None
        for t in range(c):
            m = F.mul(v, jnp.asarray(rows[:, t, :])[:, :, None])  # (L,c,nc)
            a_t = F.lazy_sum_reduce(jnp.sum(m, axis=1))           # (L,nc)
            tw_t = _device_powers_of(F, pow(G_inv, t, p), nc) if big \
                else jnp.asarray(tw_host[t])
            term = F.mul(F.mul(a_t, tw_t), xpow[:, t:t + 1])
            acc = term if acc is None else acc + term  # lazy limb accumulation
        return F.lazy_sum_reduce(acc)

    return jax.jit(fold)


def fold_codeword(F, evals, domain: MultiplicativeCoset, eta: int, x_int: int):
    """One FRI reduction of a natural-order codeword (see module docstring).
    Returns the folded (L, N/2^eta) codeword over q(domain), q(x)=x^{2^eta}:
    restricted to coset {h_j g^k}, f = p_j(u) with intra-coset inverse-NTT
    coefficients a_t[j], and the folded value is p_j(x/h_j)."""
    key = (F.name, domain._key(), eta)
    fn = _FOLD_FN_CACHE.get(key)
    if fn is None:
        fn = _FOLD_FN_CACHE[key] = _build_fold_fn(F, domain, eta)
    x = F.from_ints([x_int]).reshape(F.L)
    return fn(evals, x)


_COSET_INTERP_CONSTS = {}


def interpolate_coset_at_point_ints(F, coset_values: List[int],
                                    coset_shift: int, eta: int, x: int) -> int:
    """Host-int mirror of one multiplicative coset's fold (verifier side).
    The per-(field, eta) constants — the order-2^eta root's power table and
    1/2^eta — are cached so each call costs ONE modular inversion (of the
    coset shift) plus O(c^2) multiplications."""
    c = 1 << eta
    p = F.p
    key = (p, eta)
    consts = _COSET_INTERP_CONSTS.get(key)
    if consts is None:
        g = pow(F.root_of_unity, 1 << (F.two_adicity - eta), p)
        gpows = [pow(g, i, p) for i in range(c)]  # g has order c
        consts = _COSET_INTERP_CONSTS[key] = (gpows, pow(c, p - 2, p))
    gpows, c_inv = consts
    x_over_h = x * pow(coset_shift, p - 2, p) % p
    total = 0
    xt = 1
    for t in range(c):
        a_t = sum(coset_values[k] * gpows[(-t * k) % c]
                  for k in range(c)) * c_inv % p
        total = (total + a_t * xt) % p
        xt = xt * x_over_h % p
    return total


# ---------------------------------------------------------------------------
# additive fold (fri_aux.tcc:37-105 math, fully batched)
# ---------------------------------------------------------------------------
def localizer_vanishing(domain: AffineSubspace, eta: int) -> LinearizedVanishing:
    """Z of the UNSHIFTED localizer subspace span(basis[:eta]) — the FRI
    localizer polynomial (localizer_polynomial.tcc additive branch)."""
    V = AffineSubspace(domain.field, eta, shift=0, basis=domain.basis[:eta])
    return LinearizedVanishing(V)


def _coset_vanishing_offsets(domain: AffineSubspace, eta: int,
                             Z: LinearizedVanishing) -> List[int]:
    """Z_V evaluated at each coset's shift (constant on the coset by
    F2-linearity): nc values in coset-index order, via subset sums over the
    remaining basis vectors."""
    F = domain.field
    z_rest = [Z._eval_linear(Z.linear_coeffs, b) for b in domain.basis[eta:]]
    z_shift = Z.eval_at_point_int(domain.shift)
    return subset_sums_ints(F, z_rest, z_shift)


def fold_codeword_additive(F, evals, domain: AffineSubspace, eta: int,
                           x_int: int):
    """One additive FRI reduction: per contiguous coset C_j, Lagrange
    interpolation at x with coefficients eps^{-1} * Z_{C_j}(x) / (x - e);
    one batched inversion over the whole codeword; masked select handles
    x in the domain exactly (no data-dependent branch)."""
    c = 1 << eta
    N = domain.order
    nc = N // c
    Z = localizer_vanishing(domain, eta)
    eps_inv = F.inv_int(Z.epsilon)
    vp_x = Z.eval_at_point_int(x_int)
    offsets = _coset_vanishing_offsets(domain, eta, Z)
    # scale_j = eps^{-1} * (Z_V(x) ^ Z_V(shift_j))  — host ints, tiny
    scales = [F.mul_ints(eps_inv, vp_x ^ off) for off in offsets]
    scale_arr = jnp.asarray(F.from_ints_np(scales))            # (W, nc)
    elems = jnp.asarray(domain.elements())                     # (W, N)
    x_arr = F.from_ints([x_int]).reshape(F.L, 1)
    D = elems ^ jnp.broadcast_to(x_arr, elems.shape).astype(jnp.uint32)  # x - e
    member = F.is_zero(D)                                      # (N,)
    terms = F.mul(evals, F.inv(D)).reshape(F.L, nc, c)
    lagrange = F.mul(_xor_reduce(terms), scale_arr)            # (W, nc)
    # exact-membership correction: if x == e in coset j, value is f(e)
    sel = _xor_reduce(jnp.where(member[None, :], evals,
                                jnp.zeros_like(evals)).reshape(F.L, nc, c))
    coset_has = jnp.any(member.reshape(nc, c), axis=-1)
    return jnp.where(coset_has[None, :], sel, lagrange)


def _xor_reduce(t):
    """XOR-reduce the trailing axis (char-2 sum) with a log-depth tree."""
    n = t.shape[-1]
    while n > 1:
        t = t[..., : n // 2] ^ t[..., n // 2: 2 * (n // 2)]
        n //= 2
    return t[..., 0]


def interpolate_coset_additive_ints(F, coset_values: List[int],
                                    coset_shift: int, Z: LinearizedVanishing,
                                    basis: List[int], x: int) -> int:
    """Host-int mirror of one additive coset's fold (verifier side).
    basis = the localizer subspace's basis (first eta of the round domain)."""
    c = len(coset_values)
    elems = subset_sums_ints(F, basis, coset_shift)
    for k, e in enumerate(elems):
        if e == x:
            return coset_values[k]
    z_x = Z.eval_at_point_int(x) ^ Z.eval_at_point_int(coset_shift)
    scale = F.mul_ints(F.inv_int(Z.epsilon), z_x)
    total = 0
    for k in range(c):
        total ^= F.mul_ints(coset_values[k], F.inv_int(x ^ elems[k]))
    return F.mul_ints(scale, total)


class FRIProtocol:
    """Multi-FRI: several codewords share challenges and query positions
    (fri_ldt.hpp:38-43).  Domain-generic."""

    def __init__(self, iop: IOPProtocol, params: FRIParameters,
                 codeword_handle, poly_handles: List[OracleHandle]):
        self.iop = iop
        self.F = iop.F
        self.params = params
        self.codeword_handle = codeword_handle
        self.poly_handles = list(poly_handles)
        self.num_reductions = len(params.localization_parameters)
        self._compute_domains()

    def _compute_domains(self):
        F = self.F
        dom0 = self.iop.get_domain(self.codeword_handle)
        self.additive = is_additive(dom0)
        self.domains = [dom0]
        self.localizers: List[Optional[LinearizedVanishing]] = []
        if self.additive:
            dom = dom0
            for eta in self.params.localization_parameters:
                Z = localizer_vanishing(dom, eta)
                self.localizers.append(Z)
                next_basis = [Z._eval_linear(Z.linear_coeffs, b)
                              for b in dom.basis[eta:]]
                next_shift = Z.eval_at_point_int(dom.shift)
                dom = AffineSubspace(F, dom.dim - eta, shift=next_shift,
                                     basis=next_basis)
                self.domains.append(dom)
        else:
            shift, dim = dom0.shift, dom0.dim
            for eta in self.params.localization_parameters:
                self.localizers.append(None)
                shift = pow(shift, 1 << eta, F.p)
                dim -= eta
                self.domains.append(MultiplicativeCoset(F, dim, shift))

    def _localizer_map_int(self, i: int, s: int) -> int:
        """q^(i)(s): the i-th round's localizer polynomial at a host int."""
        if self.additive:
            return self.localizers[i].eval_at_point_int(s)
        return self.F.pow_int(s, 1 << self.params.localization_parameters[i])

    # -- registration ------------------------------------------------------
    def register_interactions(self):
        ni = self.params.num_interactive_repetitions
        etas = self.params.localization_parameters
        self.domain_handles = [self.codeword_handle]
        # oracle_handles[i][j][ldt]: round i, interaction j, codeword ldt
        self.oracle_handles: List[List[List[OracleHandle]]] = [
            [list(self.poly_handles)]]
        self.challenge_handles = [
            [self.iop.register_verifier_random_message(1) for _ in range(ni)]]
        total_loc = etas[0]
        for i in range(1, self.num_reductions):
            total_loc += etas[i]
            degree_bound = self.params.poly_degree_bound >> sum(etas[:i])
            dh = self.iop.register_domain(self.domains[i])
            per_interaction = []
            for j in range(ni):
                per_interaction.append([
                    self.iop.register_oracle(dh, degree_bound, make_zk=False)
                    for _ in self.poly_handles])
            self.iop.set_round_parameters(RoundParameters(
                quotient_map_size=1 << etas[i]))
            self.domain_handles.append(dh)
            self.oracle_handles.append(per_interaction)
            self.challenge_handles.append(
                [self.iop.register_verifier_random_message(1) for _ in range(ni)])
        self.final_degree_bound = self.params.poly_degree_bound >> sum(etas)
        self.final_poly_handles = [
            [self.iop.register_prover_message(max(1, self.final_degree_bound))
             for _ in self.poly_handles]
            for _ in range(ni)]

    def register_queries(self):
        etas = self.params.localization_parameters
        self.query_sets = []
        for q in range(self.params.num_query_repetitions):
            s0 = self.iop.register_random_query_position(self.domain_handles[0])
            coset_handles = []
            s_handle = s0
            for i in range(self.num_reductions):
                dom = self.domains[i]
                c = 1 << etas[i]
                handles = [self.iop.register_deterministic_query_position(
                    [s_handle],
                    (lambda s, k=k, dom=dom, c=c: dom.position_by_coset_indices(
                        dom.coset_index(s, c), k, c)))
                    for k in range(c)]
                coset_handles.append(handles)
                # next round's position = this round's coset index
                s_handle = self.iop.register_deterministic_query_position(
                    [s_handle], (lambda s, dom=dom, c=c: dom.coset_index(s, c)))
            for j in range(self.params.num_interactive_repetitions):
                for ldt in range(len(self.poly_handles)):
                    qset = {
                        "s0": s0, "interaction": j, "ldt": ldt,
                        "coset_queries": []}
                    for i in range(self.num_reductions):
                        ji = 0 if i == 0 else j
                        qset["coset_queries"].append([
                            self.iop.register_query(
                                self.oracle_handles[i][ji][ldt], ph)
                            for ph in coset_handles[i]])
                    self.query_sets.append(qset)

    # -- proving -----------------------------------------------------------
    def calculate_and_submit_proof(self):
        F = self.F
        ni = self.params.num_interactive_repetitions
        etas = self.params.localization_parameters
        from ..utils.profiling import PROFILER
        with PROFILER.block("fri_combine_inputs"):
            # evaluating the LDT-combined virtual oracle(s) over the full
            # codeword domain — the largest single computation in the LDT.
            # Fused: the whole constituent DAG (rowcheck, lincheck q,
            # sumcheck g, RLC, degree bumps) collapses into ONE jitted
            # dispatch; eager per-op dispatch through the remote tunnel cost
            # 0.23-0.63 s/prove (round-4 profiles).
            base_evals = self.iop.get_fused_oracle_evaluations(
                self.poly_handles)
            for ev in base_evals:
                if hasattr(ev, "block_until_ready"):
                    ev.block_until_ready()
        per_interaction = [list(base_evals) for _ in range(ni)]
        fold = fold_codeword_additive if self.additive else fold_codeword
        for i in range(self.num_reductions):
            if i > 0:
                with PROFILER.block(f"fri_round{i}_commit"):
                    for j in range(ni):
                        for ldt, ev in enumerate(per_interaction[j]):
                            self.iop.submit_oracle(
                                self.oracle_handles[i][j][ldt], ev)
                    self.iop.signal_prover_round_done()
            with PROFILER.block(f"fri_round{i}_fold"):
                for j in range(ni):
                    x_i = self.iop.obtain_verifier_random_message(
                        self.challenge_handles[i][j])[0]
                    per_interaction[j] = [
                        fold(F, ev, self.domains[i], etas[i], x_i)
                        for ev in per_interaction[j]]
        final_domain = self.domains[self.num_reductions]
        with PROFILER.block("fri_final_poly"):
            for j in range(ni):
                for ldt, ev in enumerate(per_interaction[j]):
                    coeffs = ifft_known_any(ev, final_domain,
                                            final_domain.order)
                    ints = [int(v) for v in
                            F.to_ints(coeffs[:, :max(1, self.final_degree_bound)])]
                    self.iop.submit_prover_message(
                        self.final_poly_handles[j][ldt], ints)
        with PROFILER.block("fri_final_commit"):
            self.iop.signal_prover_round_done()

    # -- verification ------------------------------------------------------
    def verifier_predicate(self) -> bool:
        from ..utils.profiling import PROFILER
        ok = True
        with PROFILER.block("fri_verifier_queries"):
            for qset in self.query_sets:
                if not self._predicate_for_query_set(qset):
                    ok = False
        return ok

    def _predicate_for_query_set(self, qset) -> bool:
        F = self.F
        etas = self.params.localization_parameters
        s_idx = self.iop.obtain_query_position(qset["s0"])
        s = self.domains[0].element_by_index_int(s_idx)
        last_interp = None
        for i in range(self.num_reductions):
            x_i = self.iop.obtain_verifier_random_message(
                self.challenge_handles[i][qset["interaction"]])[0]
            c = 1 << etas[i]
            dom = self.domains[i]
            si_j = dom.coset_index(s_idx, c)
            si_k = dom.intra_coset_index(s_idx, c)
            coset_vals = [self.iop.obtain_query_response(qh)
                          for qh in qset["coset_queries"][i]]
            if i > 0 and last_interp != coset_vals[si_k]:
                return False
            coset_shift = dom.element_by_index_int(
                dom.position_by_coset_indices(si_j, 0, c))
            if self.additive:
                last_interp = interpolate_coset_additive_ints(
                    F, coset_vals, coset_shift, self.localizers[i],
                    dom.basis[:etas[i]], x_i)
            else:
                last_interp = interpolate_coset_at_point_ints(
                    F, coset_vals, coset_shift, etas[i], x_i)
            s = self._localizer_map_int(i, s)
            s_idx = si_j
        final_coeffs = self.iop.receive_prover_message(
            self.final_poly_handles[qset["interaction"]][qset["ldt"]])
        val = 0
        for cf in reversed(final_coeffs):
            val = F.add_ints(F.mul_ints(val, s), cf)
        return val == last_interp
    # NOTE on chain consistency (fri_ldt.tcc:574-642): the verifier checks
    # that round i+1's revealed value at the coset-index position equals the
    # interpolation computed from round i's coset — this requires
    # element_by_index_int(coset_index) of domain i+1 to equal
    # q^(i)(coset representative), which the domain-chain construction
    # guarantees for both families.
