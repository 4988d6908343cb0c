"""The IOP runtime: registration/execution engine for Interactive Oracle Proofs.

Counterpart of libiop/iop/iop.{hpp,tcc} (the ``iop_protocol`` state machine)
with the same architectural trick: protocol objects (L4) drive this engine;
the base class doubles as an *interactive simulator* (fresh randomness —
iop.tcc:436-466, 769-776), and the BCS prover/verifier (L5) subclass it to
supply Fiat–Shamir randomness instead.  Round bookkeeping follows the
reference: a prover registration after verifier registrations begins a new
round (iop.tcc:37-63); holographic index oracles form round 0
(iop.tcc:107-125); ``round_parameters`` carry the BCS coset-serialization
hint (iop.hpp:261-285).

TPU division of labor:
* oracle contents = device arrays (L, N) in Montgomery form (prover side,
  vectorized, jit-compatible);
* pointwise query evaluation = host Python ints mod p (verifier side, tiny);
  virtual oracles therefore implement BOTH ``evaluated_contents`` (device)
  and ``evaluation_at_point`` (host ints), mirroring the dual interface of
  libiop/iop/oracles.hpp:21-94.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset


# ---------------------------------------------------------------------------
# handles
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DomainHandle:
    id: int


@dataclasses.dataclass(frozen=True)
class OracleHandle:
    id: int
    virtual: bool = False


@dataclasses.dataclass(frozen=True)
class ProverMessageHandle:
    id: int


@dataclasses.dataclass(frozen=True)
class VerifierMessageHandle:
    id: int


@dataclasses.dataclass(frozen=True)
class QueryPositionHandle:
    id: int


@dataclasses.dataclass(frozen=True)
class QueryHandle:
    id: int


# ---------------------------------------------------------------------------
# registrations
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class OracleRegistration:
    domain: DomainHandle
    degree_bound: int
    make_zk: bool
    round: int
    is_index: bool = False


@dataclasses.dataclass
class VirtualOracleRegistration:
    domain: DomainHandle
    degree_bound: int
    constituents: List[OracleHandle]
    oracle: "VirtualOracle"


@dataclasses.dataclass
class ProverMessageRegistration:
    size: int
    round: int


@dataclasses.dataclass
class VerifierMessageRegistration:
    size: int
    round: int  # squeezed after this round's prover data is absorbed


@dataclasses.dataclass
class RoundParameters:
    """BCS leaf-serialization hint (iop.hpp:261-285): leaves of this round's
    Merkle trees pack whole cosets of this size."""
    quotient_map_size: int = 1


class VirtualOracle:
    """Interface: a polynomial defined from constituent oracles.

    Subclasses implement the dual interface (prover-vectorized and
    verifier-pointwise); both must agree pointwise (tested via the
    ``test_oracle_consistency`` pattern of tests/protocols/utilities.cpp)."""

    def evaluated_contents(self, constituent_evals: List[jax.Array]) -> jax.Array:
        raise NotImplementedError

    def evaluation_at_point(self, position: int, point_int: int,
                            constituent_values: List[int]) -> int:
        raise NotImplementedError

    def prefetch_points(self, positions: List[int], points: List[int]):
        """Optional batch hook: called once with EVERY position this oracle
        will be point-queried at (before any ``evaluation_at_point`` call),
        so oracles whose pointwise math needs device work (e.g. the lincheck
        p_alpha Horner) can run ONE batched dispatch + ONE device->host
        transfer instead of per-point round-trips — critical over a
        high-latency device tunnel."""

    # -- fused-DAG tracing interface (optional) ----------------------------
    # Eager `evaluated_contents` costs one tunnel dispatch per jnp op; a DAG
    # of virtual oracles (the LDT-combined codeword) costs dozens.  Oracles
    # that implement the triple below can be collapsed into ONE jitted
    # dispatch by `IOPProtocol.get_fused_oracle_evaluations`:
    #   * traced_aux(): every challenge-dependent or large-constant device
    #     array the computation needs, as a list (traced ARGUMENTS — never
    #     close over device arrays inside traced_contents: closure arrays
    #     bake into the HLO as constants, so each new challenge would be a
    #     new graph and a guaranteed remote-compile cache miss);
    #   * traced_contents(aux, constituent_evals): the pure computation;
    #   * traced_sig(): static structure key (the jit is cached per
    #     (field, DAG structure, shapes) across proofs).
    def traced_aux(self) -> Optional[List[jax.Array]]:
        """Return the aux device arrays, or None if this oracle does not
        support fused tracing (callers fall back to eager evaluation)."""
        return None

    def traced_sig(self) -> tuple:
        return ()

    def traced_contents(self, aux: List[jax.Array],
                        constituent_evals: List[jax.Array]) -> jax.Array:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------
#: process-global fused-DAG executables, keyed by (field, structure, shapes) —
#: reused across proofs so a proof after the first pays zero tracing/compiling
_FUSED_DAG_JITS: Dict[tuple, Callable] = {}


class IOPProtocol:
    """Base engine = interactive simulation (prover and verifier in-process,
    fresh randomness).  BCS subclasses override `_fresh_verifier_randomness`,
    `_fresh_query_position` and `signal_prover_round_done`."""

    def __init__(self, field: PrimeField, seed: int = 0):
        self.F = field
        self._rng = np.random.default_rng(seed ^ 0x5DEECE66D)
        # registration state
        self.domains: List[MultiplicativeCoset] = []
        self.oracle_regs: List[OracleRegistration] = []
        self.virtual_regs: List[VirtualOracleRegistration] = []
        self.prover_msg_regs: List[ProverMessageRegistration] = []
        self.verifier_msg_regs: List[VerifierMessageRegistration] = []
        self.round_params: Dict[int, RoundParameters] = {}
        self._current_round = 0
        self._last_was_verifier = False
        self._has_index_round = False
        self._interactions_sealed = False
        # query registration state
        self.qpos_regs: List[Tuple[str, object]] = []  # ("random", domain_h) | ("det", (deps, fn))
        self.query_regs: List[Tuple[OracleHandle, QueryPositionHandle]] = []
        self._queries_sealed = False
        # execution state
        self.oracle_evals: Dict[int, Optional[jax.Array]] = {}
        self.prover_messages: Dict[int, List[int]] = {}
        self.verifier_messages: Dict[int, List[int]] = {}
        self._virtual_evals_cache: Dict[int, jax.Array] = {}
        self._pointwise_cache: Dict[Tuple[int, bool, int], int] = {}
        self._qpos_values: Dict[int, int] = {}
        self._rounds_done = 0
        self._pending_round_oracles: List[int] = []

    # -- registration phase ------------------------------------------------
    def register_domain(self, domain: MultiplicativeCoset) -> DomainHandle:
        for i, d in enumerate(self.domains):
            if d == domain:
                return DomainHandle(i)
        self.domains.append(domain)
        return DomainHandle(len(self.domains) - 1)

    def get_domain(self, h: DomainHandle) -> MultiplicativeCoset:
        return self.domains[h.id]

    def _flip_to_prover(self):
        assert not self._interactions_sealed
        if self._last_was_verifier:
            self._current_round += 1
            self._last_was_verifier = False

    def register_index_oracle(self, domain_h: DomainHandle,
                              degree_bound: int) -> OracleHandle:
        """Holographic round-0 oracle (iop.tcc:107-125); must precede all
        normal registrations."""
        assert self._current_round == 0 and not self._last_was_verifier
        assert all(r.is_index for r in self.oracle_regs)
        self._has_index_round = True
        self.oracle_regs.append(OracleRegistration(
            domain_h, degree_bound, make_zk=False, round=0, is_index=True))
        return OracleHandle(len(self.oracle_regs) - 1)

    def register_oracle(self, domain_h: DomainHandle, degree_bound: int,
                        make_zk: bool = False) -> OracleHandle:
        self._flip_to_prover()
        if self._has_index_round and self._current_round == 0:
            self._current_round = 1  # round 0 is reserved for the index
        self.oracle_regs.append(OracleRegistration(
            domain_h, degree_bound, make_zk, round=self._current_round))
        return OracleHandle(len(self.oracle_regs) - 1)

    def register_virtual_oracle(self, domain_h: DomainHandle, degree_bound: int,
                                constituents: Sequence[OracleHandle],
                                oracle: VirtualOracle) -> OracleHandle:
        self.virtual_regs.append(VirtualOracleRegistration(
            domain_h, degree_bound, list(constituents), oracle))
        return OracleHandle(len(self.virtual_regs) - 1, virtual=True)

    def register_prover_message(self, size: int) -> ProverMessageHandle:
        self._flip_to_prover()
        if self._has_index_round and self._current_round == 0:
            self._current_round = 1
        self.prover_msg_regs.append(
            ProverMessageRegistration(size, self._current_round))
        return ProverMessageHandle(len(self.prover_msg_regs) - 1)

    def register_verifier_random_message(self, size: int) -> VerifierMessageHandle:
        assert not self._interactions_sealed
        self._last_was_verifier = True
        self.verifier_msg_regs.append(
            VerifierMessageRegistration(size, self._current_round))
        return VerifierMessageHandle(len(self.verifier_msg_regs) - 1)

    def set_round_parameters(self, params: RoundParameters, round: Optional[int] = None):
        rnd = self._current_round if round is None else round
        self.round_params[rnd] = params

    def get_round_parameters(self, round: int) -> RoundParameters:
        return self.round_params.get(round, RoundParameters())

    def seal_interaction_registrations(self):
        assert not self._interactions_sealed
        self._interactions_sealed = True
        self.num_interaction_rounds = self._current_round + 1

    # -- query registration phase -----------------------------------------
    def register_random_query_position(self, domain_h: DomainHandle) -> QueryPositionHandle:
        assert self._interactions_sealed and not self._queries_sealed
        self.qpos_regs.append(("random", domain_h))
        return QueryPositionHandle(len(self.qpos_regs) - 1)

    def register_deterministic_query_position(
            self, deps: Sequence[QueryPositionHandle],
            fn: Callable[..., int]) -> QueryPositionHandle:
        assert self._interactions_sealed and not self._queries_sealed
        self.qpos_regs.append(("det", (list(deps), fn)))
        return QueryPositionHandle(len(self.qpos_regs) - 1)

    def register_query(self, oracle_h: OracleHandle,
                       pos_h: QueryPositionHandle) -> QueryHandle:
        assert self._interactions_sealed and not self._queries_sealed
        self.query_regs.append((oracle_h, pos_h))
        return QueryHandle(len(self.query_regs) - 1)

    def seal_query_registrations(self):
        self._queries_sealed = True

    # -- execution: prover side -------------------------------------------
    def submit_oracle(self, handle: OracleHandle, evals: jax.Array):
        assert not handle.virtual
        reg = self.oracle_regs[handle.id]
        dom = self.get_domain(reg.domain)
        assert evals.shape == (self.F.L, dom.num_elements()), (
            evals.shape, dom.num_elements())
        expected_round = self._rounds_done
        assert reg.round == expected_round, (
            f"oracle for round {reg.round} submitted during round {expected_round}")
        # under an active device-mesh context, oracles shard over the
        # codeword axis (GSPMD then shards every downstream op)
        from ..parallel.mesh import maybe_shard_codeword
        self.oracle_evals[handle.id] = maybe_shard_codeword(evals)
        self._pending_round_oracles.append(handle.id)

    def submit_prover_message(self, handle: ProverMessageHandle, values: List[int]):
        reg = self.prover_msg_regs[handle.id]
        assert len(values) == reg.size
        assert reg.round == self._rounds_done
        self.prover_messages[handle.id] = [self.F.sample_int(int(v))
                                           for v in values]

    def signal_prover_round_done(self):
        """Validate completeness of the round; subclasses add MT+hashchain."""
        rnd = self._rounds_done
        for i, reg in enumerate(self.oracle_regs):
            if reg.round == rnd and i not in self.oracle_evals:
                raise RuntimeError(f"oracle {i} of round {rnd} not submitted")
        for i, reg in enumerate(self.prover_msg_regs):
            if reg.round == rnd and i not in self.prover_messages:
                raise RuntimeError(f"prover message {i} of round {rnd} not submitted")
        self._pending_round_oracles = []
        self._rounds_done += 1

    # -- verifier randomness ----------------------------------------------
    def _fresh_verifier_randomness(self, size: int, index: int) -> List[int]:
        return self.F.random_ints(size, self._rng)

    def obtain_verifier_random_message(self, handle: VerifierMessageHandle) -> List[int]:
        if handle.id in self.verifier_messages:
            return self.verifier_messages[handle.id]
        reg = self.verifier_msg_regs[handle.id]
        assert reg.round < self._rounds_done, (
            "verifier randomness requested before its round was completed")
        vals = self._fresh_verifier_randomness(reg.size, handle.id)
        self.verifier_messages[handle.id] = vals
        return vals

    def receive_prover_message(self, handle: ProverMessageHandle) -> List[int]:
        return self.prover_messages[handle.id]

    # -- oracle access: vectorized ----------------------------------------
    def get_oracle_domain(self, handle: OracleHandle) -> MultiplicativeCoset:
        reg = (self.virtual_regs[handle.id] if handle.virtual
               else self.oracle_regs[handle.id])
        return self.get_domain(reg.domain)

    def get_oracle_degree_bound(self, handle: OracleHandle) -> int:
        reg = (self.virtual_regs[handle.id] if handle.virtual
               else self.oracle_regs[handle.id])
        return reg.degree_bound

    def get_oracle_evaluations(self, handle: OracleHandle) -> jax.Array:
        if not handle.virtual:
            ev = self.oracle_evals.get(handle.id)
            if ev is None:
                raise RuntimeError(f"oracle {handle.id} has no submitted contents")
            return ev
        if handle.id in self._virtual_evals_cache:
            return self._virtual_evals_cache[handle.id]
        reg = self.virtual_regs[handle.id]
        constituent_evals = [self.get_oracle_evaluations(c) for c in reg.constituents]
        ev = reg.oracle.evaluated_contents(constituent_evals)
        self._virtual_evals_cache[handle.id] = ev
        return ev

    def get_fused_oracle_evaluations(self, handles: Sequence[OracleHandle]
                                     ) -> List[jax.Array]:
        """Evaluate several virtual oracles' constituent DAGs in ONE jitted
        device dispatch (vs one tunnel round-trip per eager jnp op — the
        round-4 profile showed the eager DAG walk costing 0.23-0.63 s per
        prove as `fri_combine_inputs`).

        Requirements: every uncached virtual node in the DAGs implements the
        traced_* interface.  Falls back to per-handle eager evaluation
        otherwise.  The jitted program is cached process-globally per
        (field, DAG structure, leaf/aux shapes) — challenge data flows in
        through `traced_aux` arguments, so repeated proofs of one shape hit
        the same compiled executable."""
        roots = list(handles)
        order: List[int] = []          # virtual ids in postorder
        node_cons: List[List[tuple]] = []  # per node: ("leaf"/"v", index)
        leaf_keys: List[tuple] = []    # ("r", oracle_id) | ("vc", virt_id)
        leaf_index: Dict[tuple, int] = {}
        vindex: Dict[int, int] = {}
        fusable = True

        def leaf(key) -> tuple:
            idx = leaf_index.get(key)
            if idx is None:
                idx = leaf_index[key] = len(leaf_keys)
                leaf_keys.append(key)
            return ("leaf", idx)

        def walk(h: OracleHandle):
            nonlocal fusable
            if not fusable:
                return ("leaf", 0)
            if not h.virtual:
                return leaf(("r", h.id))
            if h.id in self._virtual_evals_cache:
                return leaf(("vc", h.id))
            if h.id in vindex:
                return ("v", vindex[h.id])
            reg = self.virtual_regs[h.id]
            cons = [walk(c) for c in reg.constituents]
            if reg.oracle.traced_aux() is None:
                fusable = False
                return ("leaf", 0)
            vindex[h.id] = len(order)
            order.append(h.id)
            node_cons.append(cons)
            return ("v", vindex[h.id])

        root_keys = [walk(h) for h in roots]
        if not fusable or not order:
            return [self.get_oracle_evaluations(h) for h in roots]
        leaves = [self.oracle_evals[k[1]] if k[0] == "r"
                  else self._virtual_evals_cache[k[1]] for k in leaf_keys]
        oracles = [self.virtual_regs[vid].oracle for vid in order]
        auxes = [o.traced_aux() for o in oracles]
        sig = (self.F.name,
               tuple((type(o).__qualname__, o.traced_sig(), tuple(cons))
                     for o, cons in zip(oracles, node_cons)),
               tuple(root_keys),
               tuple(tuple(x.shape) for x in leaves),
               tuple(tuple(tuple(a.shape) for a in ax) for ax in auxes))
        fn = _FUSED_DAG_JITS.get(sig)
        if fn is None:
            cons_static = [list(c) for c in node_cons]
            roots_static = list(root_keys)

            def run(leaves_in, auxes_in):
                vals: List[jax.Array] = []
                for k in range(len(oracles)):
                    cv = [leaves_in[j] if kind == "leaf" else vals[j]
                          for kind, j in cons_static[k]]
                    vals.append(oracles[k].traced_contents(auxes_in[k], cv))
                return tuple(leaves_in[j] if kind == "leaf" else vals[j]
                             for kind, j in roots_static)

            fn = _FUSED_DAG_JITS[sig] = jax.jit(run)
        results = list(fn(leaves, auxes))
        for h, res in zip(roots, results):
            if h.virtual:
                self._virtual_evals_cache[h.id] = res
        return results

    # -- oracle access: pointwise (host ints) ------------------------------
    def prefetch_query_point_evals(self):
        """Resolve every registered query's position, propagate positions
        down each virtual oracle's constituent DAG, and hand each virtual
        oracle its full position set via ``prefetch_points`` in one batch.
        Runs lazily before the first pointwise virtual-oracle read (all
        challenges are set by then — queries follow the final round)."""
        from ..utils.profiling import PROFILER
        self._prefetched_points = True
        with PROFILER.block("prefetch_point_evals"):
            self._prefetch_query_point_evals()

    def _prefetch_query_point_evals(self):
        pos_by_vid: Dict[int, set] = {}

        def collect(h: OracleHandle, pos: int):
            if not h.virtual:
                return
            pos_by_vid.setdefault(h.id, set()).add(pos)
            for c in self.virtual_regs[h.id].constituents:
                collect(c, pos)

        for oracle_h, pos_h in self.query_regs:
            collect(oracle_h, self.obtain_query_position(pos_h))
        for vid, poss in pos_by_vid.items():
            reg = self.virtual_regs[vid]
            dom = self.get_domain(reg.domain)
            ordered = sorted(poss)
            reg.oracle.prefetch_points(
                ordered, [dom.element_by_index_int(p) for p in ordered])

    def get_oracle_evaluation_at_position(self, handle: OracleHandle,
                                          position: int) -> int:
        if handle.virtual and not getattr(self, "_prefetched_points", False):
            self.prefetch_query_point_evals()
        key = (handle.id, handle.virtual, position)
        if key in self._pointwise_cache:
            return self._pointwise_cache[key]
        if not handle.virtual:
            ev = self.oracle_evals.get(handle.id)
            if ev is None:
                raise RuntimeError(f"oracle {handle.id} has no contents")
            from ..parallel.mesh import fetch_column
            val = int(self.F.to_ints(fetch_column(ev, position))[0])
        else:
            reg = self.virtual_regs[handle.id]
            dom = self.get_domain(reg.domain)
            cvals = [self.get_oracle_evaluation_at_position(c, position)
                     for c in reg.constituents]
            val = reg.oracle.evaluation_at_point(
                position, dom.element_by_index_int(position), cvals)
            val = self.F.sample_int(val)
        self._pointwise_cache[key] = val
        return val

    # -- query execution ---------------------------------------------------
    def _fresh_query_position(self, domain_size: int, index: int) -> int:
        return int(self._rng.integers(0, domain_size))

    def obtain_query_position(self, handle: QueryPositionHandle) -> int:
        if handle.id in self._qpos_values:
            return self._qpos_values[handle.id]
        kind, payload = self.qpos_regs[handle.id]
        if kind == "random":
            dom = self.get_domain(payload)
            pos = self._fresh_query_position(dom.num_elements(), handle.id)
        else:
            deps, fn = payload
            dep_vals = [self.obtain_query_position(d) for d in deps]
            pos = int(fn(*dep_vals))
        self._qpos_values[handle.id] = pos
        return pos

    def obtain_query_response(self, handle: QueryHandle) -> int:
        oracle_h, pos_h = self.query_regs[handle.id]
        pos = self.obtain_query_position(pos_h)
        return self.get_oracle_evaluation_at_position(oracle_h, pos)
