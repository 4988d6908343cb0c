"""BCS prover: the Fiat–Shamir side of the IOP engine.

Counterpart of libiop/bcs/bcs_prover.{hpp,tcc}: overrides
``signal_prover_round_done`` to build one Merkle tree per (round, domain),
absorb roots + messages into the hashchain and squeeze the round's verifier
randomness (bcs_prover.tcc:23-60); solves the pow after the last round
(bcs_prover.tcc:52-59); ``get_transcript`` replays every registered query
(virtual-oracle recursion included), collects the needed real-oracle
positions per tree, and builds pruned multi-proofs (bcs_prover.tcc:136-233).
"""
from __future__ import annotations

from typing import Dict, List, Set, Tuple

from ..fields.prime import PrimeField
from ..iop.runtime import IOPProtocol, OracleHandle
from .common import BCSParameters, BCSTranscript, MTProof, serialize_leaf_blocks
from .merkle import MerkleTree


class BCSProver(IOPProtocol):
    def __init__(self, field: PrimeField, params: BCSParameters):
        super().__init__(field)
        self.params = params
        self.hasher = params.make_hasher(field)
        self.hashchain = params.make_hashchain(field)
        self.pow = params.make_pow()
        self.merkle_trees: Dict[Tuple[int, int], MerkleTree] = {}
        self.mt_oracle_ids: Dict[Tuple[int, int], List[int]] = {}
        self.mt_leaf_blocks: Dict[Tuple[int, int], List[bytes]] = {}
        self.mt_roots: Dict[Tuple[int, int], bytes] = {}
        self.pow_nonce = 0
        self._preloaded_trees = None

    def preload_index_trees(self, mt_data: Dict[Tuple[int, int], tuple]):
        """Install persisted round-0 Merkle data {(0, dom_id): (leaf_blocks,
        nodes)} so proving skips index serialization + hashing entirely
        (bcs_prover.tcc:11-21 preprocessing mode)."""
        self._preloaded_trees = dict(mt_data)

    # -- round finalization ------------------------------------------------
    def _round_oracle_groups(self, rnd: int) -> List[Tuple[int, List[int]]]:
        """[(domain_id, [oracle ids]) ...] for a round, domains ascending,
        oracle ids ascending (the canonical MT grouping)."""
        groups: Dict[int, List[int]] = {}
        for i, reg in enumerate(self.oracle_regs):
            if reg.round == rnd:
                groups.setdefault(reg.domain.id, []).append(i)
        return sorted((d, sorted(ids)) for d, ids in groups.items())

    def signal_prover_round_done(self):
        rnd = self._rounds_done
        super().signal_prover_round_done()  # validates submissions
        rp = self.get_round_parameters(rnd)
        for dom_id, oracle_ids in self._round_oracle_groups(rnd):
            dom = self.domains[dom_id]
            preloaded = (self._preloaded_trees or {}).get((rnd, dom_id))
            if preloaded is not None:
                blocks, nodes = preloaded
                mt = MerkleTree.from_nodes(
                    self.hasher, len(blocks), nodes)
            else:
                from ..utils.profiling import PROFILER
                evals = [self.oracle_evals[i] for i in oracle_ids]
                make_zk = any(self.oracle_regs[i].make_zk for i in oracle_ids)
                dev = None
                salts = None
                if getattr(self.hasher, "name", "") == "blake2b":
                    # device-BLAKE2b path: leaves hashed in HBM, digests-only
                    # d2h; blocks fetched lazily for the queried positions.
                    # zk trees: salts are drawn host-side (secret randomness
                    # never derives from device state), shipped to HBM once
                    # and appended to each leaf inside the same dispatch
                    # (merkle_tree.tcc:37-67 semantics)
                    from .common import device_leaf_digests
                    salt_blob = None
                    if make_zk:
                        import secrets
                        sb = self.hasher.salt_bytes
                        nl = dom.num_elements() // rp.quotient_map_size
                        salt_blob = secrets.token_bytes(nl * sb)
                        salts = [salt_blob[i * sb:(i + 1) * sb]
                                 for i in range(nl)]
                    with PROFILER.block(f"leaf_hash_dev_r{rnd}_d{dom_id}"):
                        dev = device_leaf_digests(
                            self.F, evals, dom, rp.quotient_map_size,
                            self.hasher.digest_bytes, salts=salt_blob,
                            build_tree=True)
                if dev is not None:
                    root, heap_dev, blocks = dev
                    with PROFILER.block(f"merkle_tree_r{rnd}_d{dom_id}"):
                        nl = dom.num_elements() // rp.quotient_map_size
                        mt = MerkleTree.from_device_heap(
                            self.hasher, nl, heap_dev, root, salts=salts)
                else:
                    with PROFILER.block(f"leaf_serialize_r{rnd}_d{dom_id}"):
                        blocks = serialize_leaf_blocks(
                            self.F, evals, dom, rp.quotient_map_size)
                    with PROFILER.block(f"merkle_hash_r{rnd}_d{dom_id}"):
                        mt = MerkleTree(self.hasher, blocks, make_zk=make_zk)
            self.merkle_trees[(rnd, dom_id)] = mt
            self.mt_oracle_ids[(rnd, dom_id)] = oracle_ids
            self.mt_leaf_blocks[(rnd, dom_id)] = blocks
            self.mt_roots[(rnd, dom_id)] = mt.root
            self.hashchain.absorb_root(mt.root)
        # absorb this round's prover messages (zero-prefixed concat)
        msg_vals: List[int] = []
        for i, reg in enumerate(self.prover_msg_regs):
            if reg.round == rnd:
                msg_vals.extend(self.prover_messages[i])
        self.hashchain.absorb_field_elements(msg_vals)
        # squeeze this round's verifier randomness
        for i, reg in enumerate(self.verifier_msg_regs):
            if reg.round == rnd:
                self.verifier_messages[i] = self.hashchain.squeeze_field_elements(reg.size)
        # after the last round: grind pow
        if rnd == self.num_interaction_rounds - 1:
            from ..utils.profiling import PROFILER
            with PROFILER.block("pow_solve"):
                self.pow_nonce = self.pow.solve(self.hashchain.state)
            self.hashchain.absorb_bytes(b"pow" + self.pow_nonce.to_bytes(8, "little"))

    def _fresh_verifier_randomness(self, size: int, index: int):
        raise RuntimeError("BCS prover randomness must come from the hashchain")

    # -- query positions (Fiat–Shamir) --------------------------------------
    def finalize_query_positions(self):
        """Squeeze all random query positions in registration order (the
        deterministic order both prover and verifier use)."""
        assert self._rounds_done == self.num_interaction_rounds
        for i, (kind, payload) in enumerate(self.qpos_regs):
            if kind == "random" and i not in self._qpos_values:
                dom = self.get_domain(payload)
                self._qpos_values[i] = self.hashchain.squeeze_query_positions(
                    1, dom.num_elements())[0]

    def _fresh_query_position(self, domain_size: int, index: int) -> int:
        raise RuntimeError("BCS query positions must be squeezed via "
                           "finalize_query_positions")

    # -- transcript assembly -------------------------------------------------
    def _real_positions_needed(self) -> Set[Tuple[int, int]]:
        """Closure of (real oracle id, position) pairs served to the verifier."""
        needed: Set[Tuple[int, int]] = set()

        def walk(handle: OracleHandle, pos: int):
            if handle.virtual:
                for c in self.virtual_regs[handle.id].constituents:
                    walk(c, pos)
            else:
                needed.add((handle.id, pos))

        for (oracle_h, pos_h) in self.query_regs:
            pos = self.obtain_query_position(pos_h)
            walk(oracle_h, pos)
        return needed

    def get_transcript(self) -> BCSTranscript:
        from ..utils.profiling import PROFILER
        with PROFILER.block("transcript_assembly"):
            return self._get_transcript_inner()

    def _get_transcript_inner(self) -> BCSTranscript:
        self.finalize_query_positions()
        t = BCSTranscript()
        t.elem_bytes = self.F.elem_bytes
        t.mt_roots = dict(self.mt_roots)
        t.prover_messages = {i: list(v) for i, v in self.prover_messages.items()}
        t.pow_nonce = self.pow_nonce
        needed = self._real_positions_needed()
        # group needed positions per merkle tree -> leaf positions
        per_tree: Dict[Tuple[int, int], Set[int]] = {}
        for (oid, pos) in needed:
            reg = self.oracle_regs[oid]
            if reg.is_index:
                rnd = 0
            else:
                rnd = reg.round
            key = (rnd, reg.domain.id)
            rp = self.get_round_parameters(rnd)
            dom = self.domains[reg.domain.id]
            # query position -> Merkle leaf index via the domain's coset
            # layout (query_position_to_merkle_tree_position role,
            # bcs_common.tcc:700-716)
            per_tree.setdefault(key, set()).add(
                dom.coset_index(pos, rp.quotient_map_size))
        # two-phase gather: dispatch EVERY tree's device gathers (leaf rows
        # AND aux digests of device-built trees, async), then fetch them ALL
        # in one device_get — per-tree round-trips through the remote-TPU
        # tunnel dominated assembly otherwise
        import jax as _jax
        pending = {}
        for key, leaf_positions in sorted(per_tree.items()):
            positions = sorted(leaf_positions)
            blocks = self.mt_leaf_blocks[key]
            rows = blocks.gather_async(positions) \
                if hasattr(blocks, "gather_async") else None
            aux = self.merkle_trees[key].multi_proof_async(positions)
            pending[key] = (positions, rows, aux)
        dev_arrays = {}
        for k, (_, rows, aux) in pending.items():
            if rows is not None:
                dev_arrays[(k, "rows")] = rows
            if aux is not None:
                dev_arrays[(k, "aux")] = aux
        if all(getattr(rd, "is_fully_addressable", True)
               for rd in dev_arrays.values()):
            fetched = _jax.device_get(dev_arrays)
        else:  # multi-process global arrays: allgather-aware per-array path
            from ..parallel.mesh import device_fetch
            fetched = {k: device_fetch(rd) for k, rd in dev_arrays.items()}
        for key, (positions, rows_dev, aux_dev) in pending.items():
            mt = self.merkle_trees[key]
            blocks = self.mt_leaf_blocks[key]
            if rows_dev is not None:
                revealed = blocks.rows_to_bytes(fetched[(key, "rows")])
            else:
                revealed = [blocks[p] for p in positions]
            if aux_dev is not None:
                aux_digests = mt.multi_proof_rows_to_bytes(
                    fetched[(key, "aux")])
            else:
                aux_digests = mt.multi_proof(positions)
            t.mt_proofs[key] = MTProof(
                positions=positions,
                leaf_blocks=revealed,
                aux_digests=aux_digests,
                salts=mt.reveal_salts(positions) if mt.make_zk else None)
        return t
