"""Merkle trees over oracle leaf-columns, with pruned multi-membership proofs.

Counterpart of libiop/bcs/merkle_tree.{hpp,tcc}:
* one tree commits to ALL oracles of one (round, domain) pair; a leaf is the
  serialized column of every oracle's values at one position — or, with
  coset serialization (round_parameters), at a whole coset in intra-coset
  order (bcs_common.tcc:620-696 layout);
* zk trees append a fresh salt to each leaf before hashing
  (merkle_tree.tcc:37-67);
* multi-membership proofs are *pruned*: a layer-by-layer frontier walk emits
  only the sibling digests not derivable from the queried set
  (merkle_tree.tcc:244-337), validated by the mirrored walk
  (merkle_tree.tcc:339-470).

The leaf/inner hashing is batch work (native C++ kernel planned); the proof
pruning is tiny host logic.
"""
from __future__ import annotations

import secrets
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .hashing import Blake2bHashing


class MerkleTree:
    #: device-resident (2n, dw) uint32 heap words (device-built trees only);
    #: `nodes` is None in that case and digests are gathered lazily
    _heap_dev = None
    _digest_bytes = None
    _root_bytes = None

    def __init__(self, hasher: Blake2bHashing, leaf_blocks: List[bytes],
                 make_zk: bool = False, _salts: Optional[List[bytes]] = None):
        n = len(leaf_blocks)
        assert n >= 1 and (n & (n - 1)) == 0, "leaf count must be a power of two"
        self.hasher = hasher
        self.num_leaves = n
        self.make_zk = make_zk
        # contiguous-array fast path (LeafBlocks from serialize_leaf_blocks
        # + a native batch hasher): no per-leaf Python bytes objects
        arr = getattr(leaf_blocks, "array", None)
        batch_arr = getattr(hasher, "leaf_hash_batch_array", None)
        batch = getattr(hasher, "leaf_hash_batch", None)
        if make_zk:
            sb = hasher.salt_bytes
            if _salts is not None:
                self.salts = list(_salts)
            else:
                # one urandom draw for all leaves (same per-leaf distribution
                # as independent draws; merkle_tree.tcc:37-67 role)
                blob = secrets.token_bytes(n * sb)
                self.salts = [blob[i * sb:(i + 1) * sb] for i in range(n)]
            leaf_digests = None
            if arr is not None and batch_arr is not None:
                salted_arr = np.concatenate(
                    [arr, np.frombuffer(b"".join(self.salts),
                                        np.uint8).reshape(n, sb)], axis=1)
                leaf_digests = batch_arr(salted_arr)
            if leaf_digests is None:
                salted = [b + s for b, s in zip(leaf_blocks, self.salts)]
                leaf_digests = batch(salted) if batch else [
                    hasher.leaf_hash(b) for b in salted]
        else:
            self.salts = None
            leaf_digests = None
            if arr is not None and batch_arr is not None:
                leaf_digests = batch_arr(arr)
            if leaf_digests is None:
                leaf_digests = batch(leaf_blocks) if batch else [
                    hasher.leaf_hash(b) for b in leaf_blocks]
        self.nodes = self._build_nodes(hasher, n, leaf_digests)

    @staticmethod
    def _build_nodes(hasher, n: int, leaf_digests: List[bytes]) -> List[bytes]:
        # heap layout: nodes[1] = root; nodes[n..2n-1] = leaf digests
        nodes: List[bytes] = [b""] * (2 * n)
        nodes[n:] = leaf_digests
        layer_fn = getattr(hasher, "tree_layer", None)
        if layer_fn is not None:
            level = leaf_digests
            base = n
            while len(level) > 1:
                level = layer_fn(level)
                base //= 2
                nodes[base:base + len(level)] = level
        else:
            for i in range(n - 1, 0, -1):
                nodes[i] = hasher.two_to_one(nodes[2 * i], nodes[2 * i + 1])
        return nodes

    @classmethod
    def from_leaf_digests(cls, hasher, leaf_digests: List[bytes],
                          salts: Optional[List[bytes]] = None
                          ) -> "MerkleTree":
        """Build a tree from PRECOMPUTED leaf digests — the device-BLAKE2b
        path hashes leaves in HBM and ships only digests.  For zk trees the
        caller generated the salts (host secret randomness), hashed them
        into the device digests, and passes them here for reveal_salts."""
        n = len(leaf_digests)
        assert n >= 1 and (n & (n - 1)) == 0
        mt = cls.__new__(cls)
        mt.hasher = hasher
        mt.num_leaves = n
        mt.make_zk = salts is not None
        mt.salts = salts
        mt.nodes = cls._build_nodes(hasher, n, leaf_digests)
        return mt

    @classmethod
    def from_nodes(cls, hasher, num_leaves: int, nodes: List[bytes],
                   make_zk: bool = False, salts: Optional[List[bytes]] = None
                   ) -> "MerkleTree":
        """Rehydrate a tree from persisted node data WITHOUT rehashing —
        the Fractal prover-index checkpoint (bcs_prover.tcc:11-21: the
        prover consumes pre-built index MTs)."""
        mt = cls.__new__(cls)
        mt.hasher = hasher
        mt.num_leaves = num_leaves
        mt.make_zk = make_zk
        mt.salts = salts
        mt.nodes = list(nodes)
        assert len(mt.nodes) == 2 * num_leaves
        return mt

    @classmethod
    def from_device_heap(cls, hasher, num_leaves: int, heap_dev,
                         root: bytes, salts: Optional[List[bytes]] = None
                         ) -> "MerkleTree":
        """Wrap a tree whose every level was hashed ON DEVICE
        (bcs/device_blake2b.merkle_heap_words): only the root crossed to the
        host; auxiliary digests for multi-proofs are gathered lazily at
        transcript assembly (one batched gather per tree)."""
        mt = cls.__new__(cls)
        mt.hasher = hasher
        mt.num_leaves = num_leaves
        mt.make_zk = salts is not None
        mt.salts = salts
        mt.nodes = None
        mt._heap_dev = heap_dev
        mt._digest_bytes = hasher.digest_bytes
        mt._root_bytes = root
        return mt

    def materialize_nodes(self) -> List[bytes]:
        """Host node list (heap layout) — fetches the device heap once;
        used by the Fractal index checkpoint serialization."""
        if self.nodes is None:
            from ..parallel.mesh import device_fetch
            rows = np.asarray(device_fetch(self._heap_dev)).astype("<u4")
            blob = rows.tobytes()
            w = rows.shape[1] * 4
            db = self._digest_bytes
            self.nodes = [blob[k * w:k * w + db]
                          for k in range(rows.shape[0])]
            self.nodes[0] = b""
        return self.nodes

    @property
    def root(self) -> bytes:
        return self._root_bytes if self.nodes is None else self.nodes[1]

    @staticmethod
    def aux_node_ids(num_leaves: int, positions: Sequence[int]) -> List[int]:
        """Heap ids of the pruned multi-proof's auxiliary digests, in the
        canonical emission order (bottom-up layers, left-to-right)."""
        n = num_leaves
        ids: List[int] = []
        node_ids = [n + p for p in sorted(set(positions))]
        while node_ids and node_ids[0] > 1:
            known = set(node_ids)
            parents = []
            for nid in node_ids:
                sib = nid ^ 1
                if sib in known:
                    if nid < sib:  # emit pair's parent once
                        parents.append(nid // 2)
                else:
                    ids.append(sib)
                    parents.append(nid // 2)
            node_ids = sorted(set(parents))
        return ids

    def multi_proof_async(self, positions: Sequence[int]):
        """Device-tree path: dispatch the aux-digest gather WITHOUT syncing
        (transcript assembly batches every tree's gather into one fetch).
        Returns None for host trees (multi_proof is pure host work there)."""
        if self.nodes is not None:
            return None
        import jax.numpy as jnp
        ids = self.aux_node_ids(self.num_leaves, positions)
        if not ids:
            return jnp.zeros((0, self._heap_dev.shape[1]), jnp.uint32)
        return jnp.take(self._heap_dev,
                        jnp.asarray(np.asarray(ids, np.int64)), axis=0)

    def multi_proof_rows_to_bytes(self, rows) -> List[bytes]:
        rows = np.asarray(rows).astype("<u4")
        blob = rows.tobytes()
        w = rows.shape[1] * 4
        db = self._digest_bytes
        return [blob[k * w:k * w + db] for k in range(rows.shape[0])]

    def multi_proof(self, positions: Sequence[int]) -> List[bytes]:
        """Pruned auxiliary digests for the given (unsorted, possibly
        duplicated) leaf positions.  Deterministic order: bottom-up layers,
        left-to-right within a layer."""
        if self.nodes is None:
            from ..parallel.mesh import device_fetch
            rows = self.multi_proof_async(positions)
            return self.multi_proof_rows_to_bytes(device_fetch(rows))
        return [self.nodes[i]
                for i in self.aux_node_ids(self.num_leaves, positions)]

    def reveal_salts(self, positions: Sequence[int]) -> List[bytes]:
        assert self.make_zk
        return [self.salts[p] for p in sorted(set(positions))]


def validate_multi_proof(hasher: Blake2bHashing, root: bytes, num_leaves: int,
                         positions: Sequence[int], leaf_blocks: Sequence[bytes],
                         aux: Sequence[bytes],
                         salts: Optional[Sequence[bytes]] = None) -> bool:
    """Mirror of MerkleTree.multi_proof: recompute the root from the claimed
    leaf blocks (sorted-deduped position order) + pruned auxiliary digests."""
    n = num_leaves
    frontier = sorted(set(positions))
    if not frontier:
        return False
    # range check (merkle_tree.tcc:265,407 semantics): an out-of-range
    # "leaf" would enter the walk above the leaf layer and alias inner
    # nodes, letting arbitrary unverified content through
    if frontier[0] < 0 or frontier[-1] >= n:
        return False
    if len(frontier) != len(leaf_blocks):
        return False
    if salts is not None:
        if len(salts) != len(frontier):
            return False
        digests = {n + p: hasher.leaf_hash(b + s)
                   for p, b, s in zip(frontier, leaf_blocks, salts)}
    else:
        digests = {n + p: hasher.leaf_hash(b) for p, b in zip(frontier, leaf_blocks)}
    aux = list(aux)
    ai = 0
    node_ids = sorted(digests.keys())
    while node_ids and node_ids[0] > 1:
        parents = []
        known = set(node_ids)
        new_digests: Dict[int, bytes] = {}
        for nid in node_ids:
            sib = nid ^ 1
            if sib in known:
                if nid < sib:
                    new_digests[nid // 2] = hasher.two_to_one(
                        digests[nid], digests[sib])
                    parents.append(nid // 2)
            else:
                if ai >= len(aux):
                    return False
                sib_digest = aux[ai]
                ai += 1
                left, right = ((digests[nid], sib_digest) if nid % 2 == 0
                               else (sib_digest, digests[nid]))
                new_digests[nid // 2] = hasher.two_to_one(left, right)
                parents.append(nid // 2)
        digests = new_digests
        node_ids = sorted(set(parents))
    if ai != len(aux):
        return False
    # the walk must terminate at exactly the root node
    return node_ids == [1] and digests[1] == root


def count_proof_hashes(num_leaves: int, positions: Sequence[int]) -> int:
    """Number of auxiliary digests a pruned proof contains
    (merkle_tree.tcc:486+ role, used by the FRI argument-size optimizer)."""
    frontier = sorted(set(positions))
    node_ids = [num_leaves + p for p in frontier]
    count = 0
    while node_ids and node_ids[0] > 1:
        known = set(node_ids)
        parents = []
        for nid in node_ids:
            sib = nid ^ 1
            if sib in known:
                if nid < sib:
                    parents.append(nid // 2)
            else:
                count += 1
                parents.append(nid // 2)
        node_ids = sorted(set(parents))
    return count
