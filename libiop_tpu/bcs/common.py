"""Shared BCS machinery: parameters, leaf-column serialization, transcripts.

Counterpart of libiop/bcs/bcs_common.{hpp,tcc}:
* ``BCSParameters`` = hash suite + pow + security (bcs_common.hpp:24-34);
* one Merkle tree per (round, domain) holding all of that round's oracles
  over that domain (bcs_common.tcc:423-480);
* leaf columns follow the multiplicative coset-serialization layout
  (bcs_common.tcc:646-676): with quotient_map_size c over a domain of size N,
  leaf j holds, for each oracle (ascending id), the values at positions
  j, j+N/c, ..., j+(c-1)N/c — i.e. the coset in intra-coset order;
* the transcript is the SNARG (bcs_common.hpp:36-106).
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..fields.prime import PrimeField
from .hashing import Blake2bHashing, Blake2bHashchain
from .pow import PowParameters


@dataclasses.dataclass
class BCSParameters:
    security_bits: int = 128
    #: "blake2b" | "poseidon" (Cauchy-MDS, alpha=5) | "poseidon_high_alpha"
    #: (near-MDS, alpha=17) — the three hash enums of hash_enum.hpp:21-27
    hash_name: str = "blake2b"
    pow_bits: int = 0

    def make_hasher(self, field: Optional[PrimeField] = None):
        if self.hash_name in ("poseidon", "poseidon_high_alpha"):
            from .poseidon import PoseidonHashing
            assert field is not None and hasattr(field, "p"), \
                "algebraic hashes need a prime field"
            return PoseidonHashing(field, self.security_bits,
                                   variant=self.hash_name)
        assert self.hash_name == "blake2b", self.hash_name
        return Blake2bHashing(self.security_bits)

    def make_hashchain(self, field: PrimeField):
        if self.hash_name in ("poseidon", "poseidon_high_alpha"):
            from .poseidon import PoseidonHashchain
            return PoseidonHashchain(field, self.security_bits,
                                     variant=self.hash_name)
        return Blake2bHashchain(field, self.security_bits)

    def make_pow(self) -> PowParameters:
        return PowParameters(self.pow_bits)


class LeafBlocks:
    """Sequence-of-bytes view over one contiguous (num_leaves, block_len)
    uint8 array: leaf blocks without materializing a Python bytes object per
    leaf.  Indexing yields the leaf's bytes (transcript assembly touches only
    the ~hundreds of queried leaves); the batch hashers consume ``.array``
    directly (zero-copy into the native kernel)."""

    __slots__ = ("array",)

    def __init__(self, array: np.ndarray):
        self.array = np.ascontiguousarray(array, dtype=np.uint8)

    def __len__(self) -> int:
        return self.array.shape[0]

    def __getitem__(self, i: int) -> bytes:
        return self.array[i].tobytes()

    def __iter__(self):
        for i in range(self.array.shape[0]):
            yield self.array[i].tobytes()


class DeviceLeafBlocks:
    """Leaf blocks kept ON DEVICE as (num_leaves, nw) uint32 word rows
    (little-endian byte streams).  Bytes cross to the host only for the
    queried leaves (transcript assembly), via one gather + one small d2h —
    the full-block transfer that dominated the 2^14 prove is gone."""

    __slots__ = ("words", "block_len")

    def __init__(self, words_dev, block_len: int):
        self.words = words_dev
        self.block_len = block_len

    def __len__(self) -> int:
        return self.words.shape[0]

    def gather_async(self, positions):
        """Dispatch the device gather WITHOUT syncing — lets transcript
        assembly enqueue every tree's gather before paying one round-trip
        each (the sync happens in gather_finish)."""
        idx = np.asarray(list(positions), np.int64)
        return jnp.take(self.words, jnp.asarray(idx), axis=0)

    def rows_to_bytes(self, rows: np.ndarray) -> List[bytes]:
        """Host-side split of already-fetched gather rows into leaf bytes."""
        rows = np.asarray(rows).astype("<u4")
        blob = rows.tobytes()
        w = rows.shape[1] * 4
        return [blob[k * w:k * w + self.block_len]
                for k in range(rows.shape[0])]

    def gather_finish(self, rows_dev) -> List[bytes]:
        from ..parallel.mesh import device_fetch
        return self.rows_to_bytes(device_fetch(rows_dev))

    def gather(self, positions) -> List[bytes]:
        return self.gather_finish(self.gather_async(positions))

    def __getitem__(self, i: int) -> bytes:
        return self.gather([int(i)])[0]


_DEVICE_LEAF_JIT: dict = {}

#: leaf count above which the device leaf pipeline runs in 8 chunks (HBM
#: peak control at 2^20-constraint rounds); tests lower it to pin equality
_CHUNK_LEAF_THRESHOLD = 1 << 20


def device_leaf_digests(F, oracle_evals_list, domain, coset_size: int,
                        digest_bytes: int, salts: Optional[bytes] = None,
                        build_tree: bool = False):
    """Full-device leaf pipeline: canonicalize+pack -> per-leaf word layout
    -> tag-prefixed batched BLAKE2b — one jitted dispatch, digests d2h only.

    zk trees (merkle_tree.tcc:37-67): ``salts`` is the host-generated secret
    blob (num_leaves * salt_bytes, word-aligned); it ships to HBM ONCE and
    each leaf hashes tag || block || salt on device — same stream the host
    path feeds hashlib, so digests are bit-identical.

    Returns (leaf_digests: List[bytes], DeviceLeafBlocks) or None when the
    config is unsupported (odd-limb prime field, odd digest width).

    With ``build_tree`` the same dispatch also hashes ALL Merkle levels in
    HBM (device_blake2b.merkle_heap_words) and the return is
    (root: bytes, heap_dev, DeviceLeafBlocks): only 32 root bytes cross to
    the host at commit time; queried aux digests are gathered lazily at
    transcript assembly."""
    import jax
    from ..parallel.mesh import device_fetch
    from .device_blake2b import (blake2b_words, leaf_words_layout,
                                 merkle_heap_words, prefix_tag_words)
    if not oracle_evals_list or digest_bytes % 4 != 0:
        return None
    prime = hasattr(F, "p")
    if prime and F.L % 2 != 0:
        return None
    N = domain.num_elements()
    c = coset_size
    num_leaves = N // c
    O = len(oracle_evals_list)
    L2 = (F.L // 2) if prime else F.W
    nw = O * c * L2
    block_len = 4 * nw
    additive = domain.kind == "affine_subspace"
    salt_words = None
    sw = 0
    if salts is not None:
        sb = len(salts) // num_leaves
        if sb % 4 != 0 or len(salts) != num_leaves * sb:
            return None
        sw = sb // 4
        salt_words = jnp.asarray(np.frombuffer(salts, "<u4")
                                 .reshape(num_leaves, sw))
    key = (getattr(F, "name", None), O, c, N, additive, digest_bytes, sw,
           build_tree, tuple(e.shape for e in oracle_evals_list))
    fn = _DEVICE_LEAF_JIT.get(key)
    if fn is None:
        def _pipeline(sws, *evs):
            stacked = jnp.stack(evs, axis=1)
            if prime:
                cl = F.to_canonical_limbs(stacked)
                packed = cl[0::2] | (cl[1::2] << 16)
            else:
                packed = stacked
            w = leaf_words_layout(packed, num_leaves, c, additive)
            hw = w if sws is None else jnp.concatenate([w, sws], axis=1)
            digests = blake2b_words(prefix_tag_words(hw, 0x00),
                                    block_len + 4 * sw + 1, digest_bytes)
            if build_tree:
                heap = merkle_heap_words(digests, digest_bytes)
                return heap[1], heap, w
            return digests, w
        if sw:
            fn = jax.jit(_pipeline)
        else:
            fn = jax.jit(lambda *evs: _pipeline(None, *evs))
        _DEVICE_LEAF_JIT[key] = fn
    # HUGE trees (2^20-constraint rounds: 2M+ leaves) chunk the leaf
    # pipeline: the stack+canonicalize+pack transients at (L, O, 4M) peaked
    # past HBM (RESOURCE_EXHAUSTED on the v5e).  Each chunk re-slices the
    # oracle columns belonging to its leaf range (stride-structured for
    # multiplicative cosets, contiguous for additive), runs the same
    # pipeline, and the digests feed one tree build.
    if num_leaves >= _CHUNK_LEAF_THRESHOLD and build_tree:
        CH = 8
        chunk = num_leaves // CH
        dig_parts, word_parts = [], []
        ck = (key, "chunk", chunk)
        cfn = _DEVICE_LEAF_JIT.get(ck)
        if cfn is None:
            def _chunk_pipeline(sws, *evs):
                stacked = jnp.stack(evs, axis=1)
                if prime:
                    cl = F.to_canonical_limbs(stacked)
                    packed = cl[0::2] | (cl[1::2] << 16)
                else:
                    packed = stacked
                w = leaf_words_layout(packed, chunk, c, additive)
                hw = w if sws is None else jnp.concatenate([w, sws], axis=1)
                return blake2b_words(prefix_tag_words(hw, 0x00),
                                     block_len + 4 * sw + 1, digest_bytes), w
            cfn = _DEVICE_LEAF_JIT[ck] = jax.jit(_chunk_pipeline)
        for t in range(CH):
            a, b = t * chunk, (t + 1) * chunk
            if additive:
                evs_t = [e.reshape(e.shape[0], num_leaves, c)
                         [:, a:b].reshape(e.shape[0], chunk * c)
                         for e in oracle_evals_list]
            else:
                evs_t = [jnp.concatenate(
                    [e[:, i * num_leaves + a:i * num_leaves + b]
                     for i in range(c)], axis=1) for e in oracle_evals_list]
            sw_t = salt_words[a:b] if sw else None
            d_t, w_t = cfn(sw_t, *evs_t) if sw else cfn(None, *evs_t)
            dig_parts.append(d_t)
            word_parts.append(w_t)
        digests_dev = jnp.concatenate(dig_parts, axis=0)
        words_dev = jnp.concatenate(word_parts, axis=0)
        tk = ("tree", num_leaves, digest_bytes)
        tfn = _DEVICE_LEAF_JIT.get(tk)
        if tfn is None:
            from .device_blake2b import merkle_heap_words as _mhw
            tfn = _DEVICE_LEAF_JIT[tk] = jax.jit(
                lambda d: _mhw(d, digest_bytes))
        heap_dev = tfn(digests_dev)
        root = device_fetch(heap_dev[1]).astype("<u4").tobytes()[:digest_bytes]
        return root, heap_dev, DeviceLeafBlocks(words_dev, block_len)

    args = ((salt_words,) if sw else ()) + tuple(oracle_evals_list)
    if build_tree:
        root_dev, heap_dev, words_dev = fn(*args)
        root = device_fetch(root_dev).astype("<u4").tobytes()[:digest_bytes]
        return root, heap_dev, DeviceLeafBlocks(words_dev, block_len)
    digests_dev, words_dev = fn(*args)
    dh = device_fetch(digests_dev).astype("<u4")
    blob = dh.tobytes()
    leaf_digests = [blob[k * digest_bytes:(k + 1) * digest_bytes]
                    for k in range(num_leaves)]
    return leaf_digests, DeviceLeafBlocks(words_dev, block_len)


def serialize_leaf_blocks(F, oracle_evals_list, domain,
                          coset_size: int) -> LeafBlocks:
    """Device->host serialization of a (round, domain)'s oracles into leaf
    byte-columns (bcs_common.tcc:620-696 layouts).  oracle_evals_list: list of
    (L, N) device arrays in ascending oracle-id order.

    Leaf j holds, for each oracle, the values at positions
    ``domain.position_by_coset_indices(j, i, c)`` for i in intra-coset order:
    strided (j + i*num_leaves) over multiplicative cosets, contiguous
    (j*c + i) over affine subspaces.

    Perf: all oracles canonicalize in ONE jitted dispatch + ONE device_get
    (eager per-oracle ops are catastrophic under remote-TPU dispatch latency;
    measured 362s -> sub-second at 2^16 x 9 oracles), 16-bit prime-field
    limbs are packed into uint32 pairs ON DEVICE so the d2h transfer carries
    no dead bytes (2x), and the result stays one contiguous array end-to-end
    into the native batch hasher."""
    N = domain.num_elements()
    c = coset_size
    assert N % c == 0
    num_leaves = N // c
    host = None
    packed = False
    if oracle_evals_list:
        import jax
        from ..parallel.mesh import device_fetch
        # prime fields hold one 16-bit limb per uint32 lane; pairs pack into
        # one uint32 whose little-endian bytes equal the canonical
        # little-endian limb serialization, halving the transfer
        packed = hasattr(F, "p") and F.L % 2 == 0
        canon_fn = getattr(F, "_leaf_canon_jit", None)
        if canon_fn is None:
            # stack INSIDE the jit: eager jnp.stack cannot consume
            # multi-process global arrays
            if packed:
                def _canon_pack(*xs):
                    cl = F.to_canonical_limbs(jnp.stack(xs, axis=1))
                    return cl[0::2] | (cl[1::2] << 16)
            else:
                def _canon_pack(*xs):
                    return F.to_canonical_limbs(jnp.stack(xs, axis=1))
            canon_fn = F._leaf_canon_jit = jax.jit(_canon_pack)
        host = device_fetch(canon_fn(*oracle_evals_list))     # (L', O, N)
    per_oracle = []
    for o in range(len(oracle_evals_list)):
        a = host[:, o]                                        # (L', N)
        if packed or not hasattr(F, "p"):
            # little-endian uint32 words ARE the canonical element bytes
            # (binary fields store u32 words natively; packed prime limbs
            # by construction above)
            raw = np.ascontiguousarray(a.T.astype("<u4", copy=False)).view(
                np.uint8).reshape(N, F.elem_bytes)
        else:
            raw = np.frombuffer(F.canonical_to_bytes(a), dtype=np.uint8
                                ).reshape(N, F.elem_bytes)
        if domain.kind == "affine_subspace":
            # leaf j <- positions j*c + i (contiguous cosets)
            blocks = raw.reshape(num_leaves, c, F.elem_bytes)
        else:
            # leaf j <- positions j + i*num_leaves (strided cosets)
            blocks = raw.reshape(c, num_leaves, F.elem_bytes).transpose(1, 0, 2)
        per_oracle.append(blocks.reshape(num_leaves, c * F.elem_bytes))
    cat = np.concatenate(per_oracle, axis=1) if per_oracle else np.zeros(
        (num_leaves, 0), np.uint8)
    return LeafBlocks(cat)


def parse_leaf_block(F: PrimeField, block: bytes, num_oracles: int,
                     coset_size: int) -> List[List[int]]:
    """Inverse of serialize_leaf_blocks for one leaf: returns
    values[oracle_idx][intra_coset_idx] as canonical ints."""
    eb = F.elem_bytes
    assert len(block) == num_oracles * coset_size * eb
    out = []
    off = 0
    for _ in range(num_oracles):
        vals = []
        for _ in range(coset_size):
            vals.append(int.from_bytes(block[off:off + eb], "little"))
            off += eb
        out.append(vals)
    return out


@dataclasses.dataclass
class MTProof:
    """Revealed data for one Merkle tree."""
    positions: List[int]                 # sorted unique leaf positions
    leaf_blocks: List[bytes]             # same order as positions
    aux_digests: List[bytes]             # pruned path digests
    salts: Optional[List[bytes]] = None  # zk only


@dataclasses.dataclass
class BCSTranscript:
    """The SNARG (bcs_common.hpp:36-106 role)."""
    mt_roots: Dict[Tuple[int, int], bytes] = dataclasses.field(default_factory=dict)
    prover_messages: Dict[int, List[int]] = dataclasses.field(default_factory=dict)
    mt_proofs: Dict[Tuple[int, int], MTProof] = dataclasses.field(default_factory=dict)
    pow_nonce: int = 0
    #: fixed width of a serialized prover-message element (canonical format:
    #: every field element costs exactly elem_bytes; non-canonical encodings
    #: are rejected at deserialization)
    elem_bytes: int = 0

    # -- binary serialization (canonical proof format) ---------------------
    def serialize(self) -> bytes:
        out = [b"BCS2"]

        def put_bytes(b: bytes):
            out.append(struct.pack("<I", len(b)))
            out.append(b)

        eb = self.elem_bytes
        assert eb > 0, "transcript elem_bytes must be set before serialization"
        out.append(struct.pack("<I", eb))
        out.append(struct.pack("<Q", self.pow_nonce))
        out.append(struct.pack("<I", len(self.mt_roots)))
        for (rnd, dom), root in sorted(self.mt_roots.items()):
            out.append(struct.pack("<II", rnd, dom))
            put_bytes(root)
        out.append(struct.pack("<I", len(self.prover_messages)))
        for mid in sorted(self.prover_messages):
            vals = self.prover_messages[mid]
            out.append(struct.pack("<II", mid, len(vals)))
            for v in vals:
                out.append(int(v).to_bytes(eb, "little"))
        out.append(struct.pack("<I", len(self.mt_proofs)))
        for (rnd, dom), prf in sorted(self.mt_proofs.items()):
            out.append(struct.pack("<II", rnd, dom))
            out.append(struct.pack("<I", len(prf.positions)))
            for p in prf.positions:
                out.append(struct.pack("<Q", p))
            out.append(struct.pack("<I", len(prf.leaf_blocks)))
            for b in prf.leaf_blocks:
                put_bytes(b)
            out.append(struct.pack("<I", len(prf.aux_digests)))
            for b in prf.aux_digests:
                put_bytes(b)
            has_salts = prf.salts is not None
            out.append(struct.pack("<B", 1 if has_salts else 0))
            if has_salts:
                out.append(struct.pack("<I", len(prf.salts)))
                for s in prf.salts:
                    put_bytes(s)
        return b"".join(out)

    @classmethod
    def deserialize(cls, data: bytes) -> "BCSTranscript":
        assert data[:4] == b"BCS2"
        off = 4

        def get(fmt):
            nonlocal off
            sz = struct.calcsize(fmt)
            vals = struct.unpack_from(fmt, data, off)
            off += sz
            return vals

        def get_bytes() -> bytes:
            nonlocal off
            (n,) = get("<I")
            b = data[off:off + n]
            off += n
            return b

        t = cls()
        (t.elem_bytes,) = get("<I")
        eb = t.elem_bytes
        (t.pow_nonce,) = get("<Q")
        (nroots,) = get("<I")
        for _ in range(nroots):
            rnd, dom = get("<II")
            t.mt_roots[(rnd, dom)] = get_bytes()
        (nmsgs,) = get("<I")
        for _ in range(nmsgs):
            mid, nvals = get("<II")
            vals = []
            for _ in range(nvals):
                vals.append(int.from_bytes(data[off:off + eb], "little"))
                off += eb
            t.prover_messages[mid] = vals
        (nproofs,) = get("<I")
        for _ in range(nproofs):
            rnd, dom = get("<II")
            (npos,) = get("<I")
            positions = [get("<Q")[0] for _ in range(npos)]
            (nblk,) = get("<I")
            blocks = [get_bytes() for _ in range(nblk)]
            (naux,) = get("<I")
            aux = [get_bytes() for _ in range(naux)]
            (has_salts,) = get("<B")
            salts = None
            if has_salts:
                (ns,) = get("<I")
                salts = [get_bytes() for _ in range(ns)]
            t.mt_proofs[(rnd, dom)] = MTProof(positions, blocks, aux, salts)
        return t

    def argument_size_bytes(self) -> int:
        return len(self.serialize())

    def detailed_report(self) -> dict:
        """Per-round cost breakdown: IOP bytes (revealed oracle values +
        prover messages) vs BCS overhead (digests, salts, pow) — role of
        print_detailed_transcript_data (bcs_common.tcc:698-827)."""
        per_tree = {}
        iop_bytes = 0
        bcs_bytes = 0
        for key, prf in sorted(self.mt_proofs.items()):
            leaf_bytes = sum(len(b) for b in prf.leaf_blocks)
            digest_bytes = sum(len(d) for d in prf.aux_digests)
            salt_bytes = sum(len(s) for s in (prf.salts or []))
            root_bytes = len(self.mt_roots.get(key, b""))
            per_tree[key] = {
                "revealed_leaves": len(prf.positions),
                "leaf_bytes": leaf_bytes,
                "aux_digests": len(prf.aux_digests),
                "digest_bytes": digest_bytes + root_bytes,
                "salt_bytes": salt_bytes,
            }
            iop_bytes += leaf_bytes
            bcs_bytes += digest_bytes + salt_bytes + root_bytes
        msg_bytes = sum(len(vals) * self.elem_bytes
                        for vals in self.prover_messages.values())
        iop_bytes += msg_bytes
        bcs_bytes += 8  # pow nonce
        return {
            "per_tree": per_tree,
            "prover_message_bytes": msg_bytes,
            "iop_bytes": iop_bytes,
            "bcs_overhead_bytes": bcs_bytes,
            "total_serialized_bytes": self.argument_size_bytes(),
        }

    def print_detailed_report(self):
        rep = self.detailed_report()
        print(f"{'tree (round,domain)':>22} | leaves | leaf B | aux | digest B | salt B")
        for key, row in rep["per_tree"].items():
            print(f"{str(key):>22} | {row['revealed_leaves']:6d} | "
                  f"{row['leaf_bytes']:6d} | {row['aux_digests']:3d} | "
                  f"{row['digest_bytes']:8d} | {row['salt_bytes']:6d}")
        print(f"prover messages: {rep['prover_message_bytes']} B")
        print(f"IOP bytes: {rep['iop_bytes']}  BCS overhead: "
              f"{rep['bcs_overhead_bytes']}  total: "
              f"{rep['total_serialized_bytes']}")
