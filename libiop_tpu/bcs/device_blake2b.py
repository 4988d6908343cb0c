"""BLAKE2b (RFC 7693) evaluated ON DEVICE, batched over Merkle leaves.

Role: the reference hashes leaf columns with libsodium on the host
(libiop/bcs/merkle_tree.tcc:93-230).  Here the prover's oracles live in HBM;
shipping every leaf's bytes to the host costs ~0.77 s of a 1.05 s Aurora
prove at 2^14 through the remote-TPU tunnel (cProfile, round 4).  Hashing
the leaves on device means only the 32-byte digests cross to the host
(6-12x fewer bytes), and the tree/hashchain logic is unchanged.

Representation: 64-bit words as (lo, hi) uint32 pairs; additions wrap in
uint32 with an explicit carry; rotations are shift-combines.  The 12-round
compression is unrolled at trace time (static SIGMA schedule).  All message
lengths are static (leaf blocks of one tree are equal-length), so padding
and the finalization flag are baked into the graph.

Output is bit-identical to hashlib.blake2b / the native OpenMP kernel
(pinned by tests/test_device_blake2b.py) — golden transcripts do not change.
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_IV = [0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b,
       0xa54ff53a5f1d36f1, 0x510e527fade682d1, 0x9b05688c2b3e6c1f,
       0x1f83d9abfb41bd6b, 0x5be0cd19137e2179]

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3]]

_U32 = jnp.uint32


def _add64(a, b):
    """(lo, hi) + (lo, hi) mod 2^64 with wrap-carry."""
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(_U32)
    return lo, a[1] + b[1] + carry


def _xor64(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def _rotr64(a, n: int):
    lo, hi = a
    if n == 32:
        return hi, lo
    if n < 32:
        return ((lo >> n) | (hi << (32 - n)),
                (hi >> n) | (lo << (32 - n)))
    m = 64 - n  # rotr n == rotl (64-n); for n=63, rotl 1
    return ((lo << m) | (hi >> (32 - m)),
            (hi << m) | (lo >> (32 - m)))


#: compression lowering: "1" forces the fully unrolled rounds, "0" the
#: lax.scan rounds, unset = auto (unrolled on accelerators, scan on CPU).
#: The scan body compiles once but materializes the 12-round SIGMA-permuted
#: message schedule (12x the message bytes in HBM) and updates state through
#: dynamic-update-slices; the unrolled form is pure SSA elementwise dataflow
#: XLA fuses aggressively, but its graph is ~3k ops per compression, which
#: is what made XLA-CPU compiles minutes-long (hence scan on CPU).
_UNROLL_ENV = os.environ.get("LIBIOP_TPU_BLAKE2B_UNROLL")


def _use_unrolled() -> bool:
    if _UNROLL_ENV in ("0", "1"):
        return _UNROLL_ENV == "1"
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # backend not initializable yet
        return False


_QUARTERS = [(0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
             (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14)]


def _compress_unrolled(h, m, t0: int, last: bool):
    """Fully unrolled compression: v as 16 SSA (lo, hi) pairs, message words
    indexed statically through SIGMA — no schedule materialization, no
    dynamic-update-slices; bit-identical to the scan form."""
    batch = m[0][0].shape
    c64b = lambda v: (jnp.broadcast_to(jnp.uint32(v & 0xffffffff), batch),
                      jnp.broadcast_to(jnp.uint32(v >> 32), batch))
    v = list(h) + [c64b(_IV[i]) for i in range(8)]
    v[12] = (v[12][0] ^ jnp.uint32(t0 & 0xffffffff),
             v[12][1] ^ jnp.uint32(t0 >> 32))
    if last:
        v[14] = (~v[14][0], ~v[14][1])
    for r in range(12):
        s = _SIGMA[r]
        for k, (a, b, c, d) in enumerate(_QUARTERS):
            x, y = m[s[2 * k]], m[s[2 * k + 1]]
            va = _add64(_add64(v[a], v[b]), x)
            vd = _rotr64(_xor64(v[d], va), 32)
            vc = _add64(v[c], vd)
            vb = _rotr64(_xor64(v[b], vc), 24)
            va = _add64(_add64(va, vb), y)
            vd = _rotr64(_xor64(vd, va), 16)
            vc = _add64(vc, vd)
            vb = _rotr64(_xor64(vb, vc), 63)
            v[a], v[b], v[c], v[d] = va, vb, vc, vd
    return [(h[i][0] ^ v[i][0] ^ v[i + 8][0],
             h[i][1] ^ v[i][1] ^ v[i + 8][1]) for i in range(8)]


def _compress(h, m, t0: int, last: bool, unroll=None):
    """One compression.  h = list of 8 (lo, hi) batch arrays; m = list of 16.
    t0 = static total byte count; last = static finalization flag.

    The 12 rounds run as a lax.scan over a statically SIGMA-permuted message
    schedule — the fully unrolled graph made XLA-CPU compiles minutes-long;
    the scan body compiles once (the round structure is identical, only the
    message permutation varies, and that is data, not graph).  On
    accelerators the unrolled form is selected instead (see _use_unrolled);
    ``unroll`` overrides the auto-choice (the Merkle level loop forces scan:
    log2(n) unrolled compressions in one graph blew remote compile times)."""
    if unroll if unroll is not None else _use_unrolled():
        return _compress_unrolled(h, m, t0, last)
    batch = m[0][0].shape
    c64b = lambda v: (jnp.broadcast_to(jnp.uint32(v & 0xffffffff), batch),
                      jnp.broadcast_to(jnp.uint32(v >> 32), batch))
    v_lo = jnp.stack([x[0] for x in h]
                     + [c64b(_IV[i])[0] for i in range(8)])   # (16, *batch)
    v_hi = jnp.stack([x[1] for x in h]
                     + [c64b(_IV[i])[1] for i in range(8)])
    v_lo = v_lo.at[12].set(v_lo[12] ^ jnp.uint32(t0 & 0xffffffff))
    v_hi = v_hi.at[12].set(v_hi[12] ^ jnp.uint32(t0 >> 32))
    if last:
        v_lo = v_lo.at[14].set(~v_lo[14])
        v_hi = v_hi.at[14].set(~v_hi[14])
    # (12, 16, *batch) SIGMA-scheduled message words (static permutation)
    ms_lo = jnp.stack([jnp.stack([m[s][0] for s in _SIGMA[r]])
                       for r in range(12)])
    ms_hi = jnp.stack([jnp.stack([m[s][1] for s in _SIGMA[r]])
                       for r in range(12)])

    def round_body(carry, sched):
        vl, vh = carry
        ml, mh = sched

        def G(vl, vh, a, b, c, d, xi, yi):
            x, y = (ml[xi], mh[xi]), (ml[yi], mh[yi])
            va = _add64(_add64((vl[a], vh[a]), (vl[b], vh[b])), x)
            vd = _rotr64(_xor64((vl[d], vh[d]), va), 32)
            vc = _add64((vl[c], vh[c]), vd)
            vb = _rotr64(_xor64((vl[b], vh[b]), vc), 24)
            va = _add64(_add64(va, vb), y)
            vd = _rotr64(_xor64(vd, va), 16)
            vc = _add64(vc, vd)
            vb = _rotr64(_xor64(vb, vc), 63)
            for i, val in ((a, va), (b, vb), (c, vc), (d, vd)):
                vl = vl.at[i].set(val[0])
                vh = vh.at[i].set(val[1])
            return vl, vh

        for k, (a, b, c, d) in enumerate(
                [(0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14),
                 (3, 7, 11, 15), (0, 5, 10, 15), (1, 6, 11, 12),
                 (2, 7, 8, 13), (3, 4, 9, 14)]):
            vl, vh = G(vl, vh, a, b, c, d, 2 * k, 2 * k + 1)
        return (vl, vh), None

    (v_lo, v_hi), _ = jax.lax.scan(round_body, (v_lo, v_hi), (ms_lo, ms_hi))
    return [(h[i][0] ^ v_lo[i] ^ v_lo[i + 8],
             h[i][1] ^ v_hi[i] ^ v_hi[i + 8]) for i in range(8)]


def prefix_tag_words(words, tag: int):
    """words: (n, nw) uint32 little-endian byte stream; returns (n, nw+1)
    for the stream (tag_byte || bytes) — every word shift-combined."""
    first = jnp.uint32(tag) | (words[:, :1] << 8)
    if words.shape[1] == 1:
        rest = words[:, :0]
    else:
        rest = (words[:, :-1] >> 24) | (words[:, 1:] << 8)
    last = words[:, -1:] >> 24
    return jnp.concatenate([first, rest, last], axis=1)


def blake2b_words(words, msg_bytes: int, digest_bytes: int, unroll=None):
    """Batched keyless BLAKE2b of equal-length messages.

    words: (n, nw) uint32 — each row the message as little-endian u32 words,
    zero-padded (nw*4 >= msg_bytes; bytes past msg_bytes MUST be zero).
    Returns (n, digest_bytes//4) uint32 (little-endian digest words)."""
    assert digest_bytes % 4 == 0 and 0 < digest_bytes <= 64
    n, nw = words.shape
    nblocks = max(1, -(-msg_bytes // 128))
    if nw < nblocks * 32:
        words = jnp.concatenate(
            [words, jnp.zeros((n, nblocks * 32 - nw), _U32)], axis=1)
    c64 = lambda v: (jnp.broadcast_to(jnp.uint32(v & 0xffffffff), (n,)),
                     jnp.broadcast_to(jnp.uint32(v >> 32), (n,)))
    h = [c64(_IV[i]) for i in range(8)]
    h0 = _IV[0] ^ 0x01010000 ^ digest_bytes
    h[0] = c64(h0)
    for b in range(nblocks):
        blk = words[:, b * 32:(b + 1) * 32]
        m = [(blk[:, 2 * i], blk[:, 2 * i + 1]) for i in range(16)]
        lastb = b == nblocks - 1
        t0 = msg_bytes if lastb else (b + 1) * 128
        h = _compress(h, m, t0, lastb, unroll=unroll)
    out = []
    for i in range(digest_bytes // 4):
        lo, hi = h[i // 2]
        out.append(lo if i % 2 == 0 else hi)
    return jnp.stack(out, axis=1)


def merkle_heap_words(leaf_digest_words, digest_bytes: int):
    """(n, dw) leaf digest words -> (2n, dw) uint32 heap words built ENTIRELY
    on device: heap[1] = root, heap[n:] = leaves, heap[0] = zeros; each
    parent = BLAKE2b(0x01 || left || right) (the NODE_TAG domain separation
    of bcs/hashing.py).  One graph holds all log2(n) levels, so committing a
    tree costs ONE dispatch and the d2h is the 32-byte root instead of n
    digests (the per-round digest transfer dominated FRI commit time through
    the remote-TPU tunnel)."""
    n, dw = leaf_digest_words.shape
    levels = [leaf_digest_words]
    cur = leaf_digest_words
    # a few levels near the leaves carry nearly all the hash work; unroll
    # those, then force the scan compression so the graph stays
    # O(levels * scan_body) instead of O(levels * 3k ops) — the fully
    # unrolled level loop blew remote-XLA compile times at 2^20
    unroll_levels = 2
    while cur.shape[0] > 1:
        m = cur.shape[0]
        pairs = cur.reshape(m // 2, 2 * dw)
        tagged = prefix_tag_words(pairs, 0x01)
        unroll = None if len(levels) <= unroll_levels else False
        cur = blake2b_words(tagged, 1 + 2 * digest_bytes, digest_bytes,
                            unroll=unroll)
        levels.append(cur)
    heap = [jnp.zeros((1, dw), _U32)] + levels[::-1]
    return jnp.concatenate(heap, axis=0)


def leaf_words_layout(packed, num_leaves: int, coset_size: int,
                      additive: bool):
    """(L2, O, N) packed canonical words -> (num_leaves, O*c*L2) per-leaf
    word streams matching serialize_leaf_blocks' byte layout exactly:
    leaf j = for each oracle, the coset's elements in intra-coset order
    (strided j + i*num_leaves multiplicative / contiguous j*c + i additive),
    each element as its L2 little-endian u32 words."""
    L2, O, N = packed.shape
    c = coset_size
    assert N == num_leaves * c
    if additive:
        # n = j*c + i
        w = packed.reshape(L2, O, num_leaves, c).transpose(2, 1, 3, 0)
    else:
        # n = i*num_leaves + j
        w = packed.reshape(L2, O, c, num_leaves).transpose(3, 1, 2, 0)
    return w.reshape(num_leaves, O * c * L2)
