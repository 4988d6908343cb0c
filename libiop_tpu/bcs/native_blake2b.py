"""ctypes bindings for the native batched BLAKE2b (native/blake2b).

Builds the shared library on first use (g++ -O3 -fopenmp); falls back to
hashlib loops if the toolchain is unavailable.  Correctness is pinned to
hashlib.blake2b by tests/test_native_blake2b.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "blake2b")
_SO_PATH = os.path.join(_SRC_DIR, "libblake2b_batch.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_SRC_DIR, "blake2b_batch.cpp")
    try:
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
                 "-o", _SO_PATH, src],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO_PATH)
        lib.blake2b_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
        lib.blake2b_tree_layer.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_int]
        lib.blake2b_pow_solve.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]
        lib.blake2b_pow_solve.restype = ctypes.c_uint64
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _tag_arg(tag: Optional[bytes]) -> int:
    return -1 if tag is None else tag[0]


def hash_batch(blocks: List[bytes], digest_len: int,
               tag: Optional[bytes] = None) -> Optional[List[bytes]]:
    """Hash equal-length blocks (each prefixed by the optional 1-byte tag);
    returns None if native lib unavailable or blocks have mixed lengths."""
    lib = _load()
    if lib is None or not blocks:
        return None
    in_len = len(blocks[0])
    if any(len(b) != in_len for b in blocks):
        return None
    joined = b"".join(blocks)
    out = ctypes.create_string_buffer(len(blocks) * digest_len)
    lib.blake2b_batch(joined, len(blocks), in_len, out, digest_len,
                      _tag_arg(tag))
    raw = out.raw
    return [raw[i * digest_len:(i + 1) * digest_len] for i in range(len(blocks))]


def hash_batch_array(arr, digest_len: int,
                     tag: Optional[bytes] = None) -> Optional[List[bytes]]:
    """Hash the rows of a contiguous (n, in_len) uint8 array — zero-copy
    into the kernel (no per-row Python bytes, no join)."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 2 or arr.shape[0] == 0:
        return None
    n, in_len = arr.shape
    out = ctypes.create_string_buffer(n * digest_len)
    lib.blake2b_batch(arr.ctypes.data_as(ctypes.c_char_p), n, in_len, out,
                      digest_len, _tag_arg(tag))
    raw = out.raw
    return [raw[i * digest_len:(i + 1) * digest_len] for i in range(n)]


def pow_solve(challenge: bytes, work_bits: int) -> Optional[int]:
    """OpenMP grind for the Fiat-Shamir pow (pow.py semantics): smallest
    nonce with LE64(blake2b_8(b"pow"+challenge+LE64(nonce))) clearing
    ``work_bits`` leading zero bits.  None if unavailable (caller falls back
    to the Python loop)."""
    lib = _load()
    if lib is None or len(challenge) > 64:
        return None
    bound = 1 << (64 - work_bits)
    n = lib.blake2b_pow_solve(challenge, len(challenge), bound)
    return None if n == (1 << 64) - 1 else int(n)


def tree_layer(digests: List[bytes], digest_len: int,
               tag: Optional[bytes] = None) -> Optional[List[bytes]]:
    """[d0,d1,d2,d3,...] -> [H(tag||d0||d1), H(tag||d2||d3), ...];
    None if unavailable."""
    lib = _load()
    if lib is None or not digests:
        return None
    n_out = len(digests) // 2
    joined = b"".join(digests)
    out = ctypes.create_string_buffer(n_out * digest_len)
    lib.blake2b_tree_layer(joined, n_out, digest_len, out, _tag_arg(tag))
    raw = out.raw
    return [raw[i * digest_len:(i + 1) * digest_len] for i in range(n_out)]
