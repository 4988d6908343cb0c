"""GF(2^k) arithmetic vs host-int carry-less reference."""
import numpy as np
import pytest

from libiop_tpu.fields.binary import gf64, gf128, gf192, gf256

FIELDS = [gf64, gf128, gf192, gf256]


def _rand(rng, F, n):
    return [int.from_bytes(rng.bytes(F.elem_bytes), "little") for _ in range(n)]


def _clmul_int(a, b):
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        b >>= 1
    return r


def _reduce_int(x, mod, k):
    while x.bit_length() > k:
        x ^= mod << (x.bit_length() - 1 - k)
    return x


@pytest.mark.parametrize("field_fn", FIELDS)
def test_roundtrip_add(field_fn, rng):
    F = field_fn()
    xs = _rand(rng, F, 9) + [0, 1]
    ys = _rand(rng, F, 9) + [1, 0]
    a, b = F.from_ints(xs), F.from_ints(ys)
    assert [int(v) for v in F.to_ints(a)] == xs
    assert [int(v) for v in F.to_ints(F.add(a, b))] == [x ^ y for x, y in zip(xs, ys)]


@pytest.mark.parametrize("field_fn", FIELDS)
def test_mul(field_fn, rng):
    F = field_fn()
    xs = _rand(rng, F, 6) + [0, 1, (1 << F.k) - 1]
    ys = _rand(rng, F, 6) + [1, (1 << F.k) - 1, (1 << F.k) - 1]
    a, b = F.from_ints(xs), F.from_ints(ys)
    got = [int(v) for v in F.to_ints(F.mul(a, b))]
    want = [_reduce_int(_clmul_int(x, y), F.modulus_int, F.k)
            for x, y in zip(xs, ys)]
    assert got == want
    # host-int mirror agrees
    assert [F.mul_ints(x, y) for x, y in zip(xs, ys)] == want


@pytest.mark.parametrize("field_fn", [gf64, gf192])
def test_square_inv(field_fn, rng):
    F = field_fn()
    xs = _rand(rng, F, 4) + [1]
    xs = [x or 1 for x in xs]
    a = F.from_ints(xs)
    sq = [int(v) for v in F.to_ints(F.square(a))]
    assert sq == [_reduce_int(_clmul_int(x, x), F.modulus_int, F.k) for x in xs]
    inv = F.inv(a)
    prod = [int(v) for v in F.to_ints(F.mul(a, inv))]
    assert prod == [1] * len(xs)
    assert [F.mul_ints(x, F.inv_int(x)) for x in xs] == [1] * len(xs)


@pytest.mark.parametrize("field_fn", [gf64, gf128, gf192, gf256])
def test_mul_scan_matches_parallel(field_fn, rng):
    """The two mul trace modes (parallel CLMUL emulation vs k-step scan) must
    be bit-identical — the suite runs in scan mode (conftest) while the TPU
    production path is parallel."""
    import libiop_tpu.fields.binary as binmod
    F = field_fn()
    xs, ys = _rand(rng, F, 8), _rand(rng, F, 8)
    a, b = F.from_ints(xs), F.from_ints(ys)
    saved = binmod._MUL_MODE
    try:
        binmod._MUL_MODE = "parallel"
        par = [int(v) for v in F.to_ints(F.mul(a, b))]
        binmod._MUL_MODE = "scan"
        sc = [int(v) for v in F.to_ints(F.mul(a, b))]
    finally:
        binmod._MUL_MODE = saved
    assert par == sc
    assert par == [F.mul_ints(x, y) for x, y in zip(xs, ys)]
