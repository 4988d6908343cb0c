"""Prime-field limb arithmetic vs Python bigint ground truth.

Mirrors the role of libff's field tests + libiop/benchmarks/benchmark_edwards.cpp
correctness assumptions (reference SURVEY.md §2.1).
"""
import numpy as np
import pytest
import jax

from libiop_tpu.fields.prime import edwards_fr, alt_bn128_fr

FIELDS = [edwards_fr, alt_bn128_fr]


def _rand_ints(rng, p, n):
    return [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % p
            for _ in range(n)]


@pytest.mark.parametrize("field_fn", FIELDS)
def test_roundtrip(field_fn, rng):
    F = field_fn()
    xs = _rand_ints(rng, F.p, 17) + [0, 1, F.p - 1]
    limbs = F.from_ints(xs)
    assert limbs.shape == (F.L, len(xs))
    back = F.to_ints(limbs)
    assert list(back) == xs


@pytest.mark.parametrize("field_fn", FIELDS)
def test_add_sub_neg(field_fn, rng):
    F = field_fn()
    n = 33
    xs = _rand_ints(rng, F.p, n) + [0, F.p - 1, 1]
    ys = _rand_ints(rng, F.p, n) + [0, 0, F.p - 1]
    a, b = F.from_ints(xs), F.from_ints(ys)
    assert [int(v) for v in F.to_ints(F.add(a, b))] == [(x + y) % F.p for x, y in zip(xs, ys)]
    assert [int(v) for v in F.to_ints(F.sub(a, b))] == [(x - y) % F.p for x, y in zip(xs, ys)]
    assert [int(v) for v in F.to_ints(F.neg(a))] == [(-x) % F.p for x in xs]


@pytest.mark.parametrize("field_fn", FIELDS)
def test_mul(field_fn, rng):
    F = field_fn()
    n = 33
    xs = _rand_ints(rng, F.p, n) + [0, F.p - 1, 1]
    ys = _rand_ints(rng, F.p, n) + [F.p - 1, F.p - 1, 1]
    a, b = F.from_ints(xs), F.from_ints(ys)
    got = [int(v) for v in F.to_ints(F.mul(a, b))]
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("field_fn", FIELDS)
def test_mul_jitted(field_fn, rng):
    F = field_fn()
    xs = _rand_ints(rng, F.p, 8)
    ys = _rand_ints(rng, F.p, 8)
    a, b = F.from_ints(xs), F.from_ints(ys)
    got = [int(v) for v in F.to_ints(jax.jit(F.mul)(a, b))]
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("field_fn", FIELDS)
def test_pow_inv(field_fn, rng):
    F = field_fn()
    xs = _rand_ints(rng, F.p, 9) + [1, F.p - 1]
    a = F.from_ints(xs)
    e = 123456789
    assert [int(v) for v in F.to_ints(F.pow_static(a, e))] == [pow(x, e, F.p) for x in xs]
    inv = F.inv(a)
    assert [int(v) for v in F.to_ints(inv)] == [pow(x, F.p - 2, F.p) for x in xs]
    # inv(0) == 0 convention
    z = F.zeros((1,))
    assert int(F.to_ints(F.inv(z))[0]) == 0


def test_root_of_unity():
    for field_fn in FIELDS:
        F = field_fn()
        w = F.root_of_unity
        assert pow(w, 1 << F.two_adicity, F.p) == 1
        assert pow(w, 1 << (F.two_adicity - 1), F.p) == F.p - 1


@pytest.mark.parametrize("field_fn", FIELDS)
def test_serialization(field_fn, rng):
    F = field_fn()
    xs = _rand_ints(rng, F.p, 5)
    a = F.from_ints(xs)
    canon = F.to_canonical_limbs(a)
    raw = F.canonical_to_bytes(canon)
    assert len(raw) == 5 * F.elem_bytes
    for k, x in enumerate(xs):
        chunk = raw[k * F.elem_bytes:(k + 1) * F.elem_bytes]
        assert int.from_bytes(chunk, "little") == x
    # canonical -> montgomery roundtrip
    back = F.from_canonical_limbs(canon)
    assert [int(v) for v in F.to_ints(back)] == xs


@pytest.mark.parametrize("field_fn", [edwards_fr, alt_bn128_fr])
def test_random_sampling_uniform(field_fn):
    """zk masking draws must cover the full field range: high bits of
    random_ints draws must not be systematically zero (round-1 VERDICT
    weakness 4: 62-bit draws in a 181-bit field leak)."""
    F = field_fn()
    rng = np.random.default_rng(99)
    draws = F.random_ints(256, rng)
    assert all(0 <= v < F.p for v in draws)
    top_bits_set = sum(1 for v in draws if v >> (F.p.bit_length() - 8))
    # each draw has its top byte nonzero w.p. ~ (p >> (bits-8)) / 256 > 1/4
    assert top_bits_set > 16
    # device-array sampling agrees in distribution (same code path)
    arr = F.to_ints(F.random((64,), np.random.default_rng(7)))
    assert any(int(v) >> (F.p.bit_length() - 16) for v in arr)
