"""Compile-light (scanned) vs unrolled field kernels are BIT-identical.

The CI suite and the multichip dryrun gate run with
``fields.prime.COMPILE_LIGHT = True`` (lax.scan limb loops — ~7x smaller XLA
graphs); production TPU runs use the unrolled default (better fusion).  These
tests pin that the two lowerings of the same Montgomery arithmetic agree
bit-for-bit, so transcripts produced under either mode are interchangeable.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import libiop_tpu.fields.autojit as autojit_mod
import libiop_tpu.fields.prime as prime_mod
from libiop_tpu.fields.prime import edwards_fr, alt_bn128_fr


def _with_mode(light, fn):
    prev = prime_mod.COMPILE_LIGHT
    prime_mod.COMPILE_LIGHT = light
    autojit_mod._CACHE.clear()  # drop graphs traced under the other mode
    try:
        return fn()
    finally:
        prime_mod.COMPILE_LIGHT = prev
        autojit_mod._CACHE.clear()


@pytest.mark.parametrize("field_ctor", [edwards_fr, alt_bn128_fr])
def test_mul_inv_reduce_bit_identical(field_ctor, rng):
    F = field_ctor()
    a = F.random((129,), rng)
    b = F.random((129,), rng)
    lazy = jnp.moveaxis(
        jnp.moveaxis(a, 0, -1).astype(jnp.uint32) + jnp.moveaxis(b, 0, -1),
        -1, 0)

    def run():
        return (np.asarray(F.mul(a, b)), np.asarray(F.inv(a)),
                np.asarray(F.lazy_sum_reduce(lazy)),
                np.asarray(F.pow_static(b, 12345)))

    unrolled = _with_mode(False, run)
    scanned = _with_mode(True, run)
    for u, s in zip(unrolled, scanned):
        assert (u == s).all()


def test_divide_by_vanishing_matches_mul_back(rng):
    """q*Z_H + r == f for the batched block-division (all chunk paths)."""
    from libiop_tpu.algebra.domains import MultiplicativeCoset
    from libiop_tpu.algebra.poly import divide_by_vanishing, mul_by_vanishing
    F = edwards_fr()
    # (8192, 1): nb=8192 > c=2048 => nc=4, exercising the chunk-carry branch;
    # 4059 (non-multiple of h=8): exercises the tail-padding branch
    for d, hdim, shift in [(1 << 6, 2, 19), (1 << 5, 5, 19), (1 << 4, 1, 1),
                           (1 << 12, 1, 19), (1 << 13, 1, 19), (4059, 3, 19)]:
        H = MultiplicativeCoset(F, hdim, shift=shift)
        coeffs = F.from_ints([int(x) for x in rng.integers(0, 2**60, size=d)])
        q, r = divide_by_vanishing(coeffs, H)
        h = H.order
        if q.shape[1]:
            back = mul_by_vanishing(q, H)        # Z_H * q, width q+h
            back = jnp.concatenate(
                [back, jnp.zeros((F.L, d - back.shape[1]), jnp.uint32)],
                axis=1) if back.shape[1] < d else back[:, :d]
            full = np.asarray(back.at[:, :h].set(
                F.add(back[:, :h], jnp.asarray(np.asarray(r)))))
        else:
            full = np.zeros((F.L, d), np.uint32)
            full[:, :h] = np.asarray(r)[:, :h]
        want = np.zeros_like(full)
        cf = np.asarray(coeffs)
        want[:, :min(d, cf.shape[1])] = cf[:, :d]
        assert (full == want).all()
