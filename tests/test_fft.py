"""FFT/IFFT vs naive Horner evaluation (mirrors tests/algebra/test_fft.cpp)."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr, alt_bn128_fr
from libiop_tpu.algebra.domains import MultiplicativeCoset
from libiop_tpu.algebra.fft import fft, ifft, ifft_of_known_degree, naive_fft_ints


def _rand_ints(rng, p, n):
    return [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % p
            for _ in range(n)]


@pytest.mark.parametrize("shift", [1, 19])
@pytest.mark.parametrize("field_fn", [edwards_fr, alt_bn128_fr])
def test_fft_matches_naive(field_fn, shift, rng):
    F = field_fn()
    dom = MultiplicativeCoset(F, dim=4, shift=shift)
    coeffs = _rand_ints(rng, F.p, dom.order)
    got = [int(v) for v in F.to_ints(fft(F.from_ints(coeffs), dom))]
    assert got == naive_fft_ints(coeffs, dom)


@pytest.mark.parametrize("shift", [1, 19])
def test_degree_aware_fft(shift, rng):
    F = edwards_fr()
    dom = MultiplicativeCoset(F, dim=5, shift=shift)
    for d in [1, 2, 8, 32]:
        coeffs = _rand_ints(rng, F.p, d)
        got = [int(v) for v in F.to_ints(fft(F.from_ints(coeffs), dom))]
        assert got == naive_fft_ints(coeffs, dom), f"degree {d}"


@pytest.mark.parametrize("shift", [1, 23])
def test_ifft_roundtrip(shift, rng):
    F = edwards_fr()
    dom = MultiplicativeCoset(F, dim=5, shift=shift)
    coeffs = _rand_ints(rng, F.p, dom.order)
    evals = fft(F.from_ints(coeffs), dom)
    back = [int(v) for v in F.to_ints(ifft(evals, dom))]
    assert back == coeffs


def test_ifft_known_degree(rng):
    F = edwards_fr()
    dom = MultiplicativeCoset(F, dim=6, shift=19)
    d = 8
    coeffs = _rand_ints(rng, F.p, d)
    evals = fft(F.from_ints(coeffs), dom)
    back = [int(v) for v in F.to_ints(ifft_of_known_degree(evals, dom, d))]
    assert back == coeffs


def test_subset_strided_positions():
    """Elements of get_subset_of_order(c) sit at positions k*(N/c)."""
    F = edwards_fr()
    dom = MultiplicativeCoset(F, dim=6, shift=19)
    sub = dom.get_subset_of_order(8)
    for k in range(8):
        assert sub.element_by_index_int(k) == dom.element_by_index_int(k * (64 // 8))


def test_scan_butterflies_match_unrolled(rng):
    """The O(1)-graph scan stage must agree with the unrolled stages."""
    import jax.numpy as jnp
    from libiop_tpu.algebra.fft import (_butterfly_stages,
                                        _butterfly_stages_scan)
    from libiop_tpu.algebra.domains import bitrev_permutation
    F = edwards_fr()
    dom = MultiplicativeCoset(F, dim=7)
    coeffs = F.from_ints([int(rng.integers(0, 1 << 60)) for _ in range(128)])
    x = jnp.take(coeffs, jnp.asarray(bitrev_permutation(128)), axis=-1)
    W = dom.generator_powers()
    a = _butterfly_stages(F, x, W, 128, first_m=1)
    b = _butterfly_stages_scan(F, x, W, 128, first_m=1)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_coset_index_roundtrip():
    F = edwards_fr()
    dom = MultiplicativeCoset(F, dim=6)
    for pos in [0, 1, 17, 63]:
        ci = dom.coset_index(pos, 4)
        ii = dom.intra_coset_index(pos, 4)
        assert dom.position_by_coset_indices(ci, ii, 4) == pos
