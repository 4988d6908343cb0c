"""Distributed four-step NTT on the virtual 8-device CPU mesh: must agree
with the single-device NTT bit-for-bit."""
import numpy as np
import pytest
import jax

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.algebra.domains import MultiplicativeCoset
from libiop_tpu.algebra.fft import fft
from libiop_tpu.parallel.mesh import make_codeword_mesh
from libiop_tpu.parallel.shard_ntt import ShardedNTT


@pytest.mark.parametrize("shift", [1, 19])
@pytest.mark.parametrize("dim", [8, 9])
def test_four_step_matches_single_device(dim, shift, rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    F = edwards_fr()
    dom = MultiplicativeCoset(F, dim, shift=shift)
    mesh = make_codeword_mesh(8)
    ntt = ShardedNTT(dom, mesh)
    coeffs = F.from_ints([int(rng.integers(0, 1 << 61))
                          for _ in range(dom.order)])
    got = np.asarray(jax.device_get(ntt(coeffs)))
    want = np.asarray(jax.device_get(fft(coeffs, dom)))
    assert (got == want).all()
