"""Distributed NTT: four-step (Bailey) decomposition over a device mesh.

The reference is single-threaded; this is the designed-for-TPU scale-out
(SURVEY.md §5 "long-context" analogue: codeword length is the parallel axis).

N = R * C with the input viewed as x[j1 + R*j2] -> grid [j2, j1] and the
mesh sharding the j1 axis:

  1. C-point sub-NTTs along j2    — shard-local (batched over local j1)
  2. twiddle multiply w^(j1*k2)   — shard-local elementwise
  3. all-to-all: reshard j1->k2   — the ONE collective, rides the ICI ring
  4. R-point sub-NTTs along j1    — shard-local

Output is the natural-order codeword X[k1*C + k2] (transposed back).  The
collectives are expressed with jax.experimental.shard_map + lax.all_to_all;
under jit, GSPMD fuses the local stages.  Sub-NTTs reuse the single-chip
scan-butterfly path, so the traced graph stays O(1) in N.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.8
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..fields.prime import PrimeField
from ..algebra.domains import MultiplicativeCoset, host_powers
from ..algebra.fft import fft

CODEWORD_AXIS = "cw"


class ShardedNTT:
    """Plans a four-step NTT of size N = 2^dim over ``mesh`` (1-D)."""

    def __init__(self, domain: MultiplicativeCoset, mesh: Mesh):
        F = domain.field
        self.F = F
        self.domain = domain
        self.mesh = mesh
        self.D = mesh.shape[CODEWORD_AXIS]
        N = domain.order
        logN = domain.dim
        logR = logN // 2
        # R must be divisible by D (j1 axis is sharded)
        while (1 << logR) % self.D:
            logR += 1
        self.R = 1 << logR
        self.C = N >> logR
        assert self.R % self.D == 0 and self.C >= 1
        g = domain.g
        # sub-domains: C-point NTT uses g^R, R-point uses g^C (no shifts —
        # the coset shift is folded into the coefficients up front)
        self.dom_C = MultiplicativeCoset(F, logN - logR, 1, pow(g, self.R, F.p))
        self.dom_R = MultiplicativeCoset(F, logR, 1, pow(g, self.C, F.p))
        # inter-step twiddles w^(j1*k2) as an (L, R, C) grid, plus shift powers
        W = domain.generator_powers()  # (L, N) powers of g
        idx = (np.arange(self.R, dtype=np.int64)[:, None]
               * np.arange(self.C, dtype=np.int64)[None, :]) % N
        self.twiddle_grid = np.take(np.asarray(W), idx.reshape(-1), axis=1
                                    ).reshape(F.L, self.R, self.C)
        self.shift_powers = domain.shift_powers() if domain.shift != 1 else None
        self._jitted = None

    def _local_fn(self, x_grid, twiddle_local):
        """Body run per-shard: x_grid (L, C, R/D) [j2, local j1];
        twiddle_local (L, R/D, C) [local j1, k2]."""
        F = self.F
        # step 1: C-point NTTs along the j2 axis (move it to the last axis)
        a = jnp.swapaxes(x_grid, 1, 2)            # (L, R/D, C)
        a = fft(a, self.dom_C)                    # DFT over j2 -> [j1, k2]
        # step 2: twiddles w^(j1*k2) — shard-local elementwise
        a = F.mul(a, twiddle_local)
        # step 3: the one collective — reshard j1 -> k2:
        # split the k2 axis into D chunks, concatenate along the j1 axis
        a = jax.lax.all_to_all(a, CODEWORD_AXIS, split_axis=2, concat_axis=1,
                               tiled=True)        # (L, R, C/D) [j1, k2_local]
        # step 4: R-point NTTs along j1
        a = jnp.swapaxes(a, 1, 2)                 # (L, C/D, R)
        a = fft(a, self.dom_R)                    # DFT over j1 -> [k2, k1]
        return a

    def __call__(self, coeffs):
        """coeffs: (L, N) natural order; returns the natural-order codeword
        (L, N), computed with a single all-to-all across the mesh."""
        F = self.F
        N = self.domain.order
        if self._jitted is None:
            spec_in = P(None, None, CODEWORD_AXIS)   # grid [j2, j1]: shard j1
            spec_tw = P(None, CODEWORD_AXIS, None)   # twiddles [j1, k2]: by j1
            spec_out = P(None, CODEWORD_AXIS, None)  # out [k2, k1]: shard k2

            local = shard_map(self._local_fn, mesh=self.mesh,
                              in_specs=(spec_in, spec_tw),
                              out_specs=spec_out)

            def run(c, tw):
                if self.shift_powers is not None:
                    c = F.mul(c, self.shift_powers)
                grid = c.reshape(F.L, self.C, self.R)  # [j2, j1] row-major
                out = local(grid, tw)
                # out: (L, C, R) = [k2, k1]; natural index = k1*C + k2
                return jnp.swapaxes(out, 1, 2).reshape(F.L, N)

            self._jitted = jax.jit(run)
        return self._jitted(coeffs, self.twiddle_grid)
