"""Radix-2 NTT over multiplicative cosets, TPU-first.

Counterpart of the reference's ``multiplicative_FFT_degree_aware`` /
IFFT paths (libiop/algebra/fft.tcc:236-361, 408-475), re-designed for XLA:

* natural-order evaluations in/out (evals[k] = f(shift * g^k)), matching the
  reference's element ordering so downstream coset layouts (FRI folds, BCS
  leaf serialization) are stride-structured;
* iterative decimation-in-time with bit-reversed input: each stage is a
  reshape + one batched field mul + add/sub — pure dense tensor ops, no
  data-dependent control flow, O(log N) stages in the traced graph;
* degree-aware: a polynomial with d <= N coefficients skips the first
  log2(N/d) stages entirely — they reduce to duplicating coefficients
  (fft.tcc:252-289's trick) — so cost is O(N log d);
* IFFT of known degree shrinks to the minimal subdomain first
  (fft.tcc:435-475) via a strided slice.

All data is (L, n) Montgomery limb arrays (limbs-first; see fields/prime.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.prime import PrimeField
from .domains import MultiplicativeCoset, bitrev_permutation, device_powers


def _bcast(w, ndim):
    """Reshape (L, m) twiddles/scales to broadcast over (L, *batch, m)."""
    return w.reshape((w.shape[0],) + (1,) * (ndim - 2) + (w.shape[1],))


# Above this size the O(log N)-stage unrolled graph is replaced by a
# lax.scan with a single flat-indexed butterfly stage (O(1) graph size —
# compile time stays constant as N grows; each stage costs two gathers).
# Measured on TPU v5e: unrolled runs ~2-8x faster (contiguous slices beat
# gathers) and compiles in 30-300s (persistently cached via bench.py), so the
# unrolled path is preferred up to 2^20 and scan guards the tail.
_SCAN_THRESHOLD = 1 << 21

# Above this domain size the twiddle tables and bit-reversal permutation are
# COMPUTED IN-GRAPH (log N squaring-doubles / bit shuffles) instead of being
# closed over as host arrays: closure constants inline into the HLO as
# literals (measured: an 8 MB numpy closure = 16 MB of HLO), and at 2^20 the
# ~200 MB-per-table payload exceeded the remote compile service's request
# limit (HTTP 413).  Montgomery powers computed on device are bit-identical
# to the host tables, so transcripts do not change.
_INGRAPH_CONST_N = 1 << 19


def _device_powers_of(F: PrimeField, base_int: int, n: int):
    """[base^k, k < n] as (L, n) Montgomery limbs, computed in-graph from the
    single scalar base (log n squaring-doubles)."""
    from .domains import _powers_doubling
    b = F.from_ints([base_int % F.p]).reshape(F.L)
    return _powers_doubling(F, b, n)[:, :n]


def _device_bitrev_indices(d: int):
    """Bit-reversal permutation of [0, d) as an in-graph int32 vector."""
    n_log = d.bit_length() - 1
    j = jax.lax.iota(jnp.int32, d)
    r = jnp.zeros_like(j)
    for _ in range(n_log):
        r = (r << 1) | (j & 1)
        j = j >> 1
    return r


def _butterfly_stages_scan(F: PrimeField, x, W, N: int, first_m: int):
    """Same computation as _butterfly_stages, expressed as one scanned stage:
    at stage s (m = 2^s), out[j] = x[j & ~m] +/- W[(j & (m-1)) << (n-1-s)] *
    x[j | m].  All indices are bitwise functions of the traced stage counter,
    so the traced graph is a single stage."""
    n_log = N.bit_length() - 1
    s0 = (first_m).bit_length() - 1
    lead = x.shape[:-1]
    j = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)

    def body(xc, s):
        m = jnp.int32(1) << s
        idx_lo = j & ~m
        idx_hi = j | m
        tw_idx = (j & (m - 1)) << (jnp.int32(n_log - 1) - s)
        a = jnp.take(xc, idx_lo, axis=-1)
        b = jnp.take(xc, idx_hi, axis=-1)
        w = jnp.take(W, tw_idx, axis=-1)
        w = _bcast(w, xc.ndim) if xc.ndim > 2 else w
        t = F.mul(w, b)
        plus = F.add(a, t)
        minus = F.sub(a, t)
        is_hi = ((j & m) != 0)
        out = jnp.where(is_hi, minus, plus)
        return out, None

    stages = jnp.arange(s0, n_log, dtype=jnp.int32)
    out, _ = jax.lax.scan(body, x, stages)
    return out


def _butterfly_stages(F: PrimeField, x, W, N: int, first_m: int):
    """Run DIT butterfly stages m = first_m, 2*first_m, ..., N/2 on
    x (L, *batch, N).

    W is (L, N) powers of the domain generator g; stage-m twiddles are the
    strided slice W[:, :: N/(2m)][:, :m].
    """
    m = first_m
    lead = x.shape[:-1]
    while m < N:
        w = _bcast(W[:, :: N // (2 * m)][:, :m], x.ndim + 1)   # (L, 1..., 1, m)
        xb = x.reshape(lead + (N // (2 * m), 2 * m))
        a = xb[..., :m]
        b = xb[..., m:]
        t = F.mul(w, b)
        x = jnp.concatenate([F.add(a, t), F.sub(a, t)], axis=-1).reshape(lead + (N,))
        m *= 2
    return x


def fft(coeffs, domain: MultiplicativeCoset):
    """Evaluate polynomial(s) with coefficient array ``coeffs`` (L, *batch, d)
    over ``domain`` (order N >= d); returns (L, *batch, N) natural-order
    evaluations.

    Eager callers are transparently routed through a cached jit (one device
    dispatch per call — critical under remote-TPU dispatch latency); traced
    callers inline as before."""
    if not isinstance(coeffs, jax.core.Tracer):
        return _eager_jit("fft", _fft_impl, coeffs, domain)
    return _fft_impl(coeffs, domain)


def _fft_impl(coeffs, domain: MultiplicativeCoset):
    F = domain.field
    N = domain.order
    d = coeffs.shape[-1]
    if d & (d - 1):  # pad to the next power of two
        d2 = 1 << d.bit_length()
        pad = jnp.zeros(coeffs.shape[:-1] + (d2 - d,), dtype=jnp.uint32)
        coeffs = jnp.concatenate([coeffs, pad], axis=-1)
        d = d2
    assert d <= N, (d, N)
    big = N >= _INGRAPH_CONST_N
    if domain.shift != 1:
        sp = _device_powers_of(F, domain.shift, d) if big \
            else domain.shift_powers()[:, :d]
        coeffs = F.mul(coeffs, _bcast(sp, coeffs.ndim))
    if d == 1:
        return jnp.broadcast_to(coeffs[..., :1],
                                coeffs.shape[:-1] + (N,)).astype(jnp.uint32)
    # bit-reverse the d coefficients, then duplicate each N/d times
    rev = _device_bitrev_indices(d) if big \
        else jnp.asarray(bitrev_permutation(d))
    x = jnp.take(coeffs, rev, axis=-1)
    if N > d:
        x = jnp.repeat(x, N // d, axis=-1)
    W = _device_powers_of(F, domain.g, N) if big \
        else domain.generator_powers()
    stages = _butterfly_stages_scan if N >= _SCAN_THRESHOLD else _butterfly_stages
    return stages(F, x, W, N, first_m=N // d)


def ifft(evals, domain: MultiplicativeCoset):
    """Interpolate: (L, *batch, N) natural-order evals -> coefficients."""
    if not isinstance(evals, jax.core.Tracer):
        return _eager_jit("ifft", _ifft_impl, evals, domain)
    return _ifft_impl(evals, domain)


def _ifft_impl(evals, domain: MultiplicativeCoset):
    F = domain.field
    N = domain.order
    assert evals.shape[-1] == N
    if N == 1:
        return evals
    big = N >= _INGRAPH_CONST_N
    rev = _device_bitrev_indices(N) if big \
        else jnp.asarray(bitrev_permutation(N))
    x = jnp.take(evals, rev, axis=-1)
    Winv = _device_powers_of(F, pow(domain.g, F.p - 2, F.p), N) if big \
        else domain.inverse_generator_powers()
    stages = _butterfly_stages_scan if N >= _SCAN_THRESHOLD else _butterfly_stages
    x = stages(F, x, Winv, N, first_m=1)
    # scale by N^{-1}
    n_inv = F.from_ints([pow(N, F.p - 2, F.p)]).reshape(
        (F.L,) + (1,) * (x.ndim - 1))
    x = F.mul(x, n_inv)
    if domain.shift != 1:
        isp = _device_powers_of(F, pow(domain.shift, F.p - 2, F.p), N) if big \
            else domain.inverse_shift_powers()[:, :N]
        x = F.mul(x, _bcast(isp, x.ndim))
    return x


def ifft_of_known_degree(evals, domain: MultiplicativeCoset, degree_bound: int):
    """IFFT where the underlying polynomial is known to have < degree_bound
    coefficients: interpolate over the minimal subdomain (fft.tcc:435-475)."""
    F = domain.field
    N = domain.order
    d = max(1, degree_bound)
    d = 1 << (d - 1).bit_length()  # next power of two
    assert d <= N
    if d == N:
        return ifft(evals, domain)
    sub = domain.get_subset_of_order(d)
    sub_evals = evals[..., :: N // d]
    return ifft(sub_evals, sub)


# jitted-and-cached entry points for eager callers (tests, host orchestration)
_jit_cache = {}


def _eager_jit(tag, impl, arr, domain):
    key = (tag, domain, getattr(arr, "shape", None), _SCAN_THRESHOLD)
    fn = _jit_cache.get(key)
    if fn is None:
        fn = _jit_cache[key] = jax.jit(lambda a: impl(a, domain))
    return fn(jnp.asarray(arr))


def jfft(coeffs, domain: MultiplicativeCoset):
    key = ("fft", domain, coeffs.shape[1])
    fn = _jit_cache.get(key)
    if fn is None:
        fn = _jit_cache[key] = jax.jit(lambda c: fft(c, domain))
    return fn(coeffs)


def jifft(evals, domain: MultiplicativeCoset):
    key = ("ifft", domain)
    fn = _jit_cache.get(key)
    if fn is None:
        fn = _jit_cache[key] = jax.jit(lambda e: ifft(e, domain))
    return fn(evals)


def naive_fft_ints(coeff_ints, domain: MultiplicativeCoset):
    """Host-side reference evaluation via Horner (libiop fft.tcc:14-37 role).
    coeff_ints: list of canonical ints. Returns list of canonical ints."""
    p = domain.field.p
    out = []
    for k in range(domain.order):
        x = domain.element_by_index_int(k)
        acc = 0
        for c in reversed(coeff_ints):
            acc = (acc * x + int(c)) % p
        out.append(acc)
    return out


