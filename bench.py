"""Benchmark entry point — prints ONE JSON line for the driver.

Round-1 metric: single-chip NTT throughput (butterflies/s) on the real TPU,
over the edwards_Fr 181-bit field at 2^18 points — the hottest kernel of the
Aurora/Fractal provers (SURVEY.md §3.4, BASELINE.json "NTT butterflies/s").

vs_baseline compares against an estimated libiop single-core C++ NTT:
~100ns per butterfly (Montgomery mul + add/sub on 3x64-bit limbs, cache-
resident; consistent with the reference's benchmark_fft design point of
2^20 in ~1s, CHANGELOG v0.1.0 "2.2x faster") => 1e7 butterflies/s.
The reference binaries cannot be built here (git submodules absent), so this
anchor is an estimate, stated explicitly.
"""
import json
import sys
import time


def main():
    import jax
    from libiop_tpu.fields.prime import edwards_fr
    from libiop_tpu.algebra.domains import MultiplicativeCoset
    from libiop_tpu.algebra.fft import fft

    F = edwards_fr()
    dim = 18
    N = 1 << dim
    dom = MultiplicativeCoset(F, dim, shift=F.multiplicative_generator)
    # warm caches eagerly (twiddles), then compile the NTT once
    dom.generator_powers().block_until_ready()
    dom.shift_powers().block_until_ready()
    coeffs = F.random((N,), __import__("numpy").random.default_rng(7))
    ntt = jax.jit(lambda c: fft(c, dom))
    ntt(coeffs).block_until_ready()  # compile
    runs = 5
    t0 = time.time()
    for _ in range(runs):
        out = ntt(coeffs)
    out.block_until_ready()
    dt = (time.time() - t0) / runs
    butterflies = (N // 2) * dim
    rate = butterflies / dt
    baseline_rate = 1e7  # est. libiop single-core (see module docstring)
    print(json.dumps({
        "metric": f"ntt_butterflies_per_s_edwards181_2e{dim}",
        "value": round(rate),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / baseline_rate, 2),
    }))


if __name__ == "__main__":
    main()
