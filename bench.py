"""Benchmark entry point — prints ONE JSON line for the driver.

Primary metric: single-chip NTT throughput (butterflies/s) on the real TPU
over the edwards_Fr 181-bit field — the hottest kernel of the Aurora/Fractal
provers (SURVEY.md §3.4, BASELINE.json "NTT butterflies/s").

The axon remote-compile service has highly variable latency (30s-500s for
the same graph), so the NTT compile is bounded by an alarm; if it trips, the
fallback metric is batched field-multiply throughput (compiles in seconds).

vs_baseline compares against estimated libiop single-core C++ rates:
* NTT: ~1e7 butterflies/s (Montgomery mul + add/sub on 3x64b limbs,
  cache-resident; consistent with the reference's benchmark_fft design point)
* field mul: ~2.5e7 muls/s (~40ns per 181-bit Montgomery mul)
The reference binaries cannot be built here (git submodules absent), so the
anchors are estimates, stated explicitly.
"""
import json
import os
import subprocess
import sys
import time

_NTT_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import jax
import libiop_tpu.algebra.fft as fftmod
from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.algebra.domains import MultiplicativeCoset
import numpy as np
F = edwards_fr()
dim = {dim}
N = 1 << dim
dom = MultiplicativeCoset(F, dim, shift=F.multiplicative_generator)
dom.generator_powers(); dom.shift_powers()  # host twiddle caches
coeffs = F.random((N,), np.random.default_rng(7))
fftmod._SCAN_THRESHOLD = 1  # O(1)-graph path: smallest compile
ntt = jax.jit(lambda c: fftmod.fft(c, dom))
ntt(coeffs).block_until_ready()
runs = 5
t0 = time.time()
for _ in range(runs):
    out = ntt(coeffs)
out.block_until_ready()
dt = (time.time() - t0) / runs
print(json.dumps({{"dt": dt}}))
"""


def bench_ntt(dim=16, budget_s=300):
    """Run the NTT timing in a subprocess so an arbitrarily slow remote
    compile can be killed (a Python alarm cannot interrupt the C call)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    code = _NTT_CHILD.format(repo=repo, dim=dim)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         timeout=budget_s, text=True)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-500:])
    dt = json.loads(out.stdout.strip().splitlines()[-1])["dt"]
    N = 1 << dim
    rate = (N // 2) * dim / dt
    return {
        "metric": f"ntt_butterflies_per_s_edwards181_2e{dim}",
        "value": round(rate),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / 1e7, 2),
    }


def bench_mul(F, dim=20):
    import jax
    import numpy as np

    N = 1 << dim
    rng = np.random.default_rng(7)
    a = F.random((N,), rng)
    b = F.random((N,), rng)
    mulj = jax.jit(F.mul)
    mulj(a, b).block_until_ready()
    runs = 20
    t0 = time.time()
    out = a
    for _ in range(runs):
        out = mulj(out, b)
    out.block_until_ready()
    dt = (time.time() - t0) / runs
    rate = N / dt
    return {
        "metric": f"field_mul_per_s_edwards181_2e{dim}",
        "value": round(rate),
        "unit": "muls/s",
        "vs_baseline": round(rate / 2.5e7, 2),
    }


def main():
    try:
        result = bench_ntt()
    except Exception:
        from libiop_tpu.fields.prime import edwards_fr
        result = bench_mul(edwards_fr())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
