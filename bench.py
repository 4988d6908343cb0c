"""Benchmark entry point — prints ONE JSON line for the driver.

Primary metric: **Aurora prover seconds at 2^14 R1CS over edwards_Fr**
(BASELINE.json config 1) on the real TPU chip, end-to-end through the public
SNARK API (witness encode, lincheck/sumcheck, FRI, Merkle/BCS).  Secondary
metrics (recorded to BENCH_DETAILS.json alongside): NTT butterflies/s,
blake2b leaf hashes/s, argument size, and a per-phase timing tree.

The axon remote-compile service has highly variable latency (30s-500s per
graph), so each stage runs in a subprocess under its own budget; if the
Aurora run cannot finish, the fallback metric is the NTT rate (the round-1
metric), then batched field-multiply throughput.

vs_baseline anchors (the C++ reference cannot be built here — submodules
absent — so anchors are estimates, stated explicitly):
* Aurora prover: libiop's paper-reported ~120 s at 2^20 constraints single
  core [BCRSVW19] scaled O(N log N) to 2^14 => ~1.6 s.
* NTT: ~1e7 butterflies/s single-core (Montgomery mul on 3x64b limbs).
* field mul: ~2.5e7 muls/s (~40 ns per 181-bit Montgomery mul).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

_AURORA_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from libiop_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax, jax.numpy as jnp
# Warm the tunnel's device->host transfer channel before anything else: the
# FIRST d2h in a process stalls for tens of seconds to minutes (one-time
# channel setup in the remote-TPU service); pay it here, not mid-proof.
_w = jax.jit(lambda x: x + 1)(jnp.ones((8,), jnp.uint32))
_t0 = time.time(); jax.device_get(_w)
print(json.dumps({{"warm_transfer_s": time.time() - _t0}}), file=sys.stderr)
import libiop_tpu.algebra.fft as fftmod
fftmod._SCAN_THRESHOLD = 1 << {scan_log}  # bound XLA graph size / compile time
from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.relations.examples import generate_r1cs_example
from libiop_tpu.snark.aurora import (AuroraSnarkParams, aurora_snark_prover,
                                     aurora_snark_verifier)
from libiop_tpu.utils.profiling import PROFILER as prof

F = edwards_fr()
log_n = {log_n}
n = 1 << log_n
cs, primary, aux = generate_r1cs_example(F, n, 15, n - 1,
                                         np.random.default_rng(0))
params = AuroraSnarkParams(security_parameter=128, RS_extra_dimensions=2,
                           fri_localization_parameter=2, make_zk=False,
                           pow_bits=20)
with prof.block("warmup_proof"):
    # first proof pays all remote compiles; persistently cached after
    proof = aurora_snark_prover(cs, primary, aux, params)
blob = proof.serialize()
prof.records.clear()  # keep only the measured proof's phase tree
t0 = time.time()
with prof.block("aurora_prove"):
    proof = aurora_snark_prover(cs, primary, aux, params)
dt = time.time() - t0
t0 = time.time()
ok = aurora_snark_verifier(cs, primary, proof, params)
t_verify = time.time() - t0
assert ok
print(json.dumps({{"prover_s": dt, "verifier_s": t_verify,
                   "argument_bytes": len(blob),
                   "profile": prof.report()}}))
"""

_NTT_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from libiop_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
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
CHAIN = 8  # chain NTTs inside ONE graph: excludes tunnel dispatch latency
def chained(c):
    for _ in range(CHAIN):
        c = fftmod.fft(c, dom)
    return c
ntt = jax.jit(chained)
ntt(coeffs).block_until_ready()
runs = 5
t0 = time.time()
for _ in range(runs):
    out = ntt(coeffs)
out.block_until_ready()
dt = (time.time() - t0) / (runs * CHAIN)
print(json.dumps({{"dt": dt}}))
"""

_HASH_CHILD = r"""
import json, sys, time, os
sys.path.insert(0, {repo!r})
from libiop_tpu.bcs import native_blake2b
blocks = [os.urandom(96) for _ in range(1 << 18)]
native_blake2b.hash_batch(blocks[:64], 32, tag=b"\x00")  # warm/build
t0 = time.time()
out = native_blake2b.hash_batch(blocks, 32, tag=b"\x00")
dt = time.time() - t0
assert out is not None
print(json.dumps({{"dt": dt, "n": len(blocks)}}))
"""


def _run_child(code: str, budget_s: int, attempts: int = 1) -> dict:
    """Run a bench stage in a subprocess; retry on failure — the remote-TPU
    service intermittently returns UNAVAILABLE / topology errors and the
    persistent compile cache makes retries cheap."""
    last = None
    for _ in range(attempts):
        try:
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, timeout=budget_s,
                                 text=True)
        except subprocess.TimeoutExpired as e:
            last = RuntimeError(f"timeout after {budget_s}s")
            continue
        if out.returncode != 0:
            last = RuntimeError(out.stderr[-800:])
            continue
        return json.loads(out.stdout.strip().splitlines()[-1])
    raise last


def bench_aurora(log_n=14, scan_log=14, budget_s=2400) -> tuple:
    res = _run_child(
        _AURORA_CHILD.format(repo=REPO, log_n=log_n, scan_log=scan_log),
        budget_s, attempts=2)
    # reference anchor: ~120 s at 2^20 single core, O(N log N) scaling
    ref = 120.0 * ((1 << log_n) * log_n) / ((1 << 20) * 20)
    primary = {
        "metric": f"aurora_prover_s_edwards181_2e{log_n}",
        "value": round(res["prover_s"], 3),
        "unit": "seconds",
        "vs_baseline": round(ref / max(res["prover_s"], 1e-9), 2),
    }
    return primary, res


def bench_ntt(dim=16, budget_s=600) -> dict:
    res = _run_child(_NTT_CHILD.format(repo=REPO, dim=dim), budget_s,
                     attempts=2)
    N = 1 << dim
    rate = (N // 2) * dim / res["dt"]
    return {
        "metric": f"ntt_butterflies_per_s_edwards181_2e{dim}",
        "value": round(rate),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / 1e7, 2),
    }


def bench_hashes(budget_s=200) -> dict:
    res = _run_child(_HASH_CHILD.format(repo=REPO), budget_s)
    rate = res["n"] / res["dt"]
    return {"metric": "blake2b_leaf_hashes_per_s", "value": round(rate),
            "unit": "hashes/s", "vs_baseline": round(rate / 2.0e6, 2)}


def bench_mul(dim=20) -> dict:
    import numpy as np
    import jax
    from libiop_tpu.fields.prime import edwards_fr
    F = edwards_fr()
    N = 1 << dim
    rng = np.random.default_rng(7)
    a = F.random((N,), rng)
    b = F.random((N,), rng)
    mulj = jax.jit(F.mul)
    mulj(a, b).block_until_ready()
    t0 = time.time()
    out = a
    for _ in range(20):
        out = mulj(out, b)
    out.block_until_ready()
    dt = (time.time() - t0) / 20
    return {"metric": f"field_mul_per_s_edwards181_2e{dim}",
            "value": round(N / dt), "unit": "muls/s",
            "vs_baseline": round((N / dt) / 2.5e7, 2)}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--sweep":
        # measurement mode for BASELINE.md: aurora prover at each log_n
        for log_n in [int(a) for a in sys.argv[2:]]:
            try:
                primary, res = bench_aurora(
                    log_n=log_n, scan_log=min(log_n, 14),
                    budget_s=3000)
                print(json.dumps({**primary,
                                  "verifier_s": round(res["verifier_s"], 3),
                                  "argument_bytes": res["argument_bytes"],
                                  "profile": res.get("profile")}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"log_n": log_n, "error": str(e)[-300:]}),
                      flush=True)
        return
    details = {}
    primary = None
    try:
        primary, aurora_res = bench_aurora()
        details["aurora_2e14"] = aurora_res
    except Exception as e:  # noqa: BLE001 — fall back to the round-1 metric
        details["aurora_error"] = str(e)[-300:]
    for name, fn in [("ntt", bench_ntt), ("hashes", bench_hashes)]:
        try:
            details[name] = fn()
        except Exception as e:  # noqa: BLE001
            details[name + "_error"] = str(e)[-300:]
    if primary is None:
        primary = details.get("ntt")
    if primary is None:
        primary = bench_mul()
    try:
        with open(os.path.join(REPO, "BENCH_DETAILS.json"), "w") as f:
            json.dump(details, f, indent=1)
    except OSError:
        pass
    print(json.dumps(primary))


if __name__ == "__main__":
    main()
