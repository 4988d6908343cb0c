"""Benchmark entry point — prints JSON lines; the driver parses the LAST one.

Primary metric: **Aurora prover seconds at 2^14 R1CS over edwards_Fr**
(BASELINE.json config 1) on the real TPU chip, end-to-end through the public
SNARK API (witness encode, lincheck/sumcheck, FRI, Merkle/BCS).  Secondary
metrics (recorded incrementally to BENCH_DETAILS.json): NTT butterflies/s,
blake2b leaf hashes/s, argument size, verifier seconds, per-phase tree.

Deadline-safe by construction (round-3 postmortem: the old budget arithmetic
could burn the whole driver timeout inside the Aurora stage and print
nothing):
  * a GLOBAL deadline (env GRAFT_BENCH_DEADLINE_S, default 1500 s) bounds the
    whole run; every stage budget is clipped to the time remaining;
  * the cheap, known-good NTT metric runs FIRST and its line is printed
    immediately — the expensive Aurora stage can only *upgrade* the result by
    printing a later line;
  * stages run once each (no retry loops); children print INCREMENTAL JSON
    lines, and a child killed at its timeout still contributes its last
    completed line (subprocess.TimeoutExpired carries partial stdout);
  * BENCH_DETAILS.json is rewritten after every stage.

vs_baseline anchors (the C++ reference cannot be built here — submodules
absent — so anchors are estimates, stated explicitly):
* Aurora prover: libiop's paper-reported ~120 s at 2^20 constraints single
  core [BCRSVW19] scaled O(N log N) to the measured size (2^14 => ~1.6 s).
* NTT: ~1e7 butterflies/s single-core (Montgomery mul on 3x64b limbs).
* field mul: ~2.5e7 muls/s (~40 ns per 181-bit Montgomery mul).
* blake2b: ~2e6 96-byte hashes/s single-core (libsodium).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
DEADLINE = time.time() + float(os.environ.get("GRAFT_BENCH_DEADLINE_S", "1500"))


def _remaining() -> float:
    return DEADLINE - time.time()


_AURORA_CHILD = r"""
import json, sys, time, os
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
print(json.dumps({{"stage": "tunnel", "warm_transfer_s": time.time() - _t0}}),
      flush=True)
# Lowering choice (bit-identical math either way, pinned by
# test_compile_modes): COMPILE_LIGHT (scanned Montgomery mul) keeps graphs
# compact enough to trace in seconds — the fully unrolled mul cost ~250 s
# of tracing+lowering per warm prove that no compile cache can save.  The
# NTT *butterfly stages* stay UNROLLED (scan_log=24): the stage scan ran
# 8-12x slower on the chip (dim 20: 0.82-1.73 s vs 0.136 s per NTT).
import libiop_tpu.fields.prime as prime_mod
prime_mod.COMPILE_LIGHT = True
import libiop_tpu.algebra.fft as fftmod
fftmod._SCAN_THRESHOLD = 1 << {scan_log}
from libiop_tpu.relations.examples import generate_r1cs_example
from libiop_tpu.snark.aurora import (AuroraSnarkParams, aurora_snark_prover,
                                     aurora_snark_verifier)
from libiop_tpu.utils.profiling import PROFILER as prof

{field_setup}
log_n = {log_n}
n = 1 << log_n
cs, primary, aux = generate_r1cs_example(F, n, 15, n - 1,
                                         np.random.default_rng(0))
params = AuroraSnarkParams(security_parameter=128, RS_extra_dimensions=2,
                           fri_localization_parameter={loc}, make_zk={make_zk},
                           pow_bits=20)
t0 = time.time()
with prof.block("warmup_proof"):
    # first proof pays all tracing + (persistently cached) remote compiles
    proof = aurora_snark_prover(cs, primary, aux, params)
warm_s = time.time() - t0
blob = proof.serialize()
print(json.dumps({{"stage": "warm", "warm_prover_s": warm_s,
                   "argument_bytes": len(blob)}}), flush=True)
# median of 3 measured proves: run-to-run tunnel variance was ~2.5x in
# round 4 and single draws misled the committed metric
runs = []
for r in range(3):
    prof.records.clear()
    t0 = time.time()
    with prof.block("aurora_prove"):
        proof = aurora_snark_prover(cs, primary, aux, params)
    runs.append(time.time() - t0)
    med = sorted(runs)[len(runs) // 2] if len(runs) % 2 else \
        sum(sorted(runs)[len(runs) // 2 - 1:len(runs) // 2 + 1]) / 2
    print(json.dumps({{"stage": "prove", "prover_s": med,
                       "prover_runs_s": runs, "warm_prover_s": warm_s,
                       "argument_bytes": len(blob),
                       "profile": prof.report()}}), flush=True)
dt = med
t0 = time.time()
ok = aurora_snark_verifier(cs, primary, proof, params)  # warm verifier jits
warm_verify_s = time.time() - t0
assert ok
print(json.dumps({{"stage": "verify_warm", "prover_s": dt,
                   "prover_runs_s": runs,
                   "warm_prover_s": warm_s, "warm_verifier_s": warm_verify_s,
                   "argument_bytes": len(blob),
                   "profile": prof.report()}}), flush=True)
t0 = time.time()
ok = aurora_snark_verifier(cs, primary, proof, params)
t_verify = time.time() - t0
assert ok
print(json.dumps({{"stage": "done", "prover_s": dt, "verifier_s": t_verify,
                   "prover_runs_s": runs,
                   "warm_prover_s": warm_s, "warm_verifier_s": warm_verify_s,
                   "argument_bytes": len(blob),
                   "profile": prof.report()}}), flush=True)
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
fftmod._SCAN_THRESHOLD = {scan_threshold}
CHAIN = 8  # chain NTTs inside ONE graph: excludes tunnel dispatch latency
def chained(c):
    for _ in range(CHAIN):
        c = fftmod.fft(c, dom)
    return c
ntt = jax.jit(chained)
t0 = time.time()
ntt(coeffs).block_until_ready()
print(json.dumps({{"stage": "compile", "compile_s": time.time() - t0}}),
      flush=True)
runs = 5
t0 = time.time()
for _ in range(runs):
    out = ntt(coeffs)
out.block_until_ready()
dt = (time.time() - t0) / (runs * CHAIN)
print(json.dumps({{"stage": "done", "dt": dt}}), flush=True)
"""

_ADDITIVE_NTT_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from libiop_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
import numpy as np
_w = jax.jit(lambda x: x + 1)(jnp.ones((8,), jnp.uint32)); jax.device_get(_w)
from libiop_tpu.fields.binary import gf192
from libiop_tpu.algebra.subspace import AffineSubspace, additive_fft
F = gf192()
dim = {dim}
N = 1 << dim
dom = AffineSubspace(F, dim)
coeffs = F.random((N,), np.random.default_rng(7))
CHAIN = 8
def chained(c):
    for _ in range(CHAIN):
        c = additive_fft(c, dom)
    return c
ntt = jax.jit(chained)
t0 = time.time(); ntt(coeffs).block_until_ready()
print(json.dumps({{"stage": "compile", "compile_s": time.time() - t0}}),
      flush=True)
runs = 5
t0 = time.time()
for _ in range(runs):
    out = ntt(coeffs)
out.block_until_ready()
dt = (time.time() - t0) / (runs * CHAIN)
print(json.dumps({{"stage": "done", "dt": dt}}), flush=True)
"""


_LIGERO_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from libiop_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax, jax.numpy as jnp
_w = jax.jit(lambda x: x + 1)(jnp.ones((8,), jnp.uint32)); jax.device_get(_w)
import libiop_tpu.fields.prime as prime_mod
prime_mod.COMPILE_LIGHT = True
import libiop_tpu.algebra.fft as fftmod
fftmod._SCAN_THRESHOLD = 1 << 24
from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.relations.examples import generate_r1cs_example
from libiop_tpu.snark.ligero import (LigeroSnarkParams, ligero_snark_prover,
                                     ligero_snark_verifier)
from libiop_tpu.bcs.common import BCSTranscript
F = edwards_fr()
log_n = {log_n}
n = 1 << log_n
cs, primary, aux = generate_r1cs_example(F, n, 15, n - 1,
                                         np.random.default_rng(0))
lp = LigeroSnarkParams(security_parameter=128, RS_extra_dimensions=2,
                       height_width_ratio=0.1, make_zk={make_zk})
t0 = time.time()
proof = ligero_snark_prover(cs, primary, aux, lp,
                            rng=np.random.default_rng(1))
warm_s = time.time() - t0
blob = proof.serialize()
print(json.dumps({{"stage": "warm", "warm_prover_s": warm_s,
                   "argument_bytes": len(blob)}}), flush=True)
t0 = time.time()
proof = ligero_snark_prover(cs, primary, aux, lp,
                            rng=np.random.default_rng(1))
dt = time.time() - t0
print(json.dumps({{"stage": "prove", "prover_s": dt, "warm_prover_s": warm_s,
                   "argument_bytes": len(blob)}}), flush=True)
t0 = time.time()
ok = ligero_snark_verifier(cs, primary, BCSTranscript.deserialize(blob), lp)
warm_verify_s = time.time() - t0
assert ok
t0 = time.time()
ok = ligero_snark_verifier(cs, primary, BCSTranscript.deserialize(blob), lp)
t_verify = time.time() - t0
assert ok
print(json.dumps({{"stage": "done", "prover_s": dt, "verifier_s": t_verify,
                   "warm_prover_s": warm_s, "warm_verifier_s": warm_verify_s,
                   "argument_bytes": len(blob)}}), flush=True)
"""


_FRACTAL_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from libiop_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax, jax.numpy as jnp
_w = jax.jit(lambda x: x + 1)(jnp.ones((8,), jnp.uint32)); jax.device_get(_w)
import libiop_tpu.fields.prime as prime_mod
prime_mod.COMPILE_LIGHT = True
import libiop_tpu.algebra.fft as fftmod
fftmod._SCAN_THRESHOLD = 1 << 24
from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.relations.examples import generate_r1cs_example
from libiop_tpu.snark.fractal import (FractalSnarkParams,
                                      fractal_snark_indexer,
                                      fractal_snark_prover,
                                      fractal_snark_verifier)
from libiop_tpu.bcs.common import BCSTranscript
F = edwards_fr()
log_n = {log_n}
n = 1 << log_n
cs, primary, aux = generate_r1cs_example(F, n, 15, n - 1,
                                         np.random.default_rng(0))
fp = FractalSnarkParams(security_parameter=128, RS_extra_dimensions=2,
                        fri_localization_parameter=2, make_zk={make_zk})
t0 = time.time()
pidx, vidx = fractal_snark_indexer(cs, fp)
t_index = time.time() - t0
print(json.dumps({{"stage": "index", "indexer_s": t_index}}), flush=True)
t0 = time.time()
proof = fractal_snark_prover(cs, primary, aux, pidx, fp,
                             rng=np.random.default_rng(1))
warm_s = time.time() - t0
blob = proof.serialize()
print(json.dumps({{"stage": "warm", "indexer_s": t_index,
                   "warm_prover_s": warm_s,
                   "argument_bytes": len(blob)}}), flush=True)
t0 = time.time()
proof = fractal_snark_prover(cs, primary, aux, pidx, fp,
                             rng=np.random.default_rng(1))
dt = time.time() - t0
print(json.dumps({{"stage": "prove", "indexer_s": t_index, "prover_s": dt,
                   "warm_prover_s": warm_s,
                   "argument_bytes": len(blob)}}), flush=True)
t0 = time.time()
ok = fractal_snark_verifier(cs, primary, vidx,
                            BCSTranscript.deserialize(blob), fp)
warm_verify_s = time.time() - t0
assert ok
t0 = time.time()
ok = fractal_snark_verifier(cs, primary, vidx,
                            BCSTranscript.deserialize(blob), fp)
t_verify = time.time() - t0
assert ok
print(json.dumps({{"stage": "done", "indexer_s": t_index, "prover_s": dt,
                   "verifier_s": t_verify, "warm_prover_s": warm_s,
                   "warm_verifier_s": warm_verify_s,
                   "argument_bytes": len(blob)}}), flush=True)
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
print(json.dumps({{"stage": "done", "dt": dt, "n": len(blocks)}}), flush=True)
"""

_MUL_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from libiop_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax
from libiop_tpu.fields.prime import edwards_fr
F = edwards_fr()
N = 1 << {dim}
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
print(json.dumps({{"stage": "done", "dt": dt, "n": N}}), flush=True)
"""


def _run_child(code: str, budget_s: float) -> dict:
    """Run a bench stage subprocess; return the LAST parseable JSON line it
    printed — even when the child is killed at the timeout (children print
    incremental results)."""
    budget_s = max(5.0, budget_s)
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, timeout=budget_s, text=True)
        stdout, stderr = out.stdout or "", out.stderr or ""
        rc = out.returncode
    except subprocess.TimeoutExpired as e:
        def _s(b):
            return b.decode(errors="replace") if isinstance(b, bytes) else (b or "")
        stdout, stderr, rc = _s(e.stdout), _s(e.stderr), "timeout"
    result = None
    for line in stdout.strip().splitlines():
        try:
            parsed = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(parsed, dict):
            result = parsed
    if result is None:
        raise RuntimeError(f"stage rc={rc}: {stderr[-800:]}")
    result["rc"] = rc
    return result


_FIELD_SETUPS = {
    "edwards181": "from libiop_tpu.fields.prime import edwards_fr\n"
                  "F = edwards_fr()",
    "gf192": "from libiop_tpu.fields.binary import gf192\nF = gf192()",
    "gf64": "from libiop_tpu.fields.binary import gf64\nF = gf64()",
}


def bench_aurora(log_n=14, scan_log=24, budget_s=600, make_zk=False,
                 field="edwards181") -> tuple:
    """Returns (primary_line_or_None, raw_child_result)."""
    loc = 2 if field == "edwards181" else 1
    res = _run_child(
        _AURORA_CHILD.format(repo=REPO, log_n=log_n, scan_log=scan_log,
                             make_zk=make_zk, loc=loc,
                             field_setup=_FIELD_SETUPS[field]),
        budget_s)
    if "prover_s" not in res:
        return None, res  # only the warmup (or tunnel) landed
    # reference anchor: ~120 s at 2^20 single core, O(N log N) scaling
    ref = 120.0 * ((1 << log_n) * log_n) / ((1 << 20) * 20)
    zk = "_zk" if make_zk else ""
    primary = {
        "metric": f"aurora_prover_s_{field}{zk}_2e{log_n}",
        "value": round(res["prover_s"], 3),
        "unit": "seconds",
        "vs_baseline": round(ref / max(res["prover_s"], 1e-9), 2),
    }
    return primary, res


def bench_ntt(dim=16, budget_s=600, scan=False) -> tuple:
    res = _run_child(
        _NTT_CHILD.format(repo=REPO, dim=dim,
                          scan_threshold=(1 if scan else (1 << 21))),
        budget_s)
    if "dt" not in res:
        return None, res
    N = 1 << dim
    rate = (N // 2) * dim / res["dt"]
    return {
        "metric": f"ntt_butterflies_per_s_edwards181_2e{dim}",
        "value": round(rate),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / 1e7, 2),
    }, res


def bench_additive_ntt(dim=16, budget_s=600) -> tuple:
    """Gao-Mateer additive NTT rate over GF(2^192) (BASELINE config 3's
    field; fft.tcc:39-204 counterpart)."""
    res = _run_child(_ADDITIVE_NTT_CHILD.format(repo=REPO, dim=dim), budget_s)
    if "dt" not in res:
        return None, res
    N = 1 << dim
    rate = (N // 2) * dim / res["dt"]
    return {
        "metric": f"additive_ntt_butterflies_per_s_gf192_2e{dim}",
        "value": round(rate),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / 1e7, 2),
    }, res


def bench_ligero(log_n=16, budget_s=600, make_zk=False) -> tuple:
    res = _run_child(
        _LIGERO_CHILD.format(repo=REPO, log_n=log_n, make_zk=make_zk),
        budget_s)
    if "prover_s" not in res:
        return None, res
    # anchor: reference Ligero prover ~15 s at 2^16 single core (paper plots)
    ref = 15.0 * ((1 << log_n) * log_n) / ((1 << 16) * 16)
    return {
        "metric": f"ligero_prover_s_edwards181_2e{log_n}",
        "value": round(res["prover_s"], 3),
        "unit": "seconds",
        "vs_baseline": round(ref / max(res["prover_s"], 1e-9), 2),
    }, res


def bench_fractal(log_n=18, budget_s=900, make_zk=False) -> tuple:
    res = _run_child(
        _FRACTAL_CHILD.format(repo=REPO, log_n=log_n, make_zk=make_zk),
        budget_s)
    if "prover_s" not in res:
        return None, res
    # anchor: reference Fractal prover ~200 s at 2^20 single core, N log N
    ref = 200.0 * ((1 << log_n) * log_n) / ((1 << 20) * 20)
    return {
        "metric": f"fractal_prover_s_edwards181_2e{log_n}",
        "value": round(res["prover_s"], 3),
        "unit": "seconds",
        "vs_baseline": round(ref / max(res["prover_s"], 1e-9), 2),
    }, res


def bench_hashes(budget_s=200) -> dict:
    res = _run_child(_HASH_CHILD.format(repo=REPO), budget_s)
    rate = res["n"] / res["dt"]
    return {"metric": "blake2b_leaf_hashes_per_s", "value": round(rate),
            "unit": "hashes/s", "vs_baseline": round(rate / 2.0e6, 2)}


def bench_mul(dim=20, budget_s=300) -> dict:
    res = _run_child(_MUL_CHILD.format(repo=REPO, dim=dim), budget_s)
    rate = res["n"] / res["dt"]
    return {"metric": f"field_mul_per_s_edwards181_2e{dim}",
            "value": round(rate), "unit": "muls/s",
            "vs_baseline": round(rate / 2.5e7, 2)}


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def _merge_sweep_row(rows: dict, log_n: int, primary, res) -> dict:
    """MERGE a new measurement into the persistent per-size row instead of
    clobbering (round-4 postmortem: `_save` rewrote BENCH_SWEEP.json
    wholesale and destroyed the only >=2^16 measurement ever taken).
    Each row accumulates every prover_s ever measured; `value` is the
    MEDIAN across runs (tunnel variance is ~2.5x run-to-run, so a single
    draw — best or worst — misrepresents the machine) and `best_prover_s`
    the minimum.  The latest full profile is kept; verifier fields keep
    the latest non-null observation."""
    row = rows.get(log_n) or {"log_n": log_n}
    if primary is not None:
        runs = list(row.get("runs_prover_s") or [])
        runs.append(res["prover_s"])
        ref = 120.0 * ((1 << log_n) * log_n) / ((1 << 20) * 20)
        med = _median(runs)
        row.update({
            "metric": primary["metric"], "unit": "seconds",
            "runs_prover_s": [round(r, 3) for r in runs],
            "value": round(med, 3),
            "vs_baseline": round(ref / max(med, 1e-9), 2),
            "best_prover_s": round(min(runs), 3),
        })
        for k in ("warm_prover_s", "verifier_s", "warm_verifier_s",
                  "argument_bytes", "profile"):
            if res.get(k) is not None:
                row[k] = res[k]
        row.pop("error", None)
    rows[log_n] = row
    return row


def _sweep(log_ns):
    """Measurement mode for BASELINE.md: Aurora prover at each log_n,
    largest budget per size, incremental output, merged persistence."""
    data = _load("BENCH_SWEEP.json") or {}
    rows = {int(r["log_n"]): r for r in data.get("sweep", [])
            if isinstance(r, dict) and "log_n" in r}
    for log_n in log_ns:
        try:
            primary, res = bench_aurora(log_n=log_n,
                                        budget_s=_remaining() - 20)
            row = _merge_sweep_row(rows, log_n, primary, res)
        except Exception as e:  # noqa: BLE001
            row = rows.get(log_n) or {"log_n": log_n}
            if "runs_prover_s" not in row:  # never clobber a good row
                row["error"] = str(e)[-300:]
            rows[log_n] = row
        print(json.dumps({k: v for k, v in row.items() if k != "profile"}),
              flush=True)
        _save({"sweep": [rows[k] for k in sorted(rows)]},
              name="BENCH_SWEEP.json")
        if _remaining() < 60:
            break


def _load(name: str):
    try:
        with open(os.path.join(REPO, name)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _save(details: dict, name="BENCH_DETAILS.json"):
    try:
        with open(os.path.join(REPO, name), "w") as f:
            json.dump(details, f, indent=1)
    except OSError:
        pass


def _stage_cli(name: str, args: list) -> None:
    """Manual single-stage runs: `python bench.py --stage <name> [log_n]`.
    Results merge into BENCH_DETAILS.json under 'stage_<name>_<log_n>'."""
    log_n = int(args[0]) if args else None
    budget = _remaining() - 20
    if name == "aurora":
        line, res = bench_aurora(log_n=log_n or 14, budget_s=budget)
    elif name == "aurora_zk":
        line, res = bench_aurora(log_n=log_n or 14, budget_s=budget,
                                 make_zk=True)
    elif name == "aurora_gf192":
        line, res = bench_aurora(log_n=log_n or 12, budget_s=budget,
                                 field="gf192")
    elif name == "additive_ntt":
        line, res = bench_additive_ntt(dim=log_n or 16, budget_s=budget)
    elif name == "ligero":
        line, res = bench_ligero(log_n=log_n or 16, budget_s=budget)
    elif name == "fractal":
        line, res = bench_fractal(log_n=log_n or 18, budget_s=budget)
    else:
        raise SystemExit(f"unknown stage {name}")
    details = _load("BENCH_DETAILS.json") or {}
    details[f"stage_{name}_{log_n}"] = {"line": line, "res": res}
    _save(details)
    print(json.dumps(line if line is not None else
                     {"metric": f"{name}_failed", "value": 0,
                      "unit": "none", "vs_baseline": 0}))


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--sweep":
        _sweep([int(a) for a in sys.argv[2:]])
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--stage":
        _stage_cli(sys.argv[2], sys.argv[3:])
        return
    details = _load("BENCH_DETAILS.json") or {}
    primary = None

    # Stage 1 — NTT rate (cheap, known-good since round 1): the guaranteed
    # metric, printed immediately.
    try:
        line, res = bench_ntt(dim=16, budget_s=min(600.0, _remaining() - 420))
        details["ntt"] = res
        if line is not None:
            details["ntt_line"] = line
            primary = line
            print(json.dumps(line), flush=True)
    except Exception as e:  # noqa: BLE001
        details["ntt_error"] = str(e)[-300:]
    _save(details)

    # Stage 1b — fallback if NTT produced nothing: batched field multiply.
    if primary is None and _remaining() > 360:
        try:
            primary = bench_mul(budget_s=min(300.0, _remaining() - 330))
            details["mul_line"] = primary
            print(json.dumps(primary), flush=True)
        except Exception as e:  # noqa: BLE001
            details["mul_error"] = str(e)[-300:]
        _save(details)

    # Stage 2 — blake2b leaf hashing (host-native, no JAX): detail only.
    if _remaining() > 320:
        try:
            details["hashes_line"] = bench_hashes(
                budget_s=min(200.0, _remaining() - 310))
        except Exception as e:  # noqa: BLE001
            details["hashes_error"] = str(e)[-300:]
        _save(details)

    # Stage 3 — the primary metric: Aurora prover at 2^14 (median of 3).
    # A success upgrades the printed result (driver parses the tail line).
    if _remaining() > 90:
        try:
            line, res = bench_aurora(
                log_n=14, budget_s=max(120.0, _remaining() - 400))
            details["aurora_2e14"] = res
            if line is not None:
                details["aurora_line"] = line
                primary = line
                print(json.dumps(line), flush=True)
        except Exception as e:  # noqa: BLE001
            details["aurora_error"] = str(e)[-300:]
        _save(details)

    # Stage 4 — binary-field coverage (BASELINE config 3): gf192 additive
    # NTT rate + a gf192 Aurora prove.  Detail-only; never displaces the
    # primary line.
    if _remaining() > 240:
        try:
            line, res = bench_additive_ntt(
                dim=16, budget_s=min(300.0, _remaining() - 160))
            details["additive_ntt"] = res
            if line is not None:
                details["additive_ntt_line"] = line
        except Exception as e:  # noqa: BLE001
            details["additive_ntt_error"] = str(e)[-300:]
        _save(details)
    if _remaining() > 160:
        try:
            line, res = bench_aurora(log_n=12, field="gf192",
                                     budget_s=_remaining() - 30)
            details["aurora_gf192_2e12"] = res
            if line is not None:
                details["aurora_gf192_line"] = line
        except Exception as e:  # noqa: BLE001
            details["aurora_gf192_error"] = str(e)[-300:]
        _save(details)

    if primary is None:
        # nothing landed: emit an explicit failure record (still valid JSON)
        print(json.dumps({"metric": "bench_failed", "value": 0,
                          "unit": "none", "vs_baseline": 0}))


if __name__ == "__main__":
    main()
