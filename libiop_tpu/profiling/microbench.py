"""Micro-benchmark suite — TPU-native counterpart of the reference's 12
google-benchmark binaries (libiop/benchmarks/benchmark_{fft,hashes,lagrange,
sumcheck,vector_op,polynomials,gf64,gf128,gf192,gf256,edwards,alt_bn128}.cpp,
CMakeLists.txt:38-76).

Where the reference times a scalar loop, the unit here is the device-batched
op (the TPU-native formulation of the same computation); rates are reported
per element so the numbers remain comparable.

Usage:
  python -m libiop_tpu.profiling.microbench --suite fft --log_min 4 --log_max 16
  python -m libiop_tpu.profiling.microbench --suite all --cpu

Each case prints one JSON line:
  {"bench": "...", "n": N, "seconds": t, "per_s": rate}
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timeit(fn, *args, runs: int = 5):
    """Median wall time of a (jitted, warm) callable."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def _emit(bench: str, n: int, seconds: float, items: int | None = None):
    items = n if items is None else items
    print(json.dumps({"bench": bench, "n": n,
                      "seconds": round(seconds, 6),
                      "per_s": round(items / max(seconds, 1e-12))}),
          flush=True)


def _fields(names):
    from ..fields.prime import edwards_fr, alt_bn128_fr
    from ..fields import binary
    all_fields = {"edwards": edwards_fr, "alt_bn128": alt_bn128_fr,
                  "gf64": binary.gf64, "gf128": binary.gf128,
                  "gf192": binary.gf192, "gf256": binary.gf256}
    return {k: v() for k, v in all_fields.items() if k in names}


# -- field ops (benchmark_{edwards,alt_bn128,gf64,gf128,gf192,gf256}.cpp) ----

def suite_field(args):
    import jax
    rng = np.random.default_rng(7)
    for name, F in _fields(args.fields).items():
        for log_n in range(args.log_min, args.log_max + 1):
            n = 1 << log_n
            a = F.random((n,), rng)
            b = F.random((n,), rng)
            mul = jax.jit(F.mul)
            _emit(f"{name}_mul_vec", n, _timeit(mul, a, b))
            # data-dependency variant (BM_*_mul_vec_data_dependency): a
            # serial chain of k dependent muls, timed per element
            k = 8
            chain = jax.jit(lambda x, y: _mul_chain(F, x, y, k))
            _emit(f"{name}_mul_chain{k}", n, _timeit(chain, a, b) / k)
            if log_n <= min(args.log_max, 16):
                invf = jax.jit(F.inv)
                _emit(f"{name}_inverse_vec", n, _timeit(invf, a))


def _mul_chain(F, x, y, k):
    for _ in range(k):
        x = F.mul(x, y)
    return x


# -- FFT (benchmark_fft.cpp:18-175) ------------------------------------------

def suite_fft(args):
    import jax
    from ..algebra.domains import MultiplicativeCoset
    from ..algebra.subspace import AffineSubspace
    from ..algebra.generic import fft_any, ifft_any
    rng = np.random.default_rng(7)
    cases = []
    if "edwards" in args.fields:
        F = _fields(["edwards"])["edwards"]
        cases += [("multiplicative_subgroup", F,
                   lambda d: MultiplicativeCoset(F, d)),
                  ("multiplicative_coset", F,
                   lambda d: MultiplicativeCoset(
                       F, d, shift=F.multiplicative_generator))]
    if "gf64" in args.fields:
        G = _fields(["gf64"])["gf64"]
        cases += [("additive", G, lambda d: AffineSubspace(G, d))]
    for tag, F, mk in cases:
        for log_n in range(args.log_min, args.log_max + 1):
            dom = mk(log_n)
            coeffs = F.random((dom.order,), rng)
            f = jax.jit(lambda c, dom=dom: fft_any(c, dom))
            fi = jax.jit(lambda c, dom=dom: ifft_any(c, dom))
            _emit(f"{tag}_FFT", dom.order, _timeit(f, coeffs))
            _emit(f"{tag}_IFFT", dom.order, _timeit(fi, coeffs))


# -- Lagrange (benchmark_lagrange.cpp:12-100) --------------------------------

def suite_lagrange(args):
    from ..algebra.generic import make_domain, lagrange_coefficients_any
    rngs = np.random.default_rng(7)
    log_max = min(args.log_max, 18)  # host-assembled; keep bounded
    for name in ("edwards", "gf64"):
        if name not in args.fields:
            continue
        F = _fields([name])[name]
        kind = "multiplicative" if F.kind == "multiplicative" else "additive"
        for log_n in range(args.log_min, log_max + 1):
            dom = make_domain(F, log_n)
            alpha = F.random_ints(1, rngs)[0]
            t0 = time.perf_counter()
            out = lagrange_coefficients_any(dom, alpha)
            import jax
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            _emit(f"lagrange_{kind}", dom.order, dt)
            # cached variant (lagrange.hpp:21-55): repeat at the same alpha
            t0 = time.perf_counter()
            out = lagrange_coefficients_any(dom, alpha)
            jax.block_until_ready(out)
            _emit(f"lagrange_{kind}_cached", dom.order,
                  time.perf_counter() - t0)


# -- hashes (benchmark_hashes.cpp:13-105) ------------------------------------

def suite_hashes(args):
    from ..bcs import native_blake2b
    from ..bcs.poseidon import PoseidonHashing
    from ..fields.prime import alt_bn128_fr
    # blake2b: batched leaf hashing over 2-to-16-element leaf blocks
    n = 1 << 16
    for k in (1, 2, 4, 8, 16):
        blocks = [bytes(32 * k) for _ in range(n)]
        native_blake2b.hash_batch(blocks[:64], 32, tag=b"\x00")
        t0 = time.perf_counter()
        native_blake2b.hash_batch(blocks, 32, tag=b"\x00")
        _emit(f"blake2b_leaf_{k}elem", n, time.perf_counter() - t0)
    # Poseidon: device-batched leaf hashes, both enum variants
    F = alt_bn128_fr()
    nb = 1 << 12
    for variant in ("poseidon", "poseidon_high_alpha"):
        h = PoseidonHashing(F, 128, variant)
        for k in (1, 2, 4):
            blocks = [bytes(F.elem_bytes * k) for _ in range(nb)]
            h.leaf_hash_batch(blocks[:64])
            t0 = time.perf_counter()
            h.leaf_hash_batch(blocks)
            _emit(f"{variant}_leaf_{k}elem", nb, time.perf_counter() - t0)


# -- sumcheck (benchmark_sumcheck.cpp:51-125) --------------------------------

def suite_sumcheck(args):
    """Additive sumcheck prover over GF(2^64): time the oracle-evaluation
    step (mask + g/h decomposition over the codeword domain)."""
    from ..fields.binary import gf64
    from ..algebra.subspace import AffineSubspace
    from ..algebra.generic import fft_any, ifft_any
    import jax
    F = gf64()
    rng = np.random.default_rng(7)
    for log_n in range(max(args.log_min, 8), min(args.log_max, 18) + 1):
        H = AffineSubspace(F, log_n - 2)
        L = AffineSubspace(F, log_n, shift=1 << 62)
        poly = F.random((H.order,), rng)

        def step(v, H=H, L=L):
            coeffs = ifft_any(v, H)
            import jax.numpy as jnp
            pad = jnp.zeros((F.L, L.order - H.order), dtype=jnp.uint32)
            return fft_any(jnp.concatenate([coeffs, pad], axis=-1), L)

        f = jax.jit(step)
        _emit("sumcheck_additive_encode", L.order, _timeit(f, poly))


# -- vector ops (benchmark_vector_op.cpp:12-42) ------------------------------

def suite_vector(args):
    from ..fields.binary import gf64
    from ..algebra.subspace import subset_sums_ints
    F = gf64()
    rng = np.random.default_rng(7)
    for log_n in range(args.log_min, min(args.log_max, 20) + 1):
        basis = F.random_ints(log_n, rng)
        t0 = time.perf_counter()
        out = subset_sums_ints(F, basis, 0)
        assert len(out) == 1 << log_n
        _emit("all_gf64_subset_sums", 1 << log_n, time.perf_counter() - t0)
        t0 = time.perf_counter()
        F.random(((1 << log_n),), rng)
        _emit("random_gf64_vector", 1 << log_n, time.perf_counter() - t0)


# -- polynomials (benchmark_polynomials.cpp:14-104) --------------------------

def suite_poly(args):
    import jax
    from ..fields.binary import gf64
    from ..fields.prime import edwards_fr
    from ..algebra.subspace import AffineSubspace
    from ..algebra.linearized import LinearizedVanishing, divide_by_linearized
    from ..algebra.domains import MultiplicativeCoset
    from ..algebra.poly import mul_by_vanishing, divide_by_vanishing
    rng = np.random.default_rng(7)
    G = gf64()
    for log_n in range(args.log_min, min(args.log_max, 20) + 1):
        # vanishing polynomial from subspace
        t0 = time.perf_counter()
        Z = LinearizedVanishing(AffineSubspace(G, log_n))
        _emit("vanishing_polynomial_from_subspace", 1 << log_n,
              time.perf_counter() - t0)
        # linearized polynomial x small polynomial: gf64 (sparse half-fold)
        small = G.random((1 << log_n,), rng)
        t0 = time.perf_counter()
        out = divide_by_linearized(G, small, Z)
        jax.block_until_ready(out[0])
        _emit("gf64_polynomial_over_vanishing_polynomial", 1 << log_n,
              time.perf_counter() - t0)
    F = edwards_fr()
    for log_n in range(args.log_min, min(args.log_max, 20) + 1):
        H = MultiplicativeCoset(F, max(log_n - 2, 1))
        coeffs = F.random((1 << log_n,), rng)
        f = jax.jit(lambda c, H=H: mul_by_vanishing(c, H))
        _emit("edwards_linearized_polynomial_times_small_polynomial",
              1 << log_n, _timeit(f, coeffs))
        g = jax.jit(lambda c, H=H: divide_by_vanishing(c, H))
        _emit("edwards_polynomial_over_vanishing_polynomial",
              1 << log_n, _timeit(g, coeffs))


SUITES = {"field": suite_field, "fft": suite_fft, "lagrange": suite_lagrange,
          "hashes": suite_hashes, "sumcheck": suite_sumcheck,
          "vector": suite_vector, "poly": suite_poly}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--suite", default="all",
                    choices=["all"] + sorted(SUITES))
    ap.add_argument("--fields", nargs="+",
                    default=["edwards", "gf64"],
                    choices=["edwards", "alt_bn128", "gf64", "gf128",
                             "gf192", "gf256"])
    ap.add_argument("--log_min", type=int, default=10)
    ap.add_argument("--log_max", type=int, default=16)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from ..utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    for name in (sorted(SUITES) if args.suite == "all" else [args.suite]):
        SUITES[name](args)


if __name__ == "__main__":
    main()
