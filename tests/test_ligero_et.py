"""Interleaved lincheck with explicit target (ET variant) — interactive
tests mirroring tests/protocols/test_interleaved_lincheck.cpp's role for
interleaved_lincheck_et.{hpp,tcc}: accepting run, wrong-target rejection,
wrong-witness rejection, zk blinding, both domain families."""
import numpy as np
import pytest

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.fields.binary import gf64
from libiop_tpu.algebra.domains import MultiplicativeCoset
from libiop_tpu.algebra.subspace import AffineSubspace
from libiop_tpu.algebra.generic import fft_any, ifft_any
from libiop_tpu.iop.runtime import IOPProtocol
from libiop_tpu.protocols.ligero import InterleavedLincheckET
from libiop_tpu.relations.sparse import SparseMatrix


def _domains(kind):
    if kind == "mult":
        F = edwards_fr()
        H = MultiplicativeCoset(F, dim=3, shift=1)
        ext = MultiplicativeCoset(F, dim=4, shift=1)
        L = MultiplicativeCoset(F, dim=5, shift=F.multiplicative_generator)
    else:
        F = gf64()
        H = AffineSubspace(F, dim=3)
        ext = AffineSubspace(F, dim=4)
        L = AffineSubspace(F, dim=5, shift=1 << 62)
    return F, H, ext, L


def _run(kind, make_zk, tamper_target, tamper_witness, rng):
    F, H, ext, L = _domains(kind)
    num_oracles = 2
    h = H.order
    width = num_oracles * h
    height = h  # one block of constraints

    x = [int(rng.integers(1, 1 << 48)) % F.field_size for _ in range(width)]
    entries = [(i, int(c), int(rng.integers(1, 1 << 30)) % F.field_size)
               for i in range(height)
               for c in rng.choice(width, size=3, replace=False)]
    M = SparseMatrix.from_entries(F, height, width, entries)
    # b = M x
    b = [0] * height
    for (i, j, v) in entries:
        b[i] = F.add_ints(b[i], F.mul_ints(v, x[j]))
    if tamper_target:
        b[0] = F.add_ints(b[0], 1)

    iop = IOPProtocol(F, seed=11)
    l_h = iop.register_domain(L)
    h_h = iop.register_domain(H)
    e_h = iop.register_domain(ext)
    et = InterleavedLincheckET(iop, l_h, h_h, e_h, num_oracles,
                               num_queries=4, num_interactions=2,
                               make_zk=make_zk, matrix=M, target_vector=b)
    row_handles = [iop.register_oracle(l_h, h) for _ in range(num_oracles)]
    et.attach_input_vector_row_oracles(row_handles)
    blind_handles = []
    if make_zk:
        blind_handles = [iop.register_oracle(l_h, 2 * h) for _ in range(2)]
        et.attach_blinding_vector_row_oracles(blind_handles)
    et.register_linear_combinations()
    et.register_responses()
    iop.seal_interaction_registrations()
    et.register_queries()
    iop.seal_query_registrations()

    # submit row codewords (systematic encode of x blocks)
    if tamper_witness:
        x = list(x)
        x[1] = F.add_ints(x[1], 1)
    for i, rh in enumerate(row_handles):
        block = x[i * h:(i + 1) * h]
        coeffs = ifft_any(F.from_ints(block), H)
        iop.submit_oracle(rh, fft_any(coeffs, L))
    for bh in blind_handles:
        # blinding row summing to zero over H (ligero.tcc:218-384 semantics)
        vals = [int(rng.integers(0, 1 << 48)) % F.field_size
                for _ in range(h - 1)]
        last = 0
        for v in vals:
            last = F.sub_ints(last, v)
        coeffs = ifft_any(F.from_ints(vals + [last]), H)
        iop.submit_oracle(bh, fft_any(coeffs, L))
    iop.signal_prover_round_done()
    et.calculate_and_submit_responses()
    iop.signal_prover_round_done()
    return et.verifier_predicate()


@pytest.mark.parametrize("kind", ["mult", "additive"])
def test_et_lincheck_accepts(kind, rng):
    assert _run(kind, False, False, False, rng)


@pytest.mark.parametrize("kind", ["mult", "additive"])
def test_et_lincheck_zk_accepts(kind, rng):
    assert _run(kind, True, False, False, rng)


def test_et_lincheck_wrong_target_rejects(rng):
    assert not _run("mult", False, True, False, rng)


def test_et_lincheck_wrong_witness_rejects(rng):
    assert not _run("additive", False, False, True, rng)
