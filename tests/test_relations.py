"""R1CS + sparse matvec tests (mirrors reference r1cs example sanity checks)."""
import numpy as np

from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.relations.sparse import SparseMatrix
from libiop_tpu.relations.examples import generate_r1cs_example


def test_sparse_matvec(rng):
    F = edwards_fr()
    nrows, ncols, nnz = 13, 9, 40
    entries = [(int(rng.integers(0, nrows)), int(rng.integers(0, ncols)),
                int(rng.integers(0, 1 << 60))) for _ in range(nnz)]
    M = SparseMatrix.from_entries(F, nrows, ncols, entries)
    zs = [int(rng.integers(0, 1 << 61)) for _ in range(ncols)]
    z = F.from_ints(zs)
    got = [int(v) for v in F.to_ints(M.matvec(z))]
    want = [0] * nrows
    for (r, c, v) in entries:
        want[r] = (want[r] + v * zs[c]) % F.p
    assert got == want
    ys = [int(rng.integers(0, 1 << 61)) for _ in range(nrows)]
    y = F.from_ints(ys)
    gotT = [int(v) for v in F.to_ints(M.matvec_transpose(y))]
    wantT = [0] * ncols
    for (r, c, v) in entries:
        wantT[c] = (wantT[c] + v * ys[r]) % F.p
    assert gotT == wantT


def test_r1cs_example_satisfied(rng):
    F = edwards_fr()
    cs, primary, aux = generate_r1cs_example(F, 32, 7, 31, rng)
    assert cs.num_constraints == 32
    assert cs.is_satisfied(primary, aux)
    # tampered assignment must fail
    aux_bad = list(aux)
    aux_bad[0] = (aux_bad[0] + 1) % F.p
    assert not cs.is_satisfied(primary, aux_bad)
