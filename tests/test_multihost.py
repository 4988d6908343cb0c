"""Multi-host ("fake cluster") tests: two coordinated processes, each with a
slice of a virtual CPU mesh, forming one 8-device global mesh
(SURVEY.md §4's multi-host harness; the reference has no distributed tests).

Each worker: joins jax.distributed, builds the global codeword mesh,
assembles a globally-sharded codeword from its process-local shard, runs a
jitted field computation over the mesh, gathers host bytes, and asserts the
cross-process bit-identity gate.  The parent compares the workers' digests
against a single-process reference computation.
"""
import hashlib
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from libiop_tpu.parallel import multihost

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
multihost.initialize("localhost:" + port, nproc, pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc

from libiop_tpu.fields.prime import edwards_fr
F = edwards_fr()
mesh = multihost.make_global_codeword_mesh()
n_global = 64
per_proc = n_global // nproc

# process-local shard of a deterministic global vector
vals = [(i * 7 + 3) % F.p for i in range(n_global)]
local = F.from_ints_np(vals[pid * per_proc:(pid + 1) * per_proc])
garr = multihost.host_local_to_global(mesh, local)
assert garr.shape[-1] == n_global

sharding = multihost.codeword_sharding(mesh)
sq = jax.jit(F.mul, out_shardings=sharding)(garr, garr)
back = multihost.global_to_host_local(mesh, sq)
local_ints = F.to_ints(back)
expect = [pow(v, 2, F.p) for v in vals[pid * per_proc:(pid + 1) * per_proc]]
assert list(local_ints) == expect, "sharded square mismatch"

# host-bytes gather: every process ends with the identical full list
blocks = [bytes([pid]) + i.to_bytes(2, "little") for i in range(3 + pid)]
full = multihost.allgather_host_bytes(blocks)
assert len(full) == 3 + 4  # 3 from pid 0, 4 from pid 1
assert full[0][:1] == b"\x00" and full[3][:1] == b"\x01"

import hashlib
digest = hashlib.blake2b(b"".join(full), digest_size=16).digest()
multihost.assert_same_on_all_processes(digest)
print("WORKER_OK", pid, digest.hex())
"""


_AURORA_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["LIBIOP_TPU_COMPILE_LIGHT"] = "1"
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from libiop_tpu.parallel import multihost

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
if nproc > 1:
    multihost.initialize("localhost:" + port, nproc, pid)
    assert jax.process_count() == nproc

import libiop_tpu.algebra.fft as fftmod
import libiop_tpu.fields.binary as binmod
fftmod._SCAN_THRESHOLD = 1 << 6
binmod._MUL_MODE = "scan"
from libiop_tpu.fields.prime import edwards_fr
from libiop_tpu.relations.examples import generate_r1cs_example
from libiop_tpu.snark.aurora import (AuroraSnarkParams, aurora_snark_prover,
                                     aurora_snark_verifier)
from libiop_tpu.bcs.common import BCSTranscript

F = edwards_fr()
dim = 8
n = 1 << dim
cs, primary, aux = generate_r1cs_example(F, n, 3, n - 1,
                                         np.random.default_rng(99))
params = AuroraSnarkParams(
    security_parameter=32, RS_extra_dimensions=2,
    fri_localization_parameter=2, pow_bits=2,
    override_fri_queries=4, override_fri_interactive_repetitions=1,
    override_ldt_instances=1)
if nproc > 1:
    # the FULL prover with codewords sharded over the GLOBAL (cross-process)
    # mesh: GSPMD inserts the cross-host collectives; host-side protocol
    # code runs replicated and must stay deterministic
    from libiop_tpu.parallel.mesh import codeword_sharding_context
    mesh = multihost.make_global_codeword_mesh()
    assert mesh.devices.size == 4 * nproc
    with codeword_sharding_context(mesh):
        blob = aurora_snark_prover(cs, primary, aux, params).serialize()
    import hashlib
    digest = hashlib.sha256(blob).digest()
    # bit-identity gate across processes
    multihost.assert_same_on_all_processes(digest)
else:
    blob = aurora_snark_prover(cs, primary, aux, params).serialize()
    import hashlib
    digest = hashlib.sha256(blob).digest()
    assert aurora_snark_verifier(cs, primary,
                                 BCSTranscript.deserialize(blob), params)
print("WORKER_OK", pid, digest.hex())
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_fake_cluster(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(out.decode())
    digests = set()
    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith("WORKER_OK")][0]
        assert line.split()[1] == str(pid)
        digests.add(line.split()[2])
    # bit-identity across hosts
    assert len(digests) == 1


def test_two_process_aurora_prover(tmp_path):
    """The FULL Aurora prover on a 2-process fake cluster (codewords sharded
    over the global 8-device mesh) produces a transcript byte-identical to
    the single-process proof, and that proof verifies (SURVEY §5 distributed
    backend; the multi-host analogue of the dryrun_multichip gate)."""
    port = _free_port()
    script = tmp_path / "aurora_worker.py"
    script.write_text(_AURORA_WORKER.format(repo=REPO))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # 2-process sharded provers + the 1-process reference, all concurrent
    # (the run is XLA-compile-bound; the streams overlap)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in range(2)]
    ref = subprocess.Popen(
        [sys.executable, str(script), "0", "1", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    digests = set()
    for p in procs + [ref]:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs + [ref]:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-3000:]
        line = [ln for ln in out.decode().splitlines()
                if ln.startswith("WORKER_OK")][0]
        digests.add(line.split()[2])
    # sharded multi-process == single-process, byte for byte
    assert len(digests) == 1
