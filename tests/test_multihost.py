"""Multi-host scaffolding: mesh construction + idempotent init (fast tier;
no compiles). The sharded full-proof path over these meshes is covered by
tests/test_spmd.py (slow)."""

import pytest

import tests.conftest  # noqa: F401

import jax

from swirl.parallel import multihost


def test_initialize_single_process_noop():
    multihost.initialize()
    multihost.initialize()  # idempotent


def test_proof_mesh_covers_all_devices():
    mesh = multihost.proof_mesh()
    assert mesh.axis_names == ("rows",)
    assert mesh.devices.size == len(jax.devices())


def test_host_local_mesh_prefix():
    mesh = multihost.host_local_mesh(4)
    assert mesh.devices.size == 4


def test_hierarchical_mesh_single_host():
    mesh = multihost.hierarchical_mesh()
    assert mesh.axis_names == ("host", "chip")
    assert mesh.devices.shape == (1, len(jax.devices()))


def test_proof_mesh_accepted_by_fused_signature():
    """The mesh built here is the exact object prove_fused consumes."""
    from swirl.prover.fused import _mesh_key

    mesh = multihost.proof_mesh()
    key = _mesh_key(mesh)
    assert key[0] == ("rows",)


@pytest.mark.slow
def test_two_process_full_proof_byte_identical():
    """REAL jax.distributed runtime: two subprocesses (4 virtual CPU devices
    each) form one 8-device mesh and each runs the FULL mesh-SEGMENTED
    Fibonacci proof (height axis spanning both processes). Both must report
    the same proof-bytes hash, equal to this process's single-host
    host-path proof (round-4 verdict item 6)."""
    import hashlib
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "proof"],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode(errors="replace")[-2000:]
        line = [
            l for l in out.decode().splitlines() if l.startswith("PROOFHASH ")
        ]
        assert line, out.decode()[-2000:]
        outs.append(line[0].split()[1])
    assert outs[0] == outs[1], (outs[0], outs[1])

    # single-process host-path expectation
    from swirl.codec import encode_proof
    from swirl.engine import StarkEngine
    from swirl.params import test_system_params_small as small_params
    from swirl.prover.backend import ProvingContext
    from swirl.testing.fixtures import FibonacciAir

    eng = StarkEngine(small_params(2, 5, 3))
    fib = FibonacciAir()
    pk, vk = eng.keygen([fib])
    dpk = eng.transport_pk(pk)
    h = 1 << 7
    ctx = ProvingContext(
        [eng.context_for(0, fib.generate_trace(0, 1, h), fib.pvs(0, 1, h))]
    )
    expect = hashlib.sha256(encode_proof(eng.prove(dpk, ctx))).hexdigest()
    assert outs[0] == expect


@pytest.mark.slow
def test_two_process_distributed_commit_step():
    """REAL jax.distributed runtime: two subprocesses (4 virtual CPU devices
    each) form one 8-device mesh through a local coordinator and run a
    sharded commit step; both processes must report the same Merkle root,
    equal to the single-process 8-device run (round-2 verdict item 7)."""
    import os
    import socket
    import subprocess
    import sys

    import numpy as np

    # pick a free port for the coordinator
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode(errors="replace")[-2000:]
        line = [
            l for l in out.decode().splitlines() if l.startswith("ROOT ")
        ]
        assert line, out.decode()[-2000:]
        outs.append(line[0])
    assert outs[0] == outs[1], (outs[0], outs[1])

    # single-process expectation over this process's own 8-device mesh
    from swirl.fields import jfield as jf
    from swirl.fields.babybear import P
    from swirl.parallel.sharded import make_mesh, sharded_commit_step

    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(7)
    host = jf.const_arr(rng.integers(0, P, (4, 1 << 10), dtype=np.uint64))
    root, revals = sharded_commit_step(mesh, 2, 1, 2)(host)
    expect = (
        "ROOT "
        + ",".join(str(int(x)) for x in np.asarray(root).reshape(-1))
        + " EVALS "
        + ",".join(str(int(x)) for x in np.asarray(revals).reshape(-1))
    )
    assert outs[0] == expect
