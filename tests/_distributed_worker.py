"""Worker process for the two-process jax.distributed tests.

Usage: python tests/_distributed_worker.py <coordinator_port> <process_id> [mode]

Each worker owns 4 virtual CPU devices (XLA_FLAGS set by the parent); the
two workers form one 8-device global mesh via jax.distributed.

mode="commit" (default): ONE sharded commit step (distributed all_to_all
NTT + sharded Merkle + psum'd sumcheck round); the replicated Merkle root
is printed for the parent to compare across processes and against the
single-process pipeline.

mode="proof": a FULL Fibonacci proof through the mesh-SEGMENTED prover
(multi-host GSPMD: the trace's height axis spans both processes'
devices); each worker prints the sha256 of the encoded proof bytes, which
must match across processes and equal the single-process host-path proof
(round-4 verdict item 6 — SURVEY §5 distributed-backend row).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def _full_proof(mesh) -> str:
    import hashlib

    from swirl.codec import encode_proof
    from swirl.engine import StarkEngine
    from swirl.params import test_system_params_small
    from swirl.prover.backend import ProvingContext
    from swirl.prover.fused import prove_fused
    from swirl.testing.fixtures import FibonacciAir

    eng = StarkEngine(test_system_params_small(2, 5, 3))
    fib = FibonacciAir()
    pk, vk = eng.keygen([fib])
    dpk = eng.transport_pk(pk)
    h = 1 << 7
    ctx = ProvingContext(
        [eng.context_for(0, fib.generate_trace(0, 1, h), fib.pvs(0, 1, h))]
    )
    proof = prove_fused(eng.backend, dpk, ctx, mode="segmented", mesh=mesh)
    eng.verify(vk, proof)
    return hashlib.sha256(encode_proof(proof)).hexdigest()


def main() -> int:
    port, pid = sys.argv[1], int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "commit"

    from swirl.parallel import multihost

    multihost.initialize(f"127.0.0.1:{port}", 2, pid)

    if mode == "proof":
        mesh = multihost.proof_mesh()
        assert mesh.devices.size == 8, mesh.devices.size
        assert jax.process_count() == 2
        print("PROOFHASH " + _full_proof(mesh), flush=True)
        return 0

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as PSpec

    from swirl.fields import jfield as jf
    from swirl.fields.babybear import P
    from swirl.parallel.sharded import sharded_commit_step

    mesh = multihost.proof_mesh()
    assert mesh.devices.size == 8, mesh.devices.size
    assert jax.process_count() == 2

    l_skip, log_blowup, k_whir = 2, 1, 2
    width, log_rows = 4, 10
    rng = np.random.default_rng(7)
    host = jf.const_arr(
        rng.integers(0, P, (width, 1 << log_rows), dtype=np.uint64)
    )
    sharding = NamedSharding(mesh, PSpec(None, multihost.AXIS))
    stacked = jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )

    step = sharded_commit_step(mesh, l_skip, log_blowup, k_whir)
    root, round_evals = step(stacked)
    root_local = np.asarray(root.addressable_data(0))  # replicated output
    evals_local = np.asarray(round_evals.addressable_data(0))
    print(
        "ROOT "
        + ",".join(str(int(x)) for x in root_local.reshape(-1))
        + " EVALS "
        + ",".join(str(int(x)) for x in evals_local.reshape(-1)),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
