"""Worker process for the two-process jax.distributed smoke test.

Usage: python tests/_distributed_worker.py <coordinator_port> <process_id>

Each worker owns 4 virtual CPU devices (XLA_FLAGS set by the parent); the
two workers form one 8-device global mesh via jax.distributed and run ONE
sharded commit step (distributed all_to_all NTT + sharded Merkle + psum'd
sumcheck round). The replicated Merkle root is printed for the parent to
compare across processes and against the single-process pipeline.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    port, pid = sys.argv[1], int(sys.argv[2])

    from swirl.parallel import multihost

    multihost.initialize(f"127.0.0.1:{port}", 2, pid)

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
