"""Prove Keccak-f[1600] permutations under app-tier parameters.

Peer of the reference example (``crates/stark-sdk/examples/keccakf.rs``:
proves p3-keccak-air at 2^10 permutations under app params). The swirl
KeccakAir is a full 2633-column, degree-3 AIR with the round-constant
preprocessed column; trace generation runs through the native C++ host
kernels when available.

Usage:  python examples/keccakf.py [log_num_permutations] [--small]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    import numpy as np

    from swirl import metrics
    from swirl.engine import StarkEngine
    from swirl.models.keccak import KeccakAir
    from swirl.params import (
        app_params_with_100_bits_security,
        test_system_params_small,
    )
    from swirl.prover.backend import ProvingContext

    log_perms = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    small = "--small" in sys.argv

    air = KeccakAir()
    rng = np.random.default_rng(0)
    inputs = rng.integers(0, 1 << 63, (1 << log_perms, 5, 5), dtype=np.uint64)
    trace = air.generate_trace(inputs)
    log_height = trace.shape[0].bit_length() - 1

    if small:
        params = test_system_params_small(4, max(log_height - 4, 1), 4)
    else:
        params = app_params_with_100_bits_security(
            log_stacked_height=max(log_height + 2, 16)
        )
    eng = StarkEngine(params)

    t0 = time.time()
    pk, vk = eng.keygen([air])
    print(f"keygen: {time.time()-t0:.2f}s")
    ctx = ProvingContext([eng.context_for(0, trace, [], [])])
    dpk = eng.transport_pk(pk)
    with metrics.run_with_metric_collection() as snap:
        t0 = time.time()
        proof = eng.prove(dpk, ctx)
        prove_s = time.time() - t0
    print(f"prove {1 << log_perms} keccak-f permutations "
          f"(2^{log_height} x {trace.shape[1]} trace): {prove_s:.2f}s")
    for k, v in sorted(snap.snapshot().items()):
        if k.endswith("_time_ms"):
            print(f"  {k}: {v:.0f}")
    eng.verify(vk, proof)
    print("proof verifies")
    return 0


if __name__ == "__main__":
    sys.exit(main())
