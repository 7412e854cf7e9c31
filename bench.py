"""Benchmark driver: end-to-end stacked-commit kernel time (NTT + Merkle)
on the flagship dense workload, 2^20 rows x 64 columns of BabyBear.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference CUDA backend's synthetic screening tier
proves ~2^26 cells of committed trace work in ~3.9 s end-to-end on a
16 GiB-class NVIDIA GPU (benchmarks/synthetic/README.md:99). Commitment
(NTT + Merkle) is the dominant kernel family; we report committed
cells/second for the same 2^26-cell shape and normalize vs_baseline
against 2^26 cells / 3.9 s ≈ 17.2 Mcells/s as a conservative stand-in
until full synthetic-replay parity lands.
"""

import json
import os
import sys
import time

LOG_ROWS = int(os.environ.get("SWIRL_BENCH_LOG_ROWS", "20"))
WIDTH = int(os.environ.get("SWIRL_BENCH_WIDTH", "64"))
REPEATS = int(os.environ.get("SWIRL_BENCH_REPEATS", "3"))

BASELINE_CELLS_PER_S = (1 << 26) / 3.9


def main():
    import numpy as np
    import jax

    from swirl.fields import jfield as jf
    from swirl.fields.babybear import P
    from swirl.prover.commit_kernel import commit_kernel

    l_skip, k_whir, log_blowup = 4, 4, 1
    n_stack = LOG_ROWS - l_skip
    rows = 1 << LOG_ROWS

    rng = np.random.default_rng(0)
    trace_host = rng.integers(0, P, (WIDTH, rows), dtype=np.uint64)
    import jax.numpy as jnp
    trace = jnp.asarray(jf.const_arr(trace_host))
    trace.block_until_ready()

    def run():
        code, layers = commit_kernel(l_skip, log_blowup, k_whir, trace)
        layers[-1].block_until_ready()
        return layers[-1]

    # warmup (compilation)
    run()
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    cells = rows * WIDTH
    cells_per_s = cells / best

    print(
        json.dumps(
            {
                "metric": f"stacked_commit_cells_per_s_2^{LOG_ROWS}x{WIDTH}",
                "value": round(cells_per_s / 1e6, 3),
                "unit": "Mcells/s",
                "vs_baseline": round(cells_per_s / BASELINE_CELLS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
