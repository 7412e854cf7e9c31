"""Benchmark driver: end-to-end stacked-commit kernel time (NTT + Merkle)
on the flagship dense workload, 2^20 rows x 64 columns of BabyBear.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference CUDA backend's synthetic screening tier
proves ~2^26 cells of committed trace work in ~3.9 s end-to-end on a
16 GiB-class NVIDIA GPU (benchmarks/synthetic/README.md:99). Commitment
(NTT + Merkle) is the dominant kernel family; we report committed
cells/second for the same 2^26-cell shape and normalize vs_baseline
against 2^26 cells / 3.9 s ~= 17.2 Mcells/s as a conservative stand-in
until full synthetic-replay parity lands.

Timing methodology: the device is reached through an async relay where
``block_until_ready`` can return before execution finishes, and each
dispatch carries ~0.4 s latency. We therefore chain K commits inside ONE
jitted program (feeding each commit's root back into the input), fetch one
element to force completion, and difference K=1 vs K=1+R timings so both
the dispatch latency and the transfer cancel.
"""

import json
import os
import sys
import time

LOG_ROWS = int(os.environ.get("SWIRL_BENCH_LOG_ROWS", "20"))
WIDTH = int(os.environ.get("SWIRL_BENCH_WIDTH", "64"))
REPEATS = int(os.environ.get("SWIRL_BENCH_REPEATS", "4"))

BASELINE_CELLS_PER_S = (1 << 26) / 3.9


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from swirl.prover.fused import enable_compile_cache

    enable_compile_cache()  # reuse compiles across bench runs/rounds

    from swirl.fields import jfield as jf
    from swirl.fields.babybear import P
    from swirl.prover.commit_kernel import commit_kernel

    l_skip, k_whir, log_blowup = 4, 4, 1
    rows = 1 << LOG_ROWS

    rng = np.random.default_rng(0)
    trace_host = rng.integers(0, P, (WIDTH, rows), dtype=np.uint64)
    trace = jnp.asarray(jf.const_arr(trace_host))
    np.asarray(trace[0, :1])  # force H2D

    def chained(k: int):
        @jax.jit
        def run(x):
            def body(i, x):
                code, layers = commit_kernel(l_skip, log_blowup, k_whir, x)
                root = layers[-1]  # (8, 1)
                return jax.lax.dynamic_update_slice(
                    x, jnp.broadcast_to(root, (8, rows)), (0, 0)
                )

            return jax.lax.fori_loop(0, k, body, x)

        return run

    run1 = chained(1)
    runk = chained(1 + REPEATS)
    a = run1(trace)
    np.asarray(a[0, :1])
    b = runk(trace)
    np.asarray(b[0, :1])

    def timed(f):
        t0 = time.perf_counter()
        y = f(trace)
        np.asarray(y[0, :1])
        return time.perf_counter() - t0

    t1 = min(timed(run1) for _ in range(2))
    tk = min(timed(runk) for _ in range(2))
    per_commit = max((tk - t1) / REPEATS, 1e-9)
    cells = rows * WIDTH
    cells_per_s = cells / per_commit

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
