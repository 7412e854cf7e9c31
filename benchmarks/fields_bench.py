"""Field-arithmetic microbenchmarks: BabyBear base and EF4 throughput on
the current device (TPU or CPU XLA).

Peer of the reference's ``benchmarks/fields`` CUDA crate: measures
mul/add/inv throughput for the base field and the degree-4 extension,
plus the Poseidon2 permutation rate. Prints one JSON line per op.

Methodology matches ``bench.py``: K-vs-1 chained iterations inside one jit
so dispatch latency and transfers cancel.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import os

LOG_N = int(os.environ.get("SWIRL_FIELDS_LOG_N", "20"))
REPEATS = int(os.environ.get("SWIRL_FIELDS_REPEATS", "8"))


def _timed_chain(op, x, reps):
    import jax
    import numpy as np

    def chained(k):
        @jax.jit
        def run(v):
            def body(i, v):
                return op(v)

            return jax.lax.fori_loop(0, k, body, v)

        return run

    r1, rk = chained(1), chained(1 + reps)
    a = r1(x)
    np.asarray(a.ravel()[:1])
    b = rk(x)
    np.asarray(b.ravel()[:1])

    def t(f):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            y = f(x)
            np.asarray(y.ravel()[:1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    return max((t(rk) - t(r1)) / reps, 1e-9)


def main() -> int:
    import numpy as np
    import jax

    # sitecustomize (axon) can silently override JAX_PLATFORMS=cpu from the
    # command environment; in-script config is the only reliable force-CPU
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from swirl.fields import jfield as jf
    from swirl.fields.babybear import P
    from swirl.hash import jposeidon2 as jp2

    rng = np.random.default_rng(0)
    n = 1 << LOG_N
    base = jnp.asarray(jf.const_arr(rng.integers(1, P, n, dtype=np.uint64)))
    ext = jnp.asarray(
        jf.const_arr(rng.integers(1, P, (n // 4, 4), dtype=np.uint64))
    )
    state = jnp.asarray(
        jf.const_arr(rng.integers(0, P, (n // 16, 16), dtype=np.uint64))
    )

    from swirl.fields.generic import (
        Goldilocks,
        Goldilocks3,
        bb5,
        bb6,
        kb5,
        kb6,
        koalabear,
        GL_P,
    )

    kb_base = koalabear.to_monty(rng.integers(1, koalabear.p, n, dtype=np.uint64))
    kb5_v = kb5.to_monty(rng.integers(1, koalabear.p, (5, n // 8), dtype=np.uint64))
    kb6_v = kb6.to_monty(rng.integers(1, koalabear.p, (6, n // 8), dtype=np.uint64))
    bb5_v = bb5.to_monty(rng.integers(1, P, (5, n // 8), dtype=np.uint64))
    bb6_v = bb6.to_monty(rng.integers(1, P, (6, n // 8), dtype=np.uint64))
    gl = Goldilocks.to_dev(rng.integers(1, GL_P, n // 2, dtype=np.uint64))
    gl3 = Goldilocks3.to_dev(rng.integers(1, GL_P, (3, n // 8), dtype=np.uint64))

    cases = [
        ("babybear_mul", lambda v: jf.mul(v, v), base, n),
        ("babybear_add", lambda v: jf.add(v, v), base, n),
        ("babybear_inv", lambda v: jf.inv(v), base, n),
        ("ef4_mul", lambda v: jf.ext_mul(v, v), ext, n // 4),
        ("ef4_add", lambda v: jf.ext_add(v, v), ext, n // 4),
        (
            "poseidon2_permute",
            lambda v: jp2.permute(v),
            state,
            n // 16,
        ),
        # field zoo (reference benchmarks/fields parity): KoalaBear,
        # BabyBear fp5/fp6, Goldilocks base + cubic
        ("koalabear_mul", lambda v: koalabear.mul(v, v), kb_base, n),
        ("koalabear_add", lambda v: koalabear.add(v, v), kb_base, n),
        ("koalabear_inv", lambda v: koalabear.inv(v), kb_base, n),
        ("bb5_mul", lambda v: bb5.mul(v, v), bb5_v, n // 8),
        ("bb6_mul", lambda v: bb6.mul(v, v), bb6_v, n // 8),
        ("kb5_mul", lambda v: kb5.mul(v, v), kb5_v, n // 8),
        ("kb6_mul", lambda v: kb6.mul(v, v), kb6_v, n // 8),
        ("goldilocks_mul", lambda v: Goldilocks.mul(v, v), gl, n // 2),
        ("goldilocks_add", lambda v: Goldilocks.add(v, v), gl, n // 2),
        ("gl3_mul", lambda v: Goldilocks3.mul(v, v), gl3, n // 8),
    ]
    for name, op, x, count in cases:
        dt = _timed_chain(op, x, REPEATS)
        print(
            json.dumps(
                {
                    "metric": name,
                    "value": round(count / dt / 1e9, 3),
                    "unit": "Gop/s",
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
