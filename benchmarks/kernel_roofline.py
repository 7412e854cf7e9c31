"""Per-kernel roofline measurements for the RAP-stage hot kernels.

BASELINE.md demands >= 80%-of-roofline evidence for the hot kernels;
round-4 only demonstrated the commit kernel. This bench measures DEVICE
compute time (not dispatch wall time) for the three RAP-stage kernels the
verdict named — GKR layer eval+fold, round-0 constraint-DAG grid
evaluation, WHIR fold — with the same k-loop technique as the commit
micro-bench (``bench.py:commit_bench``): one jitted program runs the
kernel body k times with a runtime trip count, so
``(t(1+N) - t(1)) / N`` cancels the tunnel dispatch latency and any
fixed per-program overhead.

Usage:  python benchmarks/kernel_roofline.py [--log-rows 20] [--repeats 8]
Prints one JSON line per kernel: measured per-iter ms, analytic HBM/VPU
lower bound from :mod:`swirl.roofline`'s chip model, and the fraction.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp


def _rand(shape, seed=0):
    """Pseudo-random Monty-valid device array generated ON DEVICE — the
    tunneled dev chip's relay rejects requests carrying tens of MB of
    inline host-array operands (HTTP 413), and H2D over the tunnel is slow
    anyway. Multiplicative index hash reduced into [0, P)."""
    from functools import partial as _p

    from swirl.fields.babybear import P

    @_p(jax.jit, static_argnums=(0,))
    def gen(shp, seed_):
        n = int(np.prod(shp))
        i = jnp.arange(n, dtype=jnp.uint32)
        x = (i * jnp.uint32(2654435761)) ^ (seed_ * jnp.uint32(0x9E3779B9))
        x = x & jnp.uint32(0x7FFFFFFF)
        x = x - jnp.where(x >= jnp.uint32(P), jnp.uint32(P), jnp.uint32(0))
        return x.reshape(shp)

    return gen(tuple(shape) if isinstance(shape, (tuple, list)) else (shape,),
               jnp.uint32(seed))


def _measure(run, repeats: int):
    """run(k) -> array; returns per-iteration seconds."""
    np.asarray(run(1))  # compile + warm
    t1 = min(
        (lambda t0: (np.asarray(run(1)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    tk = min(
        (lambda t0: (np.asarray(run(1 + repeats)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    return max((tk - t1) / repeats, 1e-9)


def bench_gkr_layer(log_pairs: int, repeats: int):
    """One GKR sub-round on five (2^log_pairs, 4) MLE columns: the degree-3
    round evals at X in {1,2,3} plus the fold at r (prover/gkr.py)."""
    from swirl.prover.gkr import _gkr_fold, _gkr_round_evals
    from swirl.roofline import StageBound

    m = 1 << log_pairs
    cols0 = tuple(_rand((m, 4), seed=i + 1) for i in range(5))
    lam = _rand((4,), seed=9)

    @jax.jit
    def run_(k, cols0, lam):
        def body(i, cols):
            evals3 = _gkr_round_evals(cols, lam)
            folded = _gkr_fold(cols, evals3[0])
            return tuple(
                jax.lax.dynamic_update_slice(c, f, (0, 0))
                for c, f in zip(cols, folded)
            )

        out = jax.lax.fori_loop(0, k, body, cols0)
        return out[1][0]

    run = lambda k: run_(k, cols0, lam)
    per_s = _measure(run, repeats)
    # lower bound: read five (m,4) EF columns twice (evals pass + fold
    # pass; a perfectly fused kernel reads once — keep the conservative
    # single-read bound), write five (m/2,4) + the dynamic_update writes.
    hbm = 5 * m * 16 + 5 * (m // 2) * 16 * 2
    # evals: 3 X-points x (5 interps + ~17 EF ops) on m/2 pairs; fold: 5
    # EF interpolations. ~1 EF mul = 16 base muls ~ 160 VPU ops.
    ef_muls = (m // 2) * (3 * (5 + 8) + 5 * 1)
    bound = StageBound(hbm_bytes=float(hbm), vpu_ops=ef_muls * 160.0)
    return per_s, bound


def bench_round0_dag(log_rows: int, width: int, repeats: int):
    """Round-0 zerocheck grid evaluation: the constraint DAG over the coset
    grids plus the eq-weighted chunk reduction (prover/logup_zerocheck.py
    b0 region), at the bench AIR shape (16 deg-3 constraints)."""
    from swirl.engine import StarkEngine
    from swirl.params import app_params_with_100_bits_security
    from swirl.prover.dag_eval import DeviceEvaluator, acc_constraints_device
    from swirl.prover.sumcheck import (
        coset_eval_chunks,
        eq_hypercube_dev,
        selectors_matrix,
    )
    from swirl.fields import jfield as jf
    from swirl.roofline import StageBound
    from swirl.testing.synthetic import SyntheticAir, uniform_shape

    l_skip = 4
    shape = uniform_shape(
        log_rows, width, num_constraints=16, num_interactions=8, degree=3
    )
    air = SyntheticAir(shape)
    eng = StarkEngine(app_params_with_100_bits_security(log_rows + 4))
    pk, _vk = eng.keygen([air])
    dag = pk.per_air[0].vk.symbolic_constraints

    rows = 1 << log_rows
    trace = _rand((width, rows), seed=3)
    lam_pows = _rand((16, 4), seed=4)
    xi = _rand((log_rows - l_skip, 4), seed=5)
    from swirl.fields.babybear import GENERATOR, P as P_

    shifts = [pow(GENERATOR, c + 1, P_) for c in range(2)]

    @jax.jit
    def run_(k, trace, lam_pows, xi):
        sels_g = coset_eval_chunks(
            selectors_matrix(rows, l_skip), l_skip, shifts, False
        )
        eq_tab = eq_hypercube_dev(xi)

        def body(i, tr_):
            local = coset_eval_chunks(tr_, l_skip, shifts, False)
            nxt = coset_eval_chunks(tr_, l_skip, shifts, True)
            ev = DeviceEvaluator(sels_g, None, [(local, nxt)], [], False)
            acc = acc_constraints_device(dag, ev, lam_pows)
            sums = jf.ext_sum(jf.ext_mul(acc, eq_tab[:, None, :]), axis=0)
            return jax.lax.dynamic_update_slice(
                tr_, sums[:1, :1], (0, 0)
            )

        return jax.lax.fori_loop(0, k, body, trace)[0, :1]

    run = lambda k: run_(k, trace, lam_pows, xi)
    per_s = _measure(run, repeats)
    n_cosets = 2
    grid_cells = width * rows * n_cosets
    # bound: read the trace once per coset grid (local+rot), write/read the
    # grids once through the DAG, plus the (chunks, B_z, 4) accumulator.
    hbm = 2 * width * rows * 4 + 2 * grid_cells * 4 * 2
    # DAG: ~16 deg-3 constraints ~ 3 muls + lambda-mul each per grid cell
    vpu = grid_cells * (16 * 4) * 10.0
    bound = StageBound(hbm_bytes=float(hbm), vpu_ops=vpu)
    return per_s, bound


def bench_whir_fold(log_m: int, repeats: int):
    """One WHIR fold sub-round: two degree-2 evals of sum f*w plus both MLE
    folds (prover/whir.py w_rnd region)."""
    from swirl.prover.sumcheck import fold_mle_vec
    from swirl.prover.whir import _interp_vec
    from swirl.fields import jfield as jf
    from swirl.roofline import StageBound

    m = 1 << log_m
    f0 = _rand((m, 4), seed=11)
    w0 = _rand((m, 4), seed=12)

    @jax.jit
    def run_(k, f0, w0):
        def body(i, fw):
            f, w = fw
            evals = []
            for x in (1, 2):
                fx = _interp_vec(f, x)
                wx = _interp_vec(w, x)
                evals.append(jf.ext_sum(jf.ext_mul(fx, wx), axis=0))
            alpha = evals[0]
            f2 = fold_mle_vec(f, alpha)
            w2 = fold_mle_vec(w, alpha)
            return (
                jax.lax.dynamic_update_slice(f, f2, (0, 0)),
                jax.lax.dynamic_update_slice(w, w2, (0, 0)),
            )

        out = jax.lax.fori_loop(0, k, body, (f0, w0))
        return out[0][0]

    run = lambda k: run_(k, f0, w0)
    per_s = _measure(run, repeats)
    hbm = 2 * m * 16 + 2 * (m // 2) * 16 * 2
    ef_muls = (m // 2) * (2 * 3 + 2)
    bound = StageBound(hbm_bytes=float(hbm), vpu_ops=ef_muls * 160.0)
    return per_s, bound


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-rows", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=8)
    args = ap.parse_args()

    lr = args.log_rows
    results = {}
    for name, (per_s, bound) in (
        ("gkr_layer_eval_fold", bench_gkr_layer(lr + 2, args.repeats)),
        ("round0_dag_grid", bench_round0_dag(lr, 64, args.repeats)),
        ("whir_fold", bench_whir_fold(lr + 3, args.repeats)),
    ):
        results[name] = {
            "measured_ms": round(per_s * 1e3, 3),
            "min_ms": round(bound.min_ms, 3),
            "bound": bound.bound,
            "hbm_mb": round(bound.hbm_bytes / 1e6, 1),
            "roofline_frac": round(bound.min_ms / (per_s * 1e3), 3),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print("kernel_roofline " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
