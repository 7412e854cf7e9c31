"""Synthetic replay runner: prove captured or uniform AIR shape workloads
end-to-end and report a timing scorecard.

Peer of the reference's ``benchmarks/synthetic/src/bin/synthetic_runner.rs``
(profile replay) and ``uniform_runner.rs`` (uniform sweeps): the workload is
a list of :class:`swirl.testing.synthetic.SyntheticShape` records, proved
segment by segment with per-stage span timings from ``swirl.metrics``.

Usage:
  python benchmarks/synthetic_runner.py                         # uniform sweep
  python benchmarks/synthetic_runner.py --atlas shapes.json     # replay atlas
  python benchmarks/synthetic_runner.py --log-heights 12,14,16 --width 32
  python benchmarks/synthetic_runner.py --fused                 # one-XLA-program prover
  python benchmarks/synthetic_runner.py \\
      --reth-atlas benchmarks/reth-block-23992138-atlas.json \\
      --sample-frac 0.1 --seed 42 --max-log-height 22           # reth replay

The reth replay proves each sampled segment as ONE multi-trace proof over
all its AIRs under the production app params (100-bit security), mirroring
the reference ``synthetic_runner`` tiers (screening 0.1 / fail-fast 0.5 /
full 1.0 — reference GPU prove totals 3.9 s / 21.6 s / 43.6 s,
``benchmarks/synthetic/README.md:99-101``). The full 1.0 sweep is exactly
the reference workload; sampled tiers use a documented Python sampler (the
reference's rand-0.9 StdRng subset is not bit-reproduced), so compare
sampled tiers only within swirl runs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def replay_reth(args) -> int:
    """Segment-replay of the captured reth workload: one multi-trace proof
    per sampled segment under the production app params."""
    import math
    import random

    from swirl.engine import StarkEngine
    from swirl.params import app_params_with_100_bits_security
    from swirl.prover.backend import ProvingContext
    from swirl.testing.synthetic import SyntheticAir, load_segment_atlas

    segments = load_segment_atlas(args.reth_atlas, args.max_log_height)
    total = len(segments)
    if args.segment_idx is not None:
        # replay exactly these segments (atlas segment_idx values) — used
        # for compile-once per-segment replays spread across rounds on the
        # tunneled dev chip, where a full tier in one process is infeasible
        want = {int(x) for x in args.segment_idx.split(",")}
        sample = [
            i for i, s in enumerate(segments) if s["segment_idx"] in want
        ]
    else:
        n = math.ceil(total * args.sample_frac)
        idxs = list(range(total))
        random.Random(args.seed).shuffle(idxs)
        sample = sorted(idxs[:n])

    # params must admit the workload's constraint degree (the captured reth
    # profile has degree-4 AIRs; the app preset's default cap is 3)
    gdeg = max(
        (segments[i].get("max_constraint_degree", 3) for i in sample),
        default=3,
    )
    if gdeg <= 3:
        params = app_params_with_100_bits_security(args.max_log_height)
    else:
        from swirl.params import WhirProximityStrategy, params_with_100_bits_security

        params = params_with_100_bits_security(
            log_blowup=1,
            l_skip=4,
            n_stack=max(args.max_log_height - 4, 0),
            w_stack=2048,
            folding_pow_bits=5,
            mu_pow_bits=15,
            proximity=WhirProximityStrategy("unique"),
            max_constraint_degree=gdeg,
        )
    results = []
    total_keygen_ms = 0.0
    total_prove_ms = 0.0
    for si in sample:
        seg = segments[si]
        airs = [SyntheticAir(s) for s in seg["shapes"]]
        traces = [a.generate_trace() for a in airs]
        eng = StarkEngine(params)
        t0 = time.time()
        pk, vk = eng.keygen(airs)
        keygen_ms = (time.time() - t0) * 1e3
        dpk = eng.transport_pk(pk)
        ctx = ProvingContext(
            [eng.context_for(i, tr, [], []) for i, tr in enumerate(traces)]
        )
        t0 = time.time()
        if args.fused:
            from swirl.prover.fused import prove_fused

            proof = prove_fused(eng.backend, dpk, ctx, mode=args.fused_mode)
        else:
            proof = eng.prove(dpk, ctx)
        prove_ms = (time.time() - t0) * 1e3
        if args.verify:
            eng.verify(vk, proof)
        cells = sum(
            (1 << s.log_height) * a.common_main_width()
            for s, a in zip(seg["shapes"], airs)
        )
        total_keygen_ms += keygen_ms
        total_prove_ms += prove_ms
        rec = {
            "segment_idx": seg["segment_idx"],
            "num_airs": len(airs),
            "total_main_cells": cells,
            "keygen_ms": round(keygen_ms, 1),
            "prove_ms": round(prove_ms, 1),
            "clamped": seg["clamped"],
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    scorecard = {
        "profile_path": args.reth_atlas,
        "sample_frac": args.sample_frac,
        "seed": args.seed,
        "max_log_height": args.max_log_height,
        "total_segments": total,
        "sampled_segments": len(sample),
        "skipped_segments": 0,
        "total_keygen_ms": round(total_keygen_ms, 1),
        "total_prove_ms": round(total_prove_ms, 1),
        "results": results,
    }
    print(json.dumps(scorecard))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(scorecard, f, indent=1)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--atlas", help="shape atlas JSON (testing/synthetic.py format)")
    ap.add_argument("--log-heights", default="10,12", help="uniform sweep heights")
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--constraints", type=int, default=8)
    ap.add_argument("--interactions", type=int, default=4)
    ap.add_argument("--degree", type=int, default=3)
    ap.add_argument("--l-skip", type=int, default=4)
    ap.add_argument("--k-whir", type=int, default=4)
    ap.add_argument("--fused", action="store_true",
                    help="use the fused device-resident prover (TPU)")
    ap.add_argument("--fused-mode", default="eager",
                    choices=["jit", "segmented", "eager"])
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--reth-atlas", help="segment atlas JSON (benchmarks/reth_atlas.py)")
    ap.add_argument("--sample-frac", type=float, default=0.1)
    ap.add_argument("--segment-idx",
                    help="comma-separated atlas segment_idx list to replay "
                         "(overrides --sample-frac)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max-log-height", type=int, default=22)
    ap.add_argument("--out", help="write scorecard JSON here instead of stdout only")
    ap.add_argument("--verify", action="store_true",
                    help="also verify each segment proof (untimed)")
    args = ap.parse_args()

    if args.reth_atlas:
        return replay_reth(args)

    import numpy as np

    from swirl import metrics
    from swirl.engine import StarkEngine
    from swirl.params import test_system_params_small
    from swirl.prover.backend import ProvingContext
    from swirl.testing.synthetic import (
        SyntheticAir,
        load_shape_atlas,
        uniform_shape,
    )

    if args.atlas:
        shapes = load_shape_atlas(args.atlas)
    else:
        shapes = [
            uniform_shape(
                int(lh),
                args.width,
                num_constraints=args.constraints,
                num_interactions=args.interactions,
                degree=args.degree,
            )
            for lh in args.log_heights.split(",")
        ]

    scorecard = []
    total_prove_s = 0.0
    total_cells = 0
    for shape in shapes:
        n_stack = max(shape.log_height - args.l_skip, 1)
        eng = StarkEngine(
            test_system_params_small(args.l_skip, n_stack, args.k_whir)
        )
        air = SyntheticAir(shape)
        trace = air.generate_trace()
        t0 = time.time()
        pk, vk = eng.keygen([air])
        keygen_s = time.time() - t0
        ctx = ProvingContext([eng.context_for(0, trace, [], [])])
        dpk = eng.transport_pk(pk)

        best = None
        for _ in range(max(args.repeats, 1)):
            t0 = time.time()
            with metrics.run_with_metric_collection() as snap:
                if args.fused:
                    from swirl.prover.fused import prove_fused

                    proof = prove_fused(eng.backend, dpk, ctx, mode=args.fused_mode)
                else:
                    proof = eng.prove(dpk, ctx)
            dt = time.time() - t0
            if best is None or dt < best[0]:
                best = (dt, snap.snapshot())
        prove_s, spans = best
        eng.verify(vk, proof)
        cells = (1 << shape.log_height) * air.common_main_width()
        total_prove_s += prove_s
        total_cells += cells
        scorecard.append(
            {
                "air": shape.air_name,
                "log_height": shape.log_height,
                "width": air.common_main_width(),
                "keygen_s": round(keygen_s, 3),
                "prove_s": round(prove_s, 3),
                "cells_per_s": round(cells / prove_s, 1),
                "verified": True,
                "spans_ms": {
                    k: round(v, 1)
                    for k, v in spans.items()
                    if k.endswith("_time_ms")
                },
            }
        )
        print(json.dumps(scorecard[-1]), flush=True)

    print(
        json.dumps(
            {
                "total_prove_s": round(total_prove_s, 3),
                "total_cells": total_cells,
                "mcells_per_s": round(total_cells / total_prove_s / 1e6, 3),
                "segments": len(scorecard),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
