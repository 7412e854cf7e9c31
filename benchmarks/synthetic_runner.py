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
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


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
    args = ap.parse_args()

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
