"""Analytic roofline model for the prover's hot stages.

Evidence backing for the bench: for each proof stage we account the HBM
bytes necessarily moved and the Poseidon2 permutation / Montgomery-multiply
work, convert them to a lower-bound stage time on the target chip, and let
``bench.py`` print measured-vs-bound utilization next to the span timings
(the appendix VERDICT asked for; peer of the reference's kernel-level
nsys/ncu accounting, ``cuda-backend/scripts/bench.sh``).

Chip peaks default to TPU v5e (the tunneled dev chip) and are overridable
via ``SWIRL_CHIP_HBM_GBPS`` / ``SWIRL_CHIP_VPU_GOPS``:

- HBM: 819 GB/s.
- VPU: 8x128 lanes x 4 sublane-ALUs at ~0.94 GHz ~= 3850 G u32-ops/s.
  A BabyBear Montgomery multiply on u32 via 16-bit limb products costs
  ~10 VPU ops (4 16x16 products + shifts/adds + conditional subtract), so
  the chip's field-mul ceiling is ~385 Gmul/s; a width-16 Poseidon2
  permutation costs ~832 muls + ~1.3k adds => ~12k VPU ops.

All counts are *lower bounds*: they assume perfect fusion (each stage
reads its inputs from HBM exactly once and writes its outputs once) and
ignore padding, so bound/measured <= 1 and the emitted ``roofline_frac``
(= bound/measured) is a conservative "fraction of roofline".
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict

F_BYTES = 4  # BabyBear Monty u32
EF_BYTES = 16
POSEIDON2_VPU_OPS = 12_000.0  # width-16 permutation, Montgomery u32 lanes


def chip_hbm_gbps() -> float:
    return float(os.environ.get("SWIRL_CHIP_HBM_GBPS", "819"))


def chip_vpu_gops() -> float:
    return float(os.environ.get("SWIRL_CHIP_VPU_GOPS", "3850"))


@dataclass
class StageBound:
    hbm_bytes: float
    vpu_ops: float

    @property
    def min_ms(self) -> float:
        t_hbm = self.hbm_bytes / (chip_hbm_gbps() * 1e9)
        t_vpu = self.vpu_ops / (chip_vpu_gops() * 1e9)
        return max(t_hbm, t_vpu) * 1e3

    @property
    def bound(self) -> str:
        t_hbm = self.hbm_bytes / (chip_hbm_gbps() * 1e9)
        t_vpu = self.vpu_ops / (chip_vpu_gops() * 1e9)
        return "hbm" if t_hbm >= t_vpu else "vpu"


def prove_bounds(params, log_rows: int, width: int,
                 num_interactions: int) -> Dict[str, StageBound]:
    """Per-stage lower bounds for one uniform trace of 2^log_rows x width.

    Stage keys match the metric span names (docs/metrics.md parity) so the
    bench can join on them.
    """
    rows = 1 << log_rows
    cells = rows * width
    log_stacked = params.log_stacked_height
    stacked_rows = 1 << log_stacked
    stacked_w = max(cells // stacked_rows, 1)
    blowup = 1 << params.log_blowup
    rs_cells = cells * blowup
    k = params.k_whir

    # -- main_trace_commit: read trace + write stacked gather, eval->coeff
    # iDFT pass + coset-DFT blowup pass (four-step NTT = 2 HBM passes over
    # the message per transform), leaf hashing reads the RS matrix once,
    # digest tower is geometric (~2x leaf digests).
    n_leaves = (stacked_rows * blowup) >> k
    leaf_cells = rs_cells
    perms = leaf_cells / 8.0 + 2.0 * n_leaves  # rate-8 absorbs + tower
    commit = StageBound(
        hbm_bytes=(
            2 * cells * F_BYTES          # stacking gather r+w
            + 2 * 2 * rs_cells * F_BYTES  # NTT: 2 passes r+w over RS matrix
            + rs_cells * F_BYTES          # leaf hash read
            + 2 * n_leaves * 8 * F_BYTES  # digest layers w+r
        ),
        vpu_ops=(
            rs_cells * 2 * 10.0  # butterfly ~1 mul + adds per cell per pass
            + perms * POSEIDON2_VPU_OPS
        ),
    )

    # -- GKR fractional sumcheck: build the fraction tree over the lifted
    # interaction leaves (sum of layer sizes ~= 2x leaves, EF values,
    # projective add ~ 6 EF mul = 54 base muls each), then per-layer
    # fold+eval passes (~3x tree bytes total).
    n_frac = rows * max(num_interactions, 1)
    gkr = StageBound(
        hbm_bytes=5.0 * 2 * n_frac * 2 * EF_BYTES,
        vpu_ops=2 * n_frac * 54 * 10.0,
    )

    # -- batch constraints: round-0 coset grids read the trace per coset
    # (deg+1 cosets), MLE rounds halve each round => ~2x more passes.
    s_deg = params.max_constraint_degree + 1
    batch = StageBound(
        hbm_bytes=(s_deg + 2.0) * cells * F_BYTES,
        vpu_ops=s_deg * cells * 30.0,
    )

    # -- stacked reduction: one PLE-fold pass + n_stack halving rounds over
    # the stacked matrix in EF (~2x total).
    stacking = StageBound(
        hbm_bytes=3.0 * stacked_rows * stacked_w * EF_BYTES,
        vpu_ops=2.0 * stacked_rows * stacked_w * 4 * 10.0,
    )

    # -- WHIR: mu-batch read of the RS matrix, then per round the codeword
    # folds (geometric, ~2x first codeword in EF) + small commits.
    whir = StageBound(
        hbm_bytes=(rs_cells * F_BYTES
                   + 2.0 * stacked_rows * blowup * EF_BYTES),
        vpu_ops=(rs_cells * 10.0
                 + 2.0 * stacked_rows * blowup * 54.0 * 10.0 / 4),
    )

    # keys = the prover's metric span names (metrics.py / docs/metrics.md):
    # prove_rap_constraints wraps GKR + the batched constraint sumcheck.
    return {
        "prover.main_trace_commit": commit,
        "fractional_sumcheck": gkr,
        "prove_rap_constraints": StageBound(
            hbm_bytes=gkr.hbm_bytes + batch.hbm_bytes,
            vpu_ops=gkr.vpu_ops + batch.vpu_ops,
        ),
        "prove_stacked_reduction": stacking,
        "prove_whir": whir,
    }


def report(params, log_rows: int, width: int, num_interactions: int,
           spans_ms: Dict[str, float]) -> Dict[str, dict]:
    """Join measured span times with the model; returns a JSON-able dict."""
    bounds = prove_bounds(params, log_rows, width, num_interactions)
    out = {}
    for name, b in bounds.items():
        measured = spans_ms.get(name)
        entry = {
            "hbm_mb": round(b.hbm_bytes / 1e6, 1),
            "vpu_gops": round(b.vpu_ops / 1e9, 2),
            "bound": b.bound,
            "min_ms": round(b.min_ms, 2),
        }
        if measured is not None:
            entry["measured_ms"] = round(measured, 1)
            entry["roofline_frac"] = round(b.min_ms / max(measured, 1e-9), 3)
        out[name] = entry
    return out
