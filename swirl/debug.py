"""Debug-first constraint checker: evaluates every constraint on every row
on the host before proving, and checks LogUp bus balance across all traces
(cf. reference ``crates/stark-backend/src/air_builders/debug/``).
"""

from __future__ import annotations

from collections import defaultdict
from typing import List

import numpy as np

from .fields.babybear import P, U64
from .keygen import MultiStarkProvingKey
from .symbolic import ConstraintsDag, eval_dag_nodes

_DEBUG_ENABLED = [True]


def disable_debug():
    _DEBUG_ENABLED[0] = False


def enable_debug():
    _DEBUG_ENABLED[0] = True


class _RowEvaluator:
    """Vectorized base-field evaluation over all rows at once."""

    def __init__(self, prep, parts, pvs, height):
        self.prep = prep  # (h, w) or None
        self.parts = parts  # list of (h, w)
        self.pvs = pvs
        self.h = height
        idx = np.arange(height)
        self.sels = [
            (idx == 0).astype(U64),
            (idx != height - 1).astype(U64),
            (idx == height - 1).astype(U64),
        ]

    def eval_const(self, c):
        return np.full(self.h, c % P, dtype=U64)

    def eval_var(self, entry, part, offset, index):
        mat = self.prep if entry == "preprocessed" else None
        if entry == "public":
            return np.full(self.h, int(self.pvs[index]) % P, dtype=U64)
        if entry == "main":
            mat = self.parts[part]
        col = mat[:, index]
        if offset == 0:
            return col
        return np.roll(col, -offset)

    def eval_sel(self, kind):
        i = {"is_first_row": 0, "is_transition": 1, "is_last_row": 2}[kind]
        return self.sels[i]

    def add(self, a, b):
        return (a + b) % U64(P)

    def sub(self, a, b):
        return (a + U64(P) - b) % U64(P)

    def neg(self, a):
        return (U64(P) - a) % U64(P)

    def mul(self, a, b):
        return (a * b) % U64(P)


def check_constraints_and_interactions(airs, pk: MultiStarkProvingKey, ctx):
    """ctx: ProvingContext with device matrices; pulled to host here."""
    if not _DEBUG_ENABLED[0]:
        return
    from .prover.backend import from_device_matrix

    bus_sums = defaultdict(lambda: defaultdict(int))  # bus -> msg tuple -> count
    # bus -> msg tuple -> [(air_id, signed count)] for the imbalance report
    contributions = defaultdict(lambda: defaultdict(list))
    for air_id, tc in ctx.per_trace:
        spk = pk.per_air[air_id]
        dag: ConstraintsDag = spk.vk.symbolic_constraints
        common = from_device_matrix(tc.common_main)
        h = common.shape[0]
        prep = None
        if spk.preprocessed_data is not None:
            prep = from_device_matrix(spk.preprocessed_data.trace)
        cached = [from_device_matrix(cd.trace) for cd in tc.cached_mains]
        parts = cached + [common]
        ev = _RowEvaluator(prep, parts, tc.public_values, h)
        nodes = eval_dag_nodes(dag, ev)
        for ci, idx in enumerate(dag.constraint_idx):
            vals = nodes[idx]
            bad = np.nonzero(vals)[0]
            if bad.size:
                raise AssertionError(
                    f"constraint {ci} of AIR {spk.air_name} (id {air_id}) "
                    f"failed at row {int(bad[0])}"
                )
        for it in dag.interactions:
            counts = nodes[it.count]
            msgs = np.stack([nodes[m] for m in it.message], axis=1)  # (h, len)
            for row in range(h):
                c = int(counts[row])
                if c == 0:
                    continue
                key = tuple(int(x) for x in msgs[row])
                bus_sums[it.bus_index][key] = (
                    bus_sums[it.bus_index][key] + c
                ) % P
                contributions[it.bus_index][key].append((air_id, c))
    unbalanced = {
        bus: {key: total for key, total in table.items() if total % P != 0}
        for bus, table in bus_sums.items()
    }
    unbalanced = {bus: t for bus, t in unbalanced.items() if t}
    if unbalanced:
        raise AssertionError(format_unbalanced_report(unbalanced, contributions, pk))


def format_unbalanced_report(unbalanced, contributions, pk) -> str:
    """Per-bus unbalanced-message diff: for every message whose signed count
    sum is nonzero, list each contributing (AIR, count) pair so the author
    can see which side dropped/duplicated a send. Peer of the reference
    interaction debugger (``interaction/debug.rs`` LogicalInteractions +
    the `debug_constraints_and_interactions` report)."""
    lines = ["LogUp bus imbalance detected:"]
    for bus in sorted(unbalanced):
        lines.append(f"  bus {bus}:")
        for key, total in list(unbalanced[bus].items())[:20]:
            signed = total if total <= P // 2 else total - P
            lines.append(f"    message {key}: net count {signed} (mod p {total})")
            for air_id, c in contributions[bus][key]:
                name = pk.per_air[air_id].air_name
                sc = c if c <= P // 2 else c - P
                lines.append(f"      {name} (air {air_id}): {sc:+d}")
        extra = len(unbalanced[bus]) - 20
        if extra > 0:
            lines.append(f"    ... and {extra} more unbalanced messages")
    return "\n".join(lines)
