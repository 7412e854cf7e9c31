"""Vectorized constraint-DAG interpreter for large AIRs.

For AIRs with thousands of nodes (keccak-f, captured reth shapes), tracing
one jnp op per DAG node would blow up trace/compile time. Instead the DAG is
compiled once (host-side) into a *level schedule*: nodes are renumbered so
that each topological level is a contiguous, op-type-grouped block, and the
whole level executes as a handful of batched gathers + one batched field op
per op type. Traced op count scales with DAG depth (typically < 40), not
node count.

Memory is bounded by a liveness analysis: after each level the value buffer
is compacted to the nodes that are still referenced by a later level or by
the DAG's outputs (constraints + interaction fields). Peak live values for
keccak-f-scale DAGs is a few thousand, vs. >100k total nodes.

This is the TPU-native peer of the reference CUDA backend's three-address
"rules" bytecode interpreter (``cuda-backend/src/pkey.rs`` /
``logup_zerocheck/rules``): same role, but the interpreter is data-parallel
XLA instead of a device bytecode VM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from ..symbolic import ConstraintsDag

OPS = ("add", "sub", "mul", "neg")


@dataclass
class DagSchedule:
    """Host-side compiled form of a ConstraintsDag.

    Buffers are per-level: ``levels[L]`` maps op -> (left_pos, right_pos)
    positions *into the level-L input buffer*; ``keeps[L]`` indexes into
    concat(input_buffer, level_outputs) to form the level-L+1 input buffer.
    ``out_pos`` maps original output-node indices into the final buffer.
    """

    leaf_kinds: List[Tuple]  # ("const", v) | ("var", e, p, o, i) | ("sel", k)
    levels: List[Dict[str, Tuple[np.ndarray, np.ndarray]]]
    keeps: List[np.ndarray]
    out_pos: Dict[int, int]
    max_live: int


def _output_nodes(dag: ConstraintsDag) -> List[int]:
    outs = set(dag.constraint_idx)
    for it in dag.interactions:
        outs.add(it.count)
        outs.update(it.message)
    return sorted(outs)


def compile_schedule(dag: ConstraintsDag) -> DagSchedule:
    n = len(dag.nodes)
    level = np.zeros(n, dtype=np.int64)
    for i, node in enumerate(dag.nodes):
        tag = node[0]
        if tag in ("const", "var", "sel"):
            level[i] = 0
        elif tag == "neg":
            level[i] = level[node[1]] + 1
        else:
            level[i] = max(level[node[1]], level[node[2]]) + 1
    max_level = int(level.max()) if n else 0

    outputs = _output_nodes(dag)
    # last level whose ops consume each node; outputs live to the end
    last_use = np.array(level)  # a node is born at its own level
    for i, node in enumerate(dag.nodes):
        tag = node[0]
        if tag in ("const", "var", "sel"):
            continue
        children = (node[1],) if tag == "neg" else (node[1], node[2])
        for c in children:
            last_use[c] = max(last_use[c], level[i])
    for i in outputs:
        last_use[i] = max_level + 1

    # level-0 buffer: live leaves in original order
    buf_ids: List[int] = [
        i
        for i, node in enumerate(dag.nodes)
        if level[i] == 0 and last_use[i] > 0
    ]
    leaf_kinds = [dag.nodes[i] for i in buf_ids]
    pos = {nid: k for k, nid in enumerate(buf_ids)}

    levels: List[Dict[str, Tuple[np.ndarray, np.ndarray]]] = []
    keeps: List[np.ndarray] = []
    max_live = len(buf_ids)
    for lv in range(1, max_level + 1):
        by_op: Dict[str, Tuple[List[int], List[int], List[int]]] = {}
        for i in np.nonzero(level == lv)[0]:
            node = dag.nodes[i]
            tag = node[0]
            li = node[1]
            ri = node[2] if tag != "neg" else node[1]
            ids, ls, rs = by_op.setdefault(tag, ([], [], []))
            ids.append(int(i))
            ls.append(pos[li])
            rs.append(pos[ri])
        level_sched: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        out_ids: List[int] = []
        for op in OPS:
            if op not in by_op:
                continue
            ids, ls, rs = by_op[op]
            level_sched[op] = (np.array(ls), np.array(rs))
            out_ids.extend(ids)
        levels.append(level_sched)
        # build next buffer: survivors of the current buffer + new outputs
        ext_ids = buf_ids + out_ids  # positions in concat(buf, outs)
        next_ids = [nid for nid in ext_ids if last_use[nid] > lv]
        keep = np.array(
            [k for k, nid in enumerate(ext_ids) if last_use[nid] > lv],
            dtype=np.int64,
        )
        keeps.append(keep)
        buf_ids = next_ids
        pos = {nid: k for k, nid in enumerate(buf_ids)}
        max_live = max(max_live, len(ext_ids))

    out_pos = {nid: pos[nid] for nid in outputs}
    return DagSchedule(
        leaf_kinds=leaf_kinds,
        levels=levels,
        keeps=keeps,
        out_pos=out_pos,
        max_live=max_live,
    )


_schedule_cache: Dict[int, DagSchedule] = {}


def get_schedule(dag: ConstraintsDag) -> DagSchedule:
    key = id(dag)
    if key not in _schedule_cache:
        _schedule_cache[key] = compile_schedule(dag)
    return _schedule_cache[key]


def eval_dag_vectorized(dag: ConstraintsDag, evaluator) -> "NodeValues":
    """Evaluate all output nodes with the level schedule.

    `evaluator` provides the same leaf/op interface as DeviceEvaluator.
    Returns a NodeValues wrapper supporting [original_node_idx] for the
    DAG's output nodes (constraints + interaction count/message nodes).
    """
    sched = get_schedule(dag)
    leaf_vals = []
    batch_shape = None
    for node in sched.leaf_kinds:
        tag = node[0]
        if tag == "const":
            v = evaluator.eval_const(node[1])
        elif tag == "var":
            v = evaluator.eval_var(node[1], node[2], node[3], node[4])
            batch_shape = v.shape
        else:
            v = evaluator.eval_sel(node[1])
            batch_shape = v.shape
        leaf_vals.append(v)
    assert batch_shape is not None, "vectorized eval needs at least one var/sel"
    leaf_vals = [jnp.broadcast_to(v, batch_shape) for v in leaf_vals]
    buf = jnp.stack(leaf_vals, axis=0)  # (num_live_leaves, *batch)

    for level_sched, keep in zip(sched.levels, sched.keeps):
        outs = []
        for op in OPS:
            if op not in level_sched:
                continue
            ls, rs = level_sched[op]
            a = jnp.take(buf, jnp.asarray(ls), axis=0)
            if op == "neg":
                outs.append(evaluator.neg(a))
            else:
                b = jnp.take(buf, jnp.asarray(rs), axis=0)
                outs.append(getattr(evaluator, op)(a, b))
        ext = jnp.concatenate([buf] + outs, axis=0)
        buf = jnp.take(ext, jnp.asarray(keep), axis=0)
    return NodeValues(buf, sched.out_pos)


class NodeValues:
    """Indexable by ORIGINAL dag node index (output nodes only)."""

    def __init__(self, buf, out_pos: Dict[int, int]):
        self.buf = buf
        self.out_pos = out_pos

    def __getitem__(self, orig_idx: int):
        return self.buf[self.out_pos[int(orig_idx)]]

    def gather(self, orig_indices) -> jnp.ndarray:
        """(k, *batch) stack of node values for original indices."""
        idx = np.array([self.out_pos[int(i)] for i in orig_indices], dtype=np.int64)
        return jnp.take(self.buf, jnp.asarray(idx), axis=0)
