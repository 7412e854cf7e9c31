"""Vectorized constraint-DAG interpreter for large AIRs.

For AIRs with thousands of nodes (keccak-f, captured reth shapes), tracing
one jnp op per DAG node would blow up trace/compile time. Instead the DAG is
compiled once (host-side) into a *level schedule*: nodes are renumbered so
that each topological level is a contiguous, op-type-grouped block, and the
whole level executes as a handful of batched gathers + one batched field op
per op type. Traced op count scales with DAG depth (typically < 30), not
node count.

This is the TPU-native peer of the reference CUDA backend's three-address
"rules" bytecode interpreter (``cuda-backend/src/pkey.rs`` /
``logup_zerocheck/rules``): same role, but the interpreter is data-parallel
XLA instead of a device bytecode VM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..fields import ext as hext
from ..fields import jfield as jf
from ..symbolic import ConstraintsDag

OPS = ("add", "sub", "mul", "neg")


@dataclass
class DagSchedule:
    """Host-side compiled form of a ConstraintsDag."""

    # leaves, in new numbering order 0..num_leaves-1
    leaf_kinds: List[Tuple]  # ("const", v) | ("var", e, p, o, i) | ("sel", k)
    # per level: dict op -> (out_count, left_idx array, right_idx array)
    levels: List[Dict[str, Tuple[np.ndarray, np.ndarray]]]
    # mapping original node idx -> new idx
    remap: np.ndarray
    num_nodes: int


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
    remap = np.zeros(n, dtype=np.int64)
    leaf_kinds: List[Tuple] = []
    new_idx = 0
    # level 0: leaves in original order
    for i, node in enumerate(dag.nodes):
        if level[i] == 0:
            remap[i] = new_idx
            new_idx += 1
            leaf_kinds.append(node)
    levels: List[Dict[str, Tuple[np.ndarray, np.ndarray]]] = []
    for lv in range(1, max_level + 1):
        by_op: Dict[str, Tuple[List[int], List[int], List[int]]] = {}
        for i, node in enumerate(dag.nodes):
            if level[i] != lv:
                continue
            tag = node[0]
            li = node[1]
            ri = node[2] if tag != "neg" else node[1]
            ids, ls, rs = by_op.setdefault(tag, ([], [], []))
            ids.append(i)
            ls.append(li)
            rs.append(ri)
        level_sched: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        for op in OPS:
            if op not in by_op:
                continue
            ids, ls, rs = by_op[op]
            for i in ids:
                remap[i] = new_idx
                new_idx += 1
            level_sched[op] = (np.array(ls), np.array(rs))
        levels.append(level_sched)
    # remap child indices now that all nodes are numbered
    for sched in levels:
        for op, (ls, rs) in sched.items():
            sched[op] = (remap[ls], remap[rs])
    return DagSchedule(
        leaf_kinds=leaf_kinds, levels=levels, remap=remap, num_nodes=n
    )


_schedule_cache: Dict[int, DagSchedule] = {}


def get_schedule(dag: ConstraintsDag) -> DagSchedule:
    key = id(dag)
    if key not in _schedule_cache:
        _schedule_cache[key] = compile_schedule(dag)
    return _schedule_cache[key]


def eval_dag_vectorized(dag: ConstraintsDag, evaluator) -> "NodeValues":
    """Evaluate all nodes with the level schedule.

    `evaluator` provides the same leaf/op interface as DeviceEvaluator.
    Returns a NodeValues wrapper supporting [original_node_idx].
    """
    sched = get_schedule(dag)
    # leaves: evaluate and stack; all leaf values must broadcast to the batch
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
    buf = jnp.stack(leaf_vals, axis=0)  # (num_leaves, *batch)

    for sched_lv in sched.levels:
        outs = []
        for op in OPS:
            if op not in sched_lv:
                continue
            ls, rs = sched_lv[op]
            a = jnp.take(buf, jnp.asarray(ls), axis=0)
            if op == "neg":
                outs.append(evaluator.neg(a))
            else:
                b = jnp.take(buf, jnp.asarray(rs), axis=0)
                outs.append(getattr(evaluator, op)(a, b))
        buf = jnp.concatenate([buf] + outs, axis=0)
    return NodeValues(buf, sched.remap)


class NodeValues:
    """Indexable by ORIGINAL dag node index."""

    def __init__(self, buf, remap: np.ndarray):
        self.buf = buf
        self.remap = remap

    def __getitem__(self, orig_idx: int):
        return self.buf[int(self.remap[orig_idx])]

    def gather(self, orig_indices) -> jnp.ndarray:
        """(k, *batch) stack of node values for original indices."""
        idx = self.remap[np.asarray(orig_indices, dtype=np.int64)]
        return jnp.take(self.buf, jnp.asarray(idx), axis=0)
