"""Constraint-DAG evaluation, device (JAX) and host (numpy) flavors.

The TPU-native analog of the reference's two constraint-evaluation engines
(DAG-bytecode interpreter + monomial kernels, ``cuda-backend/src/pkey.rs``):
here the per-AIR DAG is *traced* into a fused XLA computation over row
batches — each DAG node becomes one batched field op, and XLA fuses the
whole constraint into a handful of kernels.

Value conventions:
- device base mode: every node value is a base-field array broadcastable to
  the row-batch shape (used in univariate-skip round 0, where trace values
  are base field);
- device ext mode: every node value is an EF array (..., 4) (used in MLE
  sumcheck rounds after folding);
- host mode: single-point EF values (4,) (verifier and the prover's
  exhausted-trace tail).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..fields import ext as hext
from ..fields import jfield as jf
from ..fields.babybear import P, U64
from ..symbolic import ConstraintsDag, Interaction, eval_dag_nodes


class DeviceEvaluator:
    """Evaluates DAG nodes over row-batched device arrays.

    parts: list over trace parts [cached_0, ..., common] of (local, next)
    array pairs; ``next`` may be None when rotations are unused. Arrays are
    (width, *batch) base or (width, *batch, 4) ext.
    """

    def __init__(
        self,
        sels,  # (3, *batch[, 4])
        preprocessed: Optional[Tuple],
        parts: Sequence[Tuple],
        public_values: Sequence[int],
        ext_mode: bool,
    ):
        self.sels = sels
        self.preprocessed = preprocessed
        self.parts = parts
        self.public_values = public_values
        self.ext_mode = ext_mode

    # field ops ------------------------------------------------------------
    def add(self, a, b):
        return jf.ext_add(a, b) if self.ext_mode else jf.add(a, b)

    def sub(self, a, b):
        return jf.ext_sub(a, b) if self.ext_mode else jf.sub(a, b)

    def neg(self, a):
        return jf.ext_neg(a) if self.ext_mode else jf.neg(a)

    def mul(self, a, b):
        return jf.ext_mul(a, b) if self.ext_mode else jf.mul(a, b)

    # leaves ---------------------------------------------------------------
    def eval_const(self, c: int):
        if self.ext_mode:
            return jf.ext_const(hext.from_base(c))
        return jf.const(c)

    def eval_var(self, entry: str, part: int, offset: int, index: int):
        if entry == "public":
            return self.eval_const(int(self.public_values[index]))
        if entry == "preprocessed":
            pair = self.preprocessed
        else:
            pair = self.parts[part]
        arr = pair[0] if offset == 0 else pair[1]
        return arr[index]

    def eval_sel(self, kind: str):
        i = {"is_first_row": 0, "is_transition": 1, "is_last_row": 2}[kind]
        return self.sels[i]


class HostEvaluator:
    """Single-point EF evaluation (verifier / prover tail).

    Value-mode polymorphic: in the fused prover's trace mode the "points"
    are traced Monty scalars and the ops come from ``fields.text``."""

    def __init__(
        self,
        sels,  # (is_first, is_transition, is_last) EF values
        preprocessed: Optional[Sequence[Tuple[np.ndarray, np.ndarray]]],
        parts: Sequence[Sequence[Tuple[np.ndarray, np.ndarray]]],
        public_values: Sequence[int],
    ):
        from .vmode import vm

        self._ext = vm().ext
        self.sels = sels
        self.preprocessed = preprocessed
        self.parts = parts
        self.public_values = public_values

    def add(self, a, b):
        return self._ext.eadd(a, b)

    def sub(self, a, b):
        return self._ext.esub(a, b)

    def neg(self, a):
        return self._ext.eneg(a)

    def mul(self, a, b):
        return self._ext.emul(a, b)

    def eval_const(self, c: int):
        return self._ext.from_base(c)

    def eval_var(self, entry: str, part: int, offset: int, index: int):
        if entry == "public":
            return hext.from_base(int(self.public_values[index]))
        cols = self.preprocessed if entry == "preprocessed" else self.parts[part]
        return cols[index][offset]

    def eval_sel(self, kind: str):
        i = {"is_first_row": 0, "is_transition": 1, "is_last_row": 2}[kind]
        return self.sels[i]


VECTORIZE_THRESHOLD = 128


def eval_nodes(dag: ConstraintsDag, evaluator) -> list:
    return eval_dag_nodes(dag, evaluator)


def _eval_nodes_device(dag: ConstraintsDag, evaluator):
    """Dispatch: per-node tracing for small DAGs (better fusion), level-
    scheduled vectorized interpreter for large ones (bounded trace size)."""
    if len(dag.nodes) >= VECTORIZE_THRESHOLD:
        from .dag_vectorized import eval_dag_vectorized

        return eval_dag_vectorized(dag, evaluator)
    return eval_dag_nodes(dag, evaluator)


def _weighted_sum_gather(nodes, indices, weights_dev, ext_mode: bool):
    """sum_i weights[i] * nodes[indices[i]] via one gather + tree reduce.

    weights_dev: (k, 4) Monty EF. Returns (*batch, 4).
    """
    import numpy as _np

    vals = (
        nodes.gather(indices)
        if hasattr(nodes, "gather")
        else jnp.stack([nodes[i] for i in indices], axis=0)
    )
    k = len(indices)
    if ext_mode:
        w = weights_dev.reshape((k,) + (1,) * (vals.ndim - 2) + (4,))
        terms = jf.ext_mul(vals, w)
    else:
        w = weights_dev.reshape((k,) + (1,) * (vals.ndim - 1) + (4,))
        terms = jf.mul(vals[..., None], w)
    return jf.ext_sum(terms, axis=0)


def acc_constraints_device(dag: ConstraintsDag, evaluator: DeviceEvaluator, lambda_pows_dev):
    """sum_i lambda^i * constraint_i, as an EF array over the batch."""
    if not dag.constraint_idx:
        batch = evaluator.sels.shape[1:-1] if evaluator.ext_mode else evaluator.sels.shape[1:]
        return jnp.zeros(tuple(batch) + (4,), jnp.uint32)
    nodes = _eval_nodes_device(dag, evaluator)
    k = len(dag.constraint_idx)
    return _weighted_sum_gather(
        nodes, dag.constraint_idx, jnp.asarray(lambda_pows_dev)[:k], evaluator.ext_mode
    )


def acc_interactions_device(
    dag: ConstraintsDag,
    evaluator: DeviceEvaluator,
    beta_pows_dev,  # (max_len+1, 4) device EF
    bus_terms_dev,  # (num_interactions, 4) device EF: beta^len * (bus+1)
    eq_3bs_dev,  # (num_interactions, 4) device EF weights
):
    """Returns (numer, denom) EF arrays over the batch:
    numer = sum_s eq3b_s * count_s, denom = sum_s eq3b_s * h_beta_s
    (denominators exclude the alpha shift)."""
    nodes = _eval_nodes_device(dag, evaluator)
    numer = None
    denom = None
    for s, it in enumerate(dag.interactions):
        count = nodes[it.count]
        h_beta = bus_terms_dev[s]
        for j, m_idx in enumerate(it.message):
            msg = nodes[m_idx]
            if evaluator.ext_mode:
                term = jf.ext_mul(msg, beta_pows_dev[j])
            else:
                term = jf.mul(beta_pows_dev[j], msg[..., None])
            h_beta = jf.ext_add(h_beta, term)
        if evaluator.ext_mode:
            n_term = jf.ext_mul(count, eq_3bs_dev[s])
        else:
            n_term = jf.mul(eq_3bs_dev[s], count[..., None])
        d_term = jf.ext_mul(h_beta, eq_3bs_dev[s])
        numer = n_term if numer is None else jf.ext_add(numer, n_term)
        denom = d_term if denom is None else jf.ext_add(denom, d_term)
    return numer, denom


def interactions_pq_device(
    dag: ConstraintsDag,
    evaluator: DeviceEvaluator,
    beta_pows_dev,
    bus_terms_dev,
):
    """Per-interaction (count, h_beta) arrays for GKR input evaluation."""
    nodes = _eval_nodes_device(dag, evaluator)
    out = []
    for s, it in enumerate(dag.interactions):
        count = nodes[it.count]
        h_beta = bus_terms_dev[s]
        for j, m_idx in enumerate(it.message):
            msg = nodes[m_idx]
            if evaluator.ext_mode:
                term = jf.ext_mul(msg, beta_pows_dev[j])
            else:
                term = jf.mul(beta_pows_dev[j], msg[..., None])
            h_beta = jf.ext_add(h_beta, term)
        out.append((count, h_beta))
    return out


def acc_constraints_host(dag: ConstraintsDag, evaluator: HostEvaluator, lambda_pows):
    from .vmode import vm

    ext = vm().ext
    nodes = eval_nodes(dag, evaluator)
    acc = ext.ezero()
    for i, idx in enumerate(dag.constraint_idx):
        acc = ext.eadd(acc, ext.emul(nodes[idx], lambda_pows[i]))
    return acc


def acc_interactions_host(
    dag: ConstraintsDag, evaluator: HostEvaluator, beta_pows, eq_3bs
):
    from .vmode import vm

    ext = vm().ext
    nodes = eval_nodes(dag, evaluator)
    numer = ext.ezero()
    denom = ext.ezero()
    for s, it in enumerate(dag.interactions):
        count = nodes[it.count]
        h_beta = ext.escale(beta_pows[len(it.message)], (it.bus_index + 1) % P)
        for j, m_idx in enumerate(it.message):
            h_beta = ext.eadd(h_beta, ext.emul(beta_pows[j], nodes[m_idx]))
        numer = ext.eadd(numer, ext.emul(eq_3bs[s], count))
        denom = ext.eadd(denom, ext.emul(eq_3bs[s], h_beta))
    return numer, denom
