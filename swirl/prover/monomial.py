"""Monomial expansion of constraint DAGs + a monomial-basis evaluator.

The reference prover ships TWO constraint-evaluation engines and picks per
AIR: the three-address DAG bytecode interpreter and an expanded-monomial
kernel (``cuda-backend/src/pkey.rs:26-60``, ``src/monomial.rs:19``,
``cuda/src/batch_mle_monomial.cu``). This module is the TPU peer of the
monomial side: each constraint is expanded into a sparse sum of monomials
``coeff * prod(vars)`` over the leaf variables (trace cells, selectors),
then evaluated as one batched gather + product-tree per distinct monomial
degree.

The monomial form wins when the DAG has high fan-out of cheap nodes (the
interpreter re-materializes intermediates); the DAG interpreter wins on
deep shared subexpressions (monomial counts can blow up — expansion aborts
past ``MAX_MONOMIALS`` and callers fall back to the DAG engine, mirroring
the reference's per-AIR choice).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..fields.babybear import P
from ..symbolic import ConstraintsDag

MAX_MONOMIALS = 4096

# a monomial: coefficient (int mod P) and a sorted tuple of leaf ids
Monomial = Tuple[int, Tuple[int, ...]]
# a polynomial: map from var-tuple to coefficient
Poly = Dict[Tuple[int, ...], int]


class MonomialBlowup(Exception):
    """Expansion exceeded MAX_MONOMIALS — use the DAG interpreter instead."""


def _padd(a: Poly, b: Poly) -> Poly:
    out = dict(a)
    for k, v in b.items():
        nv = (out.get(k, 0) + v) % P
        if nv:
            out[k] = nv
        elif k in out:
            del out[k]
    if len(out) > MAX_MONOMIALS:
        raise MonomialBlowup()
    return out


def _pneg(a: Poly) -> Poly:
    return {k: (P - v) % P for k, v in a.items() if v}


def _pmul(a: Poly, b: Poly) -> Poly:
    out: Poly = {}
    for ka, va in a.items():
        for kb, vb in b.items():
            k = tuple(sorted(ka + kb))
            nv = (out.get(k, 0) + va * vb) % P
            if nv:
                out[k] = nv
            elif k in out:
                del out[k]
            if len(out) > MAX_MONOMIALS:
                raise MonomialBlowup()
    return out


@dataclass
class ExpandedConstraints:
    """Per-constraint monomial lists over leaf ids; ``leaves[i]`` is the
    original DAG node tuple ("var", ...) or ("sel", ...)."""

    leaves: List[tuple]
    # per constraint: list of (coeff, leaf-id tuple)
    constraints: List[List[Monomial]]

    def num_monomials(self) -> int:
        return sum(len(c) for c in self.constraints)


def expand_monomials(dag: ConstraintsDag) -> ExpandedConstraints:
    """Expand every constraint polynomial into monomial form.

    Raises :class:`MonomialBlowup` when any intermediate exceeds
    ``MAX_MONOMIALS`` terms.
    """
    leaves: List[tuple] = []
    leaf_ids: Dict[tuple, int] = {}

    def leaf(node: tuple) -> int:
        if node not in leaf_ids:
            leaf_ids[node] = len(leaves)
            leaves.append(node)
        return leaf_ids[node]

    polys: List[Poly] = []
    for n in dag.nodes:
        tag = n[0]
        if tag == "const":
            c = int(n[1]) % P
            polys.append({(): c} if c else {})
        elif tag in ("var", "sel"):
            polys.append({(leaf(n),): 1})
        elif tag == "add":
            polys.append(_padd(polys[n[1]], polys[n[2]]))
        elif tag == "sub":
            polys.append(_padd(polys[n[1]], _pneg(polys[n[2]])))
        elif tag == "neg":
            polys.append(_pneg(polys[n[1]]))
        elif tag == "mul":
            polys.append(_pmul(polys[n[1]], polys[n[2]]))
        else:  # pragma: no cover
            raise ValueError(f"unknown node tag {tag}")
    constraints = [
        sorted(((v, k) for k, v in polys[i].items()), key=lambda m: m[1])
        for i in dag.constraint_idx
    ]
    return ExpandedConstraints(leaves=leaves, constraints=constraints)


def acc_constraints_monomial(
    expanded: ExpandedConstraints, evaluator, lambda_pows_dev
):
    """sum_i lambda^i * constraint_i via the monomial form.

    ``evaluator`` is a :class:`swirl.prover.dag_eval.DeviceEvaluator`; the
    result matches :func:`swirl.prover.dag_eval.acc_constraints_device`
    bit-for-bit (tested).
    """
    import jax.numpy as jnp

    from ..fields import jfield as jf

    leaf_vals = []
    for node in expanded.leaves:
        if node[0] == "var":
            leaf_vals.append(evaluator.eval_var(node[1], node[2], node[3], node[4]))
        else:
            leaf_vals.append(evaluator.eval_sel(node[1]))

    acc = None
    lam = jnp.asarray(lambda_pows_dev)
    for ci, monos in enumerate(expanded.constraints):
        c_acc = None
        for coeff, var_ids in monos:
            term = None
            for vid in var_ids:
                term = (
                    leaf_vals[vid]
                    if term is None
                    else (
                        jf.ext_mul(term, leaf_vals[vid])
                        if evaluator.ext_mode
                        else jf.mul(term, leaf_vals[vid])
                    )
                )
            if term is None:
                term = evaluator.eval_const(coeff)
            elif coeff != 1:
                cdev = evaluator.eval_const(coeff)
                term = (
                    jf.ext_mul(term, cdev)
                    if evaluator.ext_mode
                    else jf.mul(term, cdev)
                )
            c_acc = term if c_acc is None else evaluator.add(c_acc, term)
        if c_acc is None:
            continue
        # weight by lambda^ci (EF) — promotes base-field terms to EF
        if evaluator.ext_mode:
            weighted = jf.ext_mul(c_acc, lam[ci])
        else:
            weighted = jf.mul(lam[ci], c_acc[..., None])
        acc = weighted if acc is None else jf.ext_add(acc, weighted)
    if acc is None:
        batch = (
            evaluator.sels.shape[1:-1]
            if evaluator.ext_mode
            else evaluator.sels.shape[1:]
        )
        return jnp.zeros(tuple(batch) + (4,), jnp.uint32)
    return acc
