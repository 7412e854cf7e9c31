"""Monomial-expansion evaluator must agree bit-for-bit with the DAG
interpreter (the reference's dual-engine equivalence,
cf. cuda-backend tests.rs:775 monomial-vs-DAG)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swirl.fields import ext as hext
from swirl.fields import jfield as jf
from swirl.fields.babybear import P
from swirl.prover.dag_eval import DeviceEvaluator, acc_constraints_device
from swirl.prover.monomial import (
    MonomialBlowup,
    acc_constraints_monomial,
    expand_monomials,
)
from swirl.prover.sumcheck import rot1, selectors_matrix
from swirl.keygen import _air_widths, run_symbolic
from swirl.symbolic import SymbolicAirBuilder
from swirl.testing.fixtures import FibonacciAir, SelfInteractionAir


def _dag_for(air):
    return run_symbolic(air, _air_widths(air)).build_dag()


def _evaluator(air, h, rng):
    w = air.common_main_width()
    trace = jf.const_arr(rng.integers(0, P, (w, h), dtype=np.uint64))
    sels = selectors_matrix(h, 2)
    pairs = [(trace, rot1(trace))]
    return DeviceEvaluator(sels, None, pairs, [1, 1, 5], False)


class TestMonomialExpansion:
    def test_expansion_basics(self):
        air = FibonacciAir()
        dag = _dag_for(air)
        exp = expand_monomials(dag)
        assert len(exp.constraints) == len(dag.constraint_idx)
        assert exp.num_monomials() > 0
        assert all(n[0] in ("var", "sel") for n in exp.leaves)

    def test_matches_dag_interpreter_fib(self):
        rng = np.random.default_rng(3)
        air = FibonacciAir()
        dag = _dag_for(air)
        exp = expand_monomials(dag)
        ev = _evaluator(air, 16, rng)
        lam = hext.epowers(
            rng.integers(0, P, 4, dtype=np.uint64),
            max(len(dag.constraint_idx), 1),
        )
        lam_dev = jf.const_arr(lam)
        a = jf.ext_to_host(acc_constraints_device(dag, ev, lam_dev))
        b = jf.ext_to_host(acc_constraints_monomial(exp, ev, lam_dev))
        assert np.array_equal(a, b)

    def test_matches_dag_interpreter_interactions(self):
        rng = np.random.default_rng(4)
        air = SelfInteractionAir(width=6)
        dag = _dag_for(air)
        try:
            exp = expand_monomials(dag)
        except MonomialBlowup:
            pytest.skip("blowup on this AIR")
        w = air.common_main_width()
        trace = jf.const_arr(rng.integers(0, P, (w, 8), dtype=np.uint64))
        sels = selectors_matrix(8, 2)
        ev = DeviceEvaluator(sels, None, [(trace, rot1(trace))], [], False)
        lam = hext.epowers(
            rng.integers(0, P, 4, dtype=np.uint64),
            max(len(dag.constraint_idx), 1),
        )
        lam_dev = jf.const_arr(lam)
        a = jf.ext_to_host(acc_constraints_device(dag, ev, lam_dev))
        b = jf.ext_to_host(acc_constraints_monomial(exp, ev, lam_dev))
        assert np.array_equal(a, b)

    def test_blowup_guard(self):
        # a wide power chain (a0+...+a7)^k expands to many monomials
        b = SymbolicAirBuilder(
            preprocessed_width=None,
            cached_widths=[],
            common_width=8,
            num_public_values=0,
        )
        row = b.common_main.local
        acc = row[0]
        for i in range(1, 8):
            acc = acc + row[i]
        prod = acc
        for _ in range(8):
            prod = prod * acc
        b.assert_zero(prod)
        dag = b.build_dag()
        with pytest.raises(MonomialBlowup):
            expand_monomials(dag)
