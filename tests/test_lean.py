"""Lean 4 extraction conformance (peer of the reference
``crates/stark-backend/src/lean/tests.rs``): use-count-driven lifting of
shared subexpressions into ``inter_k`` helpers, local ``let`` dedup, the
``constrain_interactions`` bus branch, module prologue/namespace, and AIR
name formatting."""

import unittest

from swirl.lean_extraction import (
    LeanEntry,
    LeanRenderContext,
    constraint_to_lean_definition,
    dag_use_counts,
    extract_constraints_to_lean,
    format_lean_air_name,
    generate_lean_air_definition,
    render_vk,
)
from swirl.symbolic import Interaction, Selector, Var, build_dag


def _delta():
    # variable-based so the interning DAG builder cannot constant-fold it
    return Var("main", 0, part=0) - Var("main", 1, part=0)


class TestLeanRender(unittest.TestCase):
    def test_avoids_inter_defs_for_low_use_subexpressions(self):
        # lean/tests.rs:14-33 — delta is used twice but is a single op, so it
        # stays a local let; nothing is lifted.
        delta = _delta()
        inner = delta + (3 * delta)
        expr = Selector("is_first_row") * inner
        dag = build_dag([expr], [])
        ctx = LeanRenderContext(use_counts=dag_use_counts(dag))
        helper_defs, rendered = constraint_to_lean_definition(
            dag, dag.constraint_idx[0], 5, "", None, ctx
        )
        self.assertEqual(helper_defs, [])
        self.assertNotIn("def inter_0", rendered)
        self.assertIn("let t0 := ", rendered)
        self.assertIn("def constraint_5", rendered)
        self.assertIn("= 0", rendered)

    def test_reuses_inter_defs_across_constraints(self):
        # lean/tests.rs:35-62 — a multi-op shared subexpression is lifted
        # exactly once; the second constraint references the helper.
        delta = _delta()
        shared = delta + (3 * delta)
        e0 = Selector("is_first_row") * shared
        e1 = Selector("is_last_row") * shared
        dag = build_dag([e0, e1], [])
        ctx = LeanRenderContext(use_counts=dag_use_counts(dag))
        hd0, r0 = constraint_to_lean_definition(
            dag, dag.constraint_idx[0], 0, "", None, ctx
        )
        hd1, r1 = constraint_to_lean_definition(
            dag, dag.constraint_idx[1], 1, "", None, ctx
        )
        self.assertEqual(
            sum("def inter_0" in d for d in hd0), 1, msg=str(hd0)
        )
        self.assertEqual(hd1, [])
        self.assertNotIn("def inter_0", r0)
        self.assertIn("inter_0 c row", r1)

    def test_dedupes_reused_local_let_bindings(self):
        # lean/tests.rs:64-79
        delta = _delta()
        expr = delta + (3 * delta)
        dag = build_dag([expr], [])
        ctx = LeanRenderContext(use_counts=dag_use_counts(dag))
        helper_defs, rendered = constraint_to_lean_definition(
            dag, dag.constraint_idx[0], 0, "", None, ctx
        )
        self.assertEqual(helper_defs, [])
        self.assertEqual(rendered.count("let t0 :="), 1)

    def test_constrain_interactions_uses_intermediates(self):
        # lean/tests.rs:81-107
        delta = _delta()
        shared = delta + (3 * delta)
        count = Selector("is_first_row") * shared
        msg = Selector("is_last_row") * shared
        it = Interaction(message=[msg], count=count, bus_index=7, count_weight=1)
        dag = build_dag([], [it])
        rendered = extract_constraints_to_lean(dag, "TestAir")
        self.assertIn("def inter_0", rendered)
        self.assertIn("def constrain_interactions", rendered)
        self.assertIn("if index = 7 then\n", rendered)
        self.assertIn("inter_0 c row", rendered)
        self.assertNotIn("let t0 :=\n        let t0 :=", rendered)

    def test_prologue_and_namespace(self):
        # lean/tests.rs:109-134
        dag = build_dag([Selector("is_first_row") + 0], [])
        rendered = extract_constraints_to_lean(dag, "Sha2BlockHasherVmAir")
        self.assertIn("import Mathlib.Algebra.Field.Basic", rendered)
        self.assertIn("import LeanZKCircuit.OpenVM.Circuit", rendered)
        self.assertIn("set_option linter.all false", rendered)
        self.assertIn(
            "register_simp_attr Sha2BlockHasherVmAir_air_simplification",
            rendered,
        )
        self.assertIn(
            "register_simp_attr "
            "Sha2BlockHasherVmAir_constraint_and_interaction_simplification",
            rendered,
        )
        self.assertIn("namespace Sha2BlockHasherVmAir.extraction", rendered)
        self.assertIn("def constraint_0", rendered)
        self.assertIn("end Sha2BlockHasherVmAir.extraction", rendered)

    def test_formats_generic_air_names(self):
        # lean/tests.rs:136-146
        self.assertEqual(
            format_lean_air_name("Sha2BlockHasherVmAir<Sha256Config, Sha512Config>"),
            "Sha2BlockHasherVmAir_Sha256Config_Sha512Config",
        )
        self.assertEqual(
            format_lean_air_name(
                "VerifierSubCircuit<4, CachedSymbolicExpressionColumns<u8>>"
            ),
            "VerifierSubCircuit_4_CachedSymbolicExpressionColumns_u8",
        )

    def test_negative_constant_rendering(self):
        # render.rs:558-575 — constants near the characteristic render as
        # negative literals
        from swirl.fields.babybear import P

        expr = Var("main", 0) * (P - 2)
        dag = build_dag([expr], [])
        rendered = extract_constraints_to_lean(dag, "NegAir")
        self.assertIn("-2", rendered)
        self.assertNotIn(str(P - 2), rendered)

    def test_used_columns_preamble_sorted(self):
        expr = (
            Var("main", 3, part=1)
            + Var("main", 1, part=0, offset=1)
            + Var("preprocessed", 0)
            + Var("public", 2)
        )
        dag = build_dag([expr], [])
        rendered = extract_constraints_to_lean(dag, "ColsAir")
        pre = rendered.index("c.preprocessed (column := 0)")
        m0 = rendered.index("c.main (id := 0) (column := 1)")
        m1 = rendered.index("c.main (id := 1) (column := 3)")
        pub = rendered.index("c.public (index := 2)")
        self.assertLess(pre, m0)
        self.assertLess(m0, m1)
        self.assertLess(m1, pub)

    def test_define_air_block(self):
        # columns.rs:20-42
        entries = [
            LeanEntry("is_valid"),
            LeanEntry("inner", sub_air_type="KeccakCols", width=17),
        ]
        text = generate_lean_air_definition("MyAir", entries)
        self.assertIn('#define_air "MyAir" using "openvm_encapsulation" where', text)
        self.assertIn('  Column["is_valid"]', text)
        self.assertIn('  MainSubAir["inner": "KeccakCols" width := 17]', text)


class TestLeanFromVk(unittest.TestCase):
    def test_render_vk_fibonacci(self):
        from swirl.engine import StarkEngine
        from swirl.params import test_system_params_small
        from swirl.testing.fixtures import FibonacciAir

        eng = StarkEngine(test_system_params_small(2, 6, 3))
        _, mvk = eng.keygen([FibonacciAir()])
        text = render_vk(mvk, ["FibonacciAir"])
        self.assertIn("namespace FibonacciAir.extraction", text)
        self.assertIn("def constraint_0", text)
        self.assertIn("def constrain_interactions", text)


if __name__ == "__main__":
    unittest.main()
