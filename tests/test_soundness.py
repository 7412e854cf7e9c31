"""Soundness accounting tests: every production preset must clear the
100-bit target under the documented workload assumptions (the swirl analog
of the reference ``stark-backend/tests/soundness.rs``)."""

import math

import tests.conftest  # noqa: F401

from swirl.params import (
    app_params_with_100_bits_security,
    internal_params_with_100_bits_security,
    leaf_params_with_100_bits_security,
    root_params_with_100_bits_security,
)
from swirl.soundness import (
    calculate_soundness,
    combine_security_bits,
    effective_pow_bits,
    format_soundness_report,
    log2_add,
    min_whir_queries,
)

# Workload assumptions from the app preset docs
APP_ASSUMPTIONS = dict(
    max_num_constraints_per_air=5000,
    num_airs=100,
    num_trace_columns=30000,
    num_stacked_columns=2048,
)


class TestSoundnessMath:
    def test_log2_add(self):
        assert abs(log2_add(3.0, 3.0) - 4.0) < 1e-12
        assert abs(log2_add(10.0, 0.0) - math.log2(1025)) < 1e-9
        assert log2_add(math.inf, 5.0) == math.inf

    def test_combine_security_bits(self):
        # equal errors halve the security by one bit
        assert abs(combine_security_bits(50.0, 50.0) - 49.0) < 1e-12
        assert combine_security_bits(math.inf, 42.0) == 42.0

    def test_effective_pow_bits(self):
        assert effective_pow_bits(0) == 0.0
        # slightly under nominal because residue 0 is heavy
        v = effective_pow_bits(20)
        assert 19.0 < v <= 20.0


class TestProductionPresets:
    def _check(self, params, max_log_height):
        report = calculate_soundness(
            params,
            max_log_trace_height=max_log_height,
            n_logup=max(max_log_height - params.l_skip, 0),
            **APP_ASSUMPTIONS,
        )
        assert report.total_bits >= 99.0, vars(report)

    def test_app_preset(self):
        self._check(app_params_with_100_bits_security(24), 24)

    def test_leaf_preset(self):
        self._check(leaf_params_with_100_bits_security(23), 23)

    def test_internal_preset(self):
        self._check(internal_params_with_100_bits_security(22), 22)

    def test_root_preset(self):
        self._check(root_params_with_100_bits_security(21), 21)

    def test_logup_list_size_is_security_penalty(self):
        """List size subtracts linearly (reference calculator.rs:1085)."""
        from swirl.soundness import logup_soundness

        no_list = logup_soundness(1 << 27, 4, 124.0, 0.0)
        with_list = logup_soundness(1 << 27, 4, 124.0, 5.0)
        assert abs(no_list - with_list - 5.0) < 1e-9

    def test_fused_batch_constraint_boundary_soundness(self):
        """Exact boundary-degree formula (reference calculator.rs:1104)."""
        import math

        from swirl.soundness import constraint_batching_soundness

        sec = constraint_batching_soundness(100.0, 11, 7, 3, 10, 4, 2.0)
        expected_degree = max(3.0 + 7.0 + 10.0, 20.0)
        assert abs(sec - (100.0 - math.log2(expected_degree) - 2.0)) < 1e-9

    def test_whir_unique_decoding_security(self):
        """Per-query bits at unique decoding: ~0.415 at rate 1/2, ~0.678 at
        rate 1/4 (reference calculator.rs:1120)."""
        from swirl.params import ProximityRegime

        ud = ProximityRegime(kind="unique")
        assert abs(ud.query_security_bits(100, 1) - 41.5) < 1.0
        assert abs(ud.query_security_bits(100, 2) - 67.8) < 1.0

    def test_whir_gamma_batching_uses_list_size_and_batch_size(self):
        import math

        from swirl.soundness import whir_gamma_batching_security

        sec = whir_gamma_batching_security(100.0, 5, 3.0)
        assert abs(sec - (100.0 - math.log2(5.0) - 3.0)) < 1e-9

    def test_bchks25_reference_m2_enforces_dz_ge_dy(self):
        from swirl.soundness import bchks25_reference_log2_degrees

        _, l2_dy, l2_dz = bchks25_reference_log2_degrees(24, 2, 2)
        assert l2_dz >= l2_dy

    def test_bchks25_m1_requires_rho_below_four_ninths(self):
        import math

        from swirl.soundness import log2_a_bound_bchks25

        invalid = log2_a_bound_bchks25(12, 1, 1)  # rho = 1/2 > 4/9
        assert math.isinf(invalid[0]) and math.isinf(invalid[1])
        valid = log2_a_bound_bchks25(12, 2, 1)  # rho = 1/4 < 4/9
        assert math.isfinite(valid[0])

    def test_min_whir_queries_monotone(self):
        p = app_params_with_100_bits_security(24)
        assert min_whir_queries(p, 100) > min_whir_queries(p, 50)

    def test_format_soundness_report(self):
        p = app_params_with_100_bits_security(24)
        rep = calculate_soundness(
            p, max_log_trace_height=24,
            n_logup=max(24 - p.l_skip, 0), **APP_ASSUMPTIONS,
        )
        text = format_soundness_report(
            p, rep, max_log_trace_height=24,
            n_logup=max(24 - p.l_skip, 0), **APP_ASSUMPTIONS,
        )
        assert "TOTAL SECURITY" in text
        assert f"l_skip: {p.l_skip}" in text
        # one table line per WHIR round
        assert sum(l.startswith("  Round ") for l in text.splitlines()) == len(
            p.whir.rounds
        )


class TestVkAudit:
    def _vk(self, airs):
        from swirl.engine import StarkEngine
        from swirl.params import test_system_params_small

        eng = StarkEngine(test_system_params_small(2, 5, 2))
        pk, vk = eng.keygen(airs)
        return eng.params, vk

    def test_audit_small_params_reports_low_bits(self):
        from swirl.soundness import audit_vk
        from swirl.testing.fixtures import FibonacciAir

        params, vk = self._vk([FibonacciAir()])
        rep = audit_vk(params, vk, target_bits=100.0)
        # tiny test parameters cannot reach 100 bits
        assert not rep.ok
        assert rep.achieved_bits < 100.0
        assert any(f.severity == "fail" for f in rep.findings)

    def test_audit_interaction_structure(self):
        from swirl.soundness import audit_vk
        from swirl.testing.fixtures import SelfInteractionAir

        params, vk = self._vk([SelfInteractionAir(width=4)])
        rep = audit_vk(params, vk, target_bits=1.0)
        # interactions imply trace-height constraints in the vk
        assert vk.trace_height_constraints
        assert not any(
            "overflow unchecked" in f.message for f in rep.findings
        )
