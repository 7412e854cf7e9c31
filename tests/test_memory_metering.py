"""Memory-metering model invariants (port of the reference's
``memory_metering.rs`` unit tests, lines 353-460): phase disjointness of
the recompute policy, additivity when caching, and the exact integer
formulas. The bench additionally calibrates the model against the chip's
measured ``peak_bytes_in_use``."""

import tests.conftest  # noqa: F401

from swirl.memory_metering import (
    BASE_FIELD_SIZE,
    EXT_DEGREE,
    XLA_SCRATCH_OVERHEAD,
    ProvingMemoryConfig,
    ProvingMemoryCounts,
)


def _cfg(**kw) -> ProvingMemoryConfig:
    base = dict(
        l_skip=2,
        n_stack=6,
        log_blowup=1,
        k_whir=2,
        max_constraint_degree=3,
    )
    base.update(kw)
    return ProvingMemoryConfig(**base)


def _counts(with_rot=1 << 12, without_rot=0, interactions=0):
    return ProvingMemoryCounts(
        main_cells_with_rot=with_rot,
        main_cells_without_rot=without_rot,
        interaction_cells=interactions,
    )


class TestMemoryMetering:
    def test_dropped_rs_code_matrix_is_phase_disjoint(self):
        """With cache_rs_code_matrix=False the RS codeword is recomputed
        on demand, so its footprint overlaps (max) the constraint phases
        instead of adding (reference memory_metering.rs:359)."""
        cfg = _cfg(cache_rs_code_matrix=False)
        est = cfg.estimate(_counts())
        assert est.secondary_peak == max(
            est.rs_code_matrix + est.whir, max(est.batch_constraint, est.gkr)
        )

    def test_cached_rs_code_matrix_is_additive(self):
        """With caching, the RS codeword coexists with every later phase
        (reference memory_metering.rs:384)."""
        cfg = _cfg(cache_rs_code_matrix=True)
        est = cfg.estimate(_counts())
        assert est.secondary_peak == est.rs_code_matrix + max(
            est.whir, max(est.batch_constraint, est.gkr)
        )

    def test_batch_constraint_memory_uses_integer_formula(self):
        """Exact integer arithmetic, no float rounding (reference
        memory_metering.rs:398)."""
        cfg = _cfg()
        counts = _counts(with_rot=1000, without_rot=24)
        per_cell = EXT_DEGREE * BASE_FIELD_SIZE
        folded = (1000 * 2 + 24) * per_cell >> cfg.l_skip
        num_cosets = cfg.max_constraint_degree - 1
        round0 = 1024 * num_cosets * (BASE_FIELD_SIZE + per_cell)
        expected = max(folded, round0) + XLA_SCRATCH_OVERHEAD
        assert cfg.batch_constraint_memory_bytes(counts) == expected

    def test_stacked_matrix_and_whir_components_are_counted_separately(self):
        """Stacked matrix and WHIR buffers are distinct estimate components
        that both contribute to the total (reference
        memory_metering.rs:434)."""
        cfg = _cfg()
        est = cfg.estimate(_counts())
        assert est.stacked_matrix > 0 and est.whir > 0
        assert est.total == est.main + est.stacked_matrix + est.secondary_peak

    def test_no_cache_stacked_matrix_drops_component(self):
        cfg = _cfg(cache_stacked_matrix=False)
        est = cfg.estimate(_counts())
        assert est.stacked_matrix == 0

    def test_gkr_memory_zero_without_interactions(self):
        cfg = _cfg()
        assert cfg.gkr_memory_bytes(0) == 0
        assert cfg.gkr_memory_bytes(1 << 10) > 0
