"""Additional conformance coverage: optional/absent AIRs, wide multi-trace
mixtures, randomized parameter sweeps (mirrors reference backend-tests
categories 1, 3, 5, 6)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swirl.engine import StarkEngine
from swirl.params import test_system_params_small as small_params
from swirl.prover.backend import ProvingContext
from swirl.testing.fixtures import (
    DummyInteractionAir,
    FibonacciAir,
    MixtureAir,
    SelfInteractionAir,
)
from swirl.testing.synthetic import SyntheticAir, uniform_shape


class TestOptionalAirs:
    def test_absent_optional_air(self):
        """Keygen includes two AIRs; only one is present in the proof."""
        engine = StarkEngine(small_params(2, 4, 3))
        fib = FibonacciAir()
        mix = MixtureAir(3)
        pk, vk = engine.keygen([fib, mix])
        trace = FibonacciAir.generate_trace(1, 1, 16)
        pvs = FibonacciAir.pvs(1, 1, 16)
        ctx = ProvingContext([engine.context_for(0, trace, pvs, [])])
        proof = engine.prove(engine.transport_pk(pk), ctx)
        assert proof.trace_vdata[1] is None
        engine.verify(vk, proof)

    def test_required_air_missing_fails(self):
        engine = StarkEngine(small_params(2, 4, 3))
        fib = FibonacciAir()
        mix = MixtureAir(3)
        pk, vk = engine.keygen([fib, mix], required=[False, True])
        trace = FibonacciAir.generate_trace(1, 1, 16)
        pvs = FibonacciAir.pvs(1, 1, 16)
        ctx = ProvingContext([engine.context_for(0, trace, pvs, [])])
        proof = engine.prove(engine.transport_pk(pk), ctx)
        with pytest.raises(Exception):
            engine.verify(vk, proof)

    def test_present_subset_with_interactions(self):
        """Absent AIR with interactions: bus must still balance among
        present traces."""
        engine = StarkEngine(small_params(2, 4, 3))
        self_int = SelfInteractionAir(4)
        mix = MixtureAir(3)
        pk, vk = engine.keygen([mix, self_int])
        ctx = ProvingContext(
            [engine.context_for(1, self_int.generate_trace(8), [], [])]
        )
        proof = engine.prove(engine.transport_pk(pk), ctx)
        engine.verify(vk, proof)


class TestWideMixtures:
    @pytest.mark.slow
    def test_self_interaction_widths(self):
        """Multi-trace self-interactions at mixed widths/heights (reference
        uses widths [4,7,8,8,10,100]; we use a representative subset).
        Slow tier: test_e2e's test_self_interaction_multi_width covers the
        same multi-width bus balancing in the default tier."""
        engine = StarkEngine(small_params(2, 7, 3))
        widths = [4, 7, 10]
        airs = [SelfInteractionAir(w, bus_index=i) for i, w in enumerate(widths)]
        ctxs = [
            (a.generate_trace(1 << (3 + i), seed=i), [], [])
            for i, a in enumerate(airs)
        ]
        engine.run_test(airs, ctxs)

    def test_synthetic_shapes(self):
        engine = StarkEngine(small_params(2, 4, 3))
        shapes = [uniform_shape(4, 6, num_constraints=5, num_interactions=4),
                  uniform_shape(3, 4, num_constraints=3, num_interactions=2)]
        airs = [SyntheticAir(s) for s in shapes]
        ctxs = [(a.generate_trace(), [], []) for a in airs]
        engine.run_test(airs, ctxs)


class TestStackingAndParams:
    def test_stacking_overflow_rejected(self):
        """A trace taller than the stacked height must be rejected
        (reference backend-tests stacking-overflow case)."""
        from swirl.prover.errors import StackedPcsError

        eng = StarkEngine(small_params(2, 3, 2))  # stacked height 2^5
        air = FibonacciAir()
        trace = FibonacciAir.generate_trace(1, 1, 64)  # 64 > 32
        pvs = FibonacciAir.pvs(1, 1, 64)
        with pytest.raises((StackedPcsError, ValueError, AssertionError)):
            eng.run_test([air], [(trace, pvs, [])])

    def test_l_skip_5_roundtrip(self):
        """High univariate-skip: 32-point chunks (reference sweeps
        l_skip in {2,5,6}, backend-tests lib.rs:1560-1587)."""
        eng = StarkEngine(small_params(5, 2, 2))
        fib_case(eng, n=64)

    @pytest.mark.slow
    def test_l_skip_6_lifted_roundtrip(self):
        """l_skip 6 with a height-16 trace: the trace is LIFTED into the
        64-point chunk (cyclic tiling) before the univariate round.
        Slow tier (~50 s compile); l_skip=5 covers the >32-point sweep in
        the default tier."""
        eng = StarkEngine(small_params(6, 2, 2))
        fib_case(eng, n=16)

    def test_l_skip_bound_rejected(self):
        """Backend rejects l_skip above the kernel bound (reference
        cuda device.rs:59 validate_gpu_l_skip, l_skip <= 9)."""
        from swirl.prover.errors import ProverError

        with pytest.raises(ProverError):
            StarkEngine(small_params(10, 2, 2))

    def test_two_cached_parts_roundtrip(self):
        """Two cached-main partitions in one AIR (reference sweeps
        cached-part counts 1-3)."""
        from swirl.testing.fixtures import MultiCachedAir

        eng = StarkEngine(small_params(2, 4, 2))
        air = MultiCachedAir()
        common, cached = MultiCachedAir.generate_traces(16)
        eng.run_test([air], [(common, [], cached)])


def fib_case(engine, n, a0=1, b0=1):
    air = FibonacciAir()
    trace = FibonacciAir.generate_trace(a0, b0, n)
    pvs = FibonacciAir.pvs(a0, b0, n)
    return engine.run_test([air], [(trace, pvs, [])])


class TestRandomizedParams:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_params_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        l_skip = int(rng.integers(1, 4))
        k_whir = int(rng.integers(2, 4))
        n_stack = int(rng.integers(3, 6))
        engine = StarkEngine(small_params(l_skip, n_stack, k_whir))
        n = 1 << int(rng.integers(2, min(l_skip + n_stack, 5)))
        trace = FibonacciAir.generate_trace(1, 2, n)
        pvs = FibonacciAir.pvs(1, 2, n)
        engine.run_test([FibonacciAir()], [(trace, pvs, [])])


class TestProverConfig:
    def test_no_cache_recompute_path(self):
        """cache_stacked_matrix=False / cache_rs_code_matrix=False must
        produce the identical proof (recompute-on-demand policy)."""
        import numpy as np
        from swirl.engine import StarkEngine
        from swirl.params import test_system_params_small
        from swirl.prover.backend import ProverConfig, ProvingContext
        from swirl.testing.fixtures import FibonacciAir
        from swirl.codec import encode_proof

        air = FibonacciAir()
        trace = FibonacciAir.generate_trace(0, 1, 16)
        pvs = FibonacciAir.pvs(0, 1, 16)
        params = test_system_params_small(2, 3, 2)

        proofs = []
        for cfg in (
            ProverConfig(),
            ProverConfig(cache_stacked_matrix=False, cache_rs_code_matrix=False),
        ):
            eng = StarkEngine(params, prover_config=cfg)
            pk, vk = eng.keygen([air])
            ctx = ProvingContext([eng.context_for(0, trace, pvs, [])])
            dpk = eng.transport_pk(pk)
            proof = eng.prove(dpk, ctx)
            eng.verify(vk, proof)
            proofs.append(encode_proof(proof))
        assert proofs[0] == proofs[1]

    def test_memory_config_estimates(self):
        from swirl.engine import StarkEngine
        from swirl.params import test_system_params_small

        eng = StarkEngine(test_system_params_small(2, 6, 2))
        cfg = eng.proving_memory_config()
        assert cfg.stacked_matrix_memory_bytes(1 << 12) > 0


class TestZerocheckSaveMemory:
    def test_save_memory_proof_is_identical(self, monkeypatch):
        """zerocheck_save_memory (chunked round-0 coset grids) must produce
        byte-identical proofs — the chunk-segment sum order is irrelevant
        mod P (reference GpuProverConfig.zerocheck_save_memory,
        device.rs:29)."""
        from swirl.codec import encode_proof
        from swirl.prover import logup_zerocheck
        from swirl.prover.backend import ProverConfig, ProvingContext
        from swirl.testing.fixtures import SelfInteractionAir

        # engage chunking at test heights (n_chunks = 8 at h=32, l_skip=2)
        monkeypatch.setattr(
            logup_zerocheck, "_SAVE_MEMORY_MIN_CHUNKS_LOG", 3
        )
        air = SelfInteractionAir(4)
        trace = air.generate_trace(32)
        blobs = []
        for save in (False, True):
            eng = StarkEngine(
                small_params(2, 5, 2),
                prover_config=ProverConfig(zerocheck_save_memory=save),
            )
            pk, vk = eng.keygen([air])
            ctx = ProvingContext([eng.context_for(0, trace, [], [])])
            proof = eng.prove(eng.transport_pk(pk), ctx)
            eng.verify(vk, proof)
            blobs.append(encode_proof(proof))
        assert blobs[0] == blobs[1]

    def test_save_memory_default_follows_blowup(self):
        from swirl.engine import StarkEngine

        eng = StarkEngine(small_params(2, 4, 2))  # log_blowup = 1
        assert eng.backend.config.zerocheck_save_memory is True
        assert eng.proving_memory_config().zerocheck_save_memory is True


class TestKeygenDiagnostics:
    def test_find_unused_vars(self):
        from swirl.air import Air
        from swirl.keygen import find_unused_vars
        from swirl.testing.fixtures import FibonacciAir

        assert find_unused_vars(FibonacciAir()) == []

        class Wasteful(Air):
            def name(self):
                return "wasteful"

            def common_main_width(self):
                return 4

            def eval(self, b):
                row = b.common_main.local
                b.assert_zero(row[0] * row[1] - row[1])

        unused = find_unused_vars(Wasteful())
        # (entry, part, offset, index); the AIR has no rotations, so only
        # offset-0 entries are reported (reference keygen/mod.rs:402-420)
        assert ("main", 0, 0, 2) in unused and ("main", 0, 0, 3) in unused
        assert ("main", 0, 0, 0) not in unused
        assert all(off == 0 for _, _, off, _ in unused)


@pytest.fixture(scope="module")
def pipeline_stage_run():
    """One prove-up-to-batch-constraints run shared by the stage tests."""
    from swirl.engine import StarkEngine
    from swirl.params import test_system_params_small
    from swirl.prover.backend import ProvingContext
    from swirl.testing.fixtures import SelfInteractionAir
    from swirl.testing.pipeline import prove_up_to_batch_constraints

    air = SelfInteractionAir(width=4)
    eng = StarkEngine(test_system_params_small(2, 5, 2))
    pk, vk = eng.keygen([air])
    ctx = ProvingContext([eng.context_for(0, air.generate_trace(32), [], [])])
    dpk = eng.transport_pk(pk)
    stage = prove_up_to_batch_constraints(eng.backend, dpk, ctx)
    return vk, stage


class TestPipelineDecomposition:
    """Run the prover only up to the batch-constraint stage and verify that
    stage in isolation (reference lib.rs:378-565), including the q0-claim
    malleability negative (lib.rs:427-480)."""

    def test_stage_roundtrip(self, pipeline_stage_run):
        from swirl.testing.pipeline import verify_up_to_batch_constraints

        vk, (commit, vdata, pvs, gkr, batch, r, _t) = pipeline_stage_run
        verify_up_to_batch_constraints(vk, commit, vdata, pvs, gkr, batch)

    def test_tampered_q0_rejected_at_stage(self, pipeline_stage_run):
        import copy

        from swirl.testing.pipeline import verify_up_to_batch_constraints
        from swirl.verifier.batch_constraints import BatchConstraintError
        from swirl.verifier.gkr import GkrError

        vk, (commit, vdata, pvs, gkr, batch, r, _t) = pipeline_stage_run
        gkr = copy.deepcopy(gkr)
        gkr.q0_claim = (gkr.q0_claim + np.uint64(1)) % np.uint64(
            (1 << 31) - (1 << 27) + 1
        )
        with pytest.raises((BatchConstraintError, GkrError)):
            verify_up_to_batch_constraints(vk, commit, vdata, pvs, gkr, batch)
