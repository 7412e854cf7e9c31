"""End-to-end prove+verify conformance tests (the swirl analog of the
reference's engine-generic backend test suite, ``crates/backend-tests``)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swirl.engine import StarkEngine
from swirl.params import default_test_params_small
from swirl.params import test_system_params_small as small_params
from swirl.proof import Proof
from swirl.testing.fixtures import (
    DummyInteractionAir,
    FibonacciAir,
    FibonacciSelectorAir,
    MixtureAir,
    SelfInteractionAir,
)
from swirl.fields.babybear import P
from swirl.verifier import VerifierError
from swirl.verifier.batch_constraints import BatchConstraintError
from swirl.verifier.gkr import GkrError
from swirl.verifier.proof_shape import ProofShapeError
from swirl.verifier.stacked_reduction import StackedReductionError
from swirl.verifier.whir import WhirError
from swirl import debug as swirl_debug

ANY_FAILURE = (
    VerifierError,
    BatchConstraintError,
    GkrError,
    ProofShapeError,
    StackedReductionError,
    WhirError,
    AssertionError,
    ValueError,  # prover-side rejection (non-zero LogUp sum)
)


def fib_case(engine, n, a0=1, b0=1):
    air = FibonacciAir()
    trace = FibonacciAir.generate_trace(a0, b0, n)
    pvs = FibonacciAir.pvs(a0, b0, n)
    return engine.run_test([air], [(trace, pvs, [])])


class TestFibonacci:
    def test_small_params(self):
        engine = StarkEngine(small_params(2, 3, 3))
        fib_case(engine, 16)

    @pytest.mark.slow
    def test_default_small(self):
        # covers the DEFAULT test-params preset; duplicates the protocol
        # coverage of the small_params cases above at ~4x the cost
        engine = StarkEngine(default_test_params_small())
        fib_case(engine, 32)

    def test_height_below_l_skip(self):
        # trace height 2 < 2^l_skip = 4: exercises lifting
        engine = StarkEngine(small_params(2, 3, 3))
        fib_case(engine, 2)

    def test_height_equal_l_skip(self):
        engine = StarkEngine(small_params(2, 3, 3))
        fib_case(engine, 4)

    def test_height_one(self):
        engine = StarkEngine(small_params(2, 3, 3))
        air = FibonacciAir()
        trace = FibonacciAir.generate_trace(1, 1, 1)
        pvs = FibonacciAir.pvs(1, 1, 1)
        engine.run_test([air], [(trace, pvs, [])])

    @pytest.mark.slow
    @pytest.mark.parametrize("l_skip,n_stack,k_whir", [(2, 4, 3), (3, 3, 2), (2, 5, 4)])
    def test_param_sweep(self, l_skip, n_stack, k_whir):
        engine = StarkEngine(small_params(l_skip, n_stack, k_whir))
        fib_case(engine, 16)


class TestInteractions:
    def _balanced_pair(self, field_width=2, sender_rows=None, receiver_rows=None):
        sender = DummyInteractionAir(field_width, is_send=True, bus_index=3)
        receiver = DummyInteractionAir(field_width, is_send=False, bus_index=3)
        return sender, receiver

    def test_sender_receiver_balanced(self):
        engine = StarkEngine(small_params(2, 4, 3))
        sender, receiver = self._balanced_pair()
        # sends: 2 x (7, 9) and 1 x (3, 4); receiver has matching counts
        send_rows = [[2, 7, 9], [1, 3, 4], [0, 0, 0], [0, 0, 0]]
        recv_rows = [
            [1, 7, 9],
            [1, 7, 9],
            [1, 3, 4],
            [0, 0, 0],
            [0, 0, 0],
            [0, 0, 0],
            [0, 0, 0],
            [0, 0, 0],
        ]
        engine.run_test(
            [sender, receiver],
            [
                (DummyInteractionAir.make_trace(send_rows), [], []),
                (DummyInteractionAir.make_trace(recv_rows), [], []),
            ],
        )

    def test_unbalanced_fails(self):
        engine = StarkEngine(small_params(2, 4, 3))
        sender, receiver = self._balanced_pair()
        send_rows = [[2, 7, 9], [0, 0, 0], [0, 0, 0], [0, 0, 0]]
        recv_rows = [[1, 7, 9], [0, 0, 0], [0, 0, 0], [0, 0, 0]]
        swirl_debug.disable_debug()
        try:
            with pytest.raises(ANY_FAILURE):
                engine.run_test(
                    [sender, receiver],
                    [
                        (DummyInteractionAir.make_trace(send_rows), [], []),
                        (DummyInteractionAir.make_trace(recv_rows), [], []),
                    ],
                    debug=False,
                )
        finally:
            swirl_debug.enable_debug()

    def test_self_interaction(self):
        engine = StarkEngine(small_params(2, 4, 3))
        air = SelfInteractionAir(4)
        engine.run_test([air], [(air.generate_trace(8), [], [])])

    def test_self_interaction_multi_width(self):
        engine = StarkEngine(small_params(2, 6, 3))
        airs = [SelfInteractionAir(w, bus_index=i) for i, w in enumerate([4, 7, 8])]
        ctxs = [(a.generate_trace(8 << i, seed=i), [], []) for i, a in enumerate(airs)]
        engine.run_test(airs, ctxs)


class TestMultiTrace:
    def test_mixed_heights(self):
        engine = StarkEngine(small_params(2, 5, 3))
        fib = FibonacciAir()
        mix = MixtureAir(3)
        fib_trace = FibonacciAir.generate_trace(1, 2, 32)
        fib_pvs = FibonacciAir.pvs(1, 2, 32)
        engine.run_test(
            [fib, mix],
            [(fib_trace, fib_pvs, []), (mix.generate_trace(8), [], [])],
        )

    def test_mixture_with_interactions(self):
        engine = StarkEngine(small_params(2, 5, 3))
        fib = FibonacciAir()
        self_int = SelfInteractionAir(4)
        engine.run_test(
            [fib, self_int],
            [
                (FibonacciAir.generate_trace(1, 1, 8), FibonacciAir.pvs(1, 1, 8), []),
                (self_int.generate_trace(16), [], []),
            ],
        )


class TestPreprocessed:
    def test_fib_selector(self):
        engine = StarkEngine(small_params(2, 4, 3))
        sels = [i % 2 == 0 for i in range(16)]
        air = FibonacciSelectorAir(sels)
        trace = air.generate_trace(1, 1)
        pvs = air.pvs(1, 1)
        engine.run_test([air], [(trace, pvs, [])])


class TestCached:
    def test_cached_trace(self):
        engine = StarkEngine(small_params(2, 4, 3))
        air = DummyInteractionAir(2, is_send=True, bus_index=0, partitioned=True)
        recv = DummyInteractionAir(2, is_send=False, bus_index=0)
        fields = np.array([[7, 9], [3, 4], [0, 0], [0, 0]], dtype=np.uint64)
        counts = np.array([[2], [1], [0], [0]], dtype=np.uint64)
        recv_rows = [[2, 7, 9], [1, 3, 4], [0, 0, 0], [0, 0, 0]]
        engine.run_test(
            [air, recv],
            [
                (counts, [], [fields]),
                (DummyInteractionAir.make_trace(recv_rows), [], []),
            ],
        )


class TestNegative:
    @staticmethod
    def _copy(setup):
        """Codec-roundtrip deep copy of the shared session proof so
        tampering never leaks across tests."""
        from swirl.codec import decode_proof, encode_proof

        engine, vk = setup[0], setup[1]
        return engine, vk, decode_proof(encode_proof(setup[4]))

    def test_tampered_pv_fails(self, fib_setup):
        engine, vk, proof = self._copy(fib_setup)
        proof.public_values[0][2] = (proof.public_values[0][2] + 1) % P
        with pytest.raises(ANY_FAILURE):
            engine.verify(vk, proof)

    def test_tampered_opening_fails(self, fib_setup):
        engine, vk, proof = self._copy(fib_setup)
        op = proof.batch_constraint_proof.column_openings[0][0][0]
        op[0] = (int(op[0]) + 1) % P
        with pytest.raises(ANY_FAILURE):
            engine.verify(vk, proof)

    def test_tampered_final_poly_fails(self, fib_setup):
        engine, vk, proof = self._copy(fib_setup)
        fp = proof.whir_proof.final_poly[0]
        fp[0] = (int(fp[0]) + 1) % P
        with pytest.raises(ANY_FAILURE):
            engine.verify(vk, proof)

    def test_tampered_q0_claim_fails(self, selfint_setup):
        engine, vk, proof = self._copy(selfint_setup)
        q0 = proof.gkr_proof.q0_claim
        q0[0] = (int(q0[0]) + 1) % P
        with pytest.raises(ANY_FAILURE):
            engine.verify(vk, proof)

    def test_tampered_merkle_fails(self, fib_setup):
        engine, vk, proof = self._copy(fib_setup)
        d = proof.whir_proof.initial_round_merkle_proofs[0][0][0]
        d[0] = (int(d[0]) + 1) % P
        with pytest.raises(ANY_FAILURE):
            engine.verify(vk, proof)

    # -- element-shape tampers: proof_shape must reject BEFORE any indexing
    # (reference verify_proof_shape validates every sub-structure up front,
    # verifier/proof_shape.rs:308)

    def test_short_merkle_sibling_rejected(self, fib_setup):
        engine, vk, proof = self._copy(fib_setup)
        pf = proof.whir_proof.initial_round_merkle_proofs[0][0]
        pf[0] = pf[0][:7]  # digest truncated to 7 felts
        with pytest.raises(ProofShapeError):
            engine.verify(vk, proof)

    def test_short_ef_opening_rejected(self, fib_setup):
        engine, vk, proof = self._copy(fib_setup)
        part = proof.batch_constraint_proof.column_openings[0][0]
        part[0] = part[0][:3]  # EF value truncated to 3 limbs
        with pytest.raises(ProofShapeError):
            engine.verify(vk, proof)

    def test_whir_sumcheck_eval_count_rejected(self, fib_setup):
        engine, vk, proof = self._copy(fib_setup)
        poly = proof.whir_proof.whir_sumcheck_polys[0]
        proof.whir_proof.whir_sumcheck_polys[0] = poly + [poly[0]]
        with pytest.raises(ProofShapeError):
            engine.verify(vk, proof)

    def test_final_poly_coeff_shape_rejected(self, fib_setup):
        engine, vk, proof = self._copy(fib_setup)
        proof.whir_proof.final_poly[0] = np.zeros(8, dtype=np.uint64)
        with pytest.raises(ProofShapeError):
            engine.verify(vk, proof)

    def test_commit_shape_rejected(self, fib_setup):
        engine, vk, proof = self._copy(fib_setup)
        proof.common_main_commit = proof.common_main_commit[:4]
        with pytest.raises(ProofShapeError):
            engine.verify(vk, proof)
