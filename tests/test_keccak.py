"""Keccak-f AIR: permutation oracle, constraint satisfaction, e2e proof.

Mirrors the role of the reference's keccakf example
(``crates/stark-sdk/examples/keccakf.rs``) as a conformance workload.
"""

import hashlib

import numpy as np
import pytest

from swirl.engine import StarkEngine
from swirl.models.keccak import (
    KeccakAir,
    NUM_KECCAK_COLS,
    keccak_f,
    sha3_256,
)
from swirl.params import test_system_params_small as small_params


class TestKeccakF:
    def test_sha3_oracle(self):
        for msg in [b"", b"abc", b"swirl" * 50, bytes(range(200))]:
            assert sha3_256(msg) == hashlib.sha3_256(msg).digest()

    def test_batched_matches_single(self):
        rng = np.random.default_rng(3)
        inp = rng.integers(0, 1 << 63, (4, 5, 5), dtype=np.uint64)
        batched = keccak_f(inp)
        for i in range(4):
            assert np.array_equal(batched[i], keccak_f(inp[i]))


class TestKeccakAir:
    def test_trace_shape_and_flags(self):
        rng = np.random.default_rng(0)
        inp = rng.integers(0, 1 << 63, (3, 5, 5), dtype=np.uint64)
        tr = KeccakAir.generate_trace(inp)
        assert tr.shape == (128, NUM_KECCAK_COLS)
        # step flags one-hot rotating
        flags = tr[:, :24]
        assert np.array_equal(flags.sum(axis=1), np.ones(128, dtype=np.uint32))
        assert np.array_equal(np.nonzero(flags)[1], np.arange(128) % 24)

    @pytest.mark.slow
    def test_constraints_satisfied(self):
        """Host debug builder: every constraint holds on a generated trace."""
        air = KeccakAir()
        rng = np.random.default_rng(1)
        inp = rng.integers(0, 1 << 63, (1, 5, 5), dtype=np.uint64)
        tr = KeccakAir.generate_trace(inp)[:32]
        params = small_params(2, 4, 2)
        eng = StarkEngine(params)
        pk, _ = eng.keygen([air])
        from swirl.prover.backend import ProvingContext

        ctx = ProvingContext([eng.context_for(0, tr, [], [])])
        eng.debug([air], pk, ctx)

    @pytest.mark.slow
    def test_e2e_prove_verify(self):
        air = KeccakAir()
        rng = np.random.default_rng(2)
        inp = rng.integers(0, 1 << 63, (2, 5, 5), dtype=np.uint64)
        tr = KeccakAir.generate_trace(inp)
        assert tr.shape[0] == 64
        params = small_params(2, 5, 3)
        eng = StarkEngine(params)
        vk, proof = eng.run_test([air], [(tr, [], [])], debug=False)
        # negative: corrupt one a_prime bit -> prover's own proof must fail
        # against a tampered public-value-free trace is covered by e2e suites;
        # here assert verify rejects a tampered opening
        import copy

        bad = copy.deepcopy(proof)
        ops = bad.batch_constraint_proof.column_openings[0][0]
        ops[5] = (np.asarray(ops[5]) + 1) % 2013265921
        with pytest.raises(Exception):
            eng.verify(vk, bad)
