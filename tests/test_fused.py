"""Fused-prover conformance: every fused mode must produce a proof whose
CODEC bYTES equal the host-path proof's bytes (the "byte-identical"
guarantee of docs/fused-prover.md, CI-enforced here per the round-1 review).

Peer of the reference's GPU-vs-host equivalence tests
(`cuda-backend/src/tests.rs:78` runs the shared suite on the GPU engine).
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (forces CPU platform + 8 virtual devices)

from swirl.codec import encode_proof
from swirl.engine import StarkEngine
from swirl.params import test_system_params_small as small_params
from swirl.prover.fused import prove_fused
from swirl.testing.fixtures import FibonacciAir


@pytest.fixture(scope="module")
def fib_setup():
    eng = StarkEngine(small_params(2, 6, 3))
    air = FibonacciAir()
    pk, vk = eng.keygen([air])
    dpk = eng.transport_pk(pk)
    from swirl.prover.backend import ProvingContext

    ctx = ProvingContext(
        [eng.context_for(0, air.generate_trace(0, 1, 64), air.pvs(0, 1, 64))]
    )
    host_proof = eng.prove(dpk, ctx)
    eng.verify(vk, host_proof)
    return eng, vk, dpk, ctx, encode_proof(host_proof)


@pytest.mark.parametrize("mode", ["jit", "segmented", "eager"])
def test_fused_mode_byte_identical(fib_setup, mode):
    eng, vk, dpk, ctx, host_bytes = fib_setup
    proof = prove_fused(eng.backend, dpk, ctx, mode=mode)
    assert encode_proof(proof) == host_bytes
    eng.verify(vk, proof)


def test_fused_cache_not_stale_across_public_values(fib_setup):
    """Two proves with identical shapes but different public values must not
    reuse a stale traced closure (advisor round-1 medium finding)."""
    eng, vk, dpk, _, _ = fib_setup
    from swirl.prover.backend import ProvingContext

    air = FibonacciAir()
    for a, b in [(0, 1), (2, 5)]:
        ctx = ProvingContext(
            [eng.context_for(0, air.generate_trace(a, b, 64), air.pvs(a, b, 64))]
        )
        host_bytes = encode_proof(eng.prove(dpk, ctx))
        fused = prove_fused(eng.backend, dpk, ctx, mode="jit")
        assert encode_proof(fused) == host_bytes
        eng.verify(vk, fused)
