"""BN254-outer engine config: full proofs under the multi-field hash scheme.

Reference: ``stark-sdk/src/config/baby_bear_bn254_poseidon2.rs`` (the outer
engine config) + ``cuda-backend/src/hash_scheme.rs`` (engine-level scheme
selection). The outer scheme swaps every digest for a single BN254 scalar
and the transcript for the BN254 duplex sponge; trace math stays
BabyBear/EF4, so the SAME AIRs prove under both schemes.
"""

from __future__ import annotations

import numpy as np
import pytest

from swirl.engine import StarkEngine
from swirl.params import test_system_params_small as _small_params
from swirl.testing.fixtures import FibonacciAir
from swirl.verifier.errors import VerifierError


@pytest.fixture(scope="module")
def outer_proven():
    eng = StarkEngine(_small_params(2, 6, 3), hash_scheme="bn254-outer")
    air = FibonacciAir()
    vk, proof = eng.run_test(
        [air], [(air.generate_trace(0, 1, 64), air.pvs(0, 1, 64), [])]
    )
    return eng, vk, proof


def test_outer_proof_e2e(outer_proven):
    eng, vk, proof = outer_proven
    # digests are BN254 scalars end-to-end
    assert isinstance(proof.common_main_commit, int)
    assert isinstance(vk.pre_hash, int)
    for c in proof.whir_proof.codeword_commits:
        assert isinstance(c, int)
    for pf_set in proof.whir_proof.initial_round_merkle_proofs:
        for pf in pf_set:
            assert all(isinstance(sib, int) for sib in pf)
    eng.verify(vk, proof)  # re-verify (run_test already verified once)


def test_outer_proof_diverges_from_inner(outer_proven):
    """The outer transcript must actually drive the proof: inner and outer
    proofs of the same trace have different challenges."""
    _, _, outer_proof = outer_proven
    eng_in = StarkEngine(_small_params(2, 6, 3))
    air = FibonacciAir()
    _, inner_proof = eng_in.run_test(
        [air], [(air.generate_trace(0, 1, 64), air.pvs(0, 1, 64), [])],
        debug=False,
    )
    a = np.asarray(outer_proof.batch_constraint_proof.univariate_round_coeffs[0])
    b = np.asarray(inner_proof.batch_constraint_proof.univariate_round_coeffs[0])
    assert not np.array_equal(a, b)


def test_outer_tamper_rejected(outer_proven):
    import copy

    eng, vk, proof = outer_proven
    bad = copy.deepcopy(proof)
    bad.common_main_commit = (bad.common_main_commit + 1) % (
        21888242871839275222246405745257275088548364400416034343698204186575808495617
    )
    with pytest.raises(VerifierError):
        eng.verify(vk, bad)

    bad2 = copy.deepcopy(proof)
    pf = bad2.whir_proof.initial_round_merkle_proofs[0][0]
    pf[0] = (pf[0] + 1) % (
        21888242871839275222246405745257275088548364400416034343698204186575808495617
    )
    with pytest.raises(VerifierError):
        eng.verify(vk, bad2)

    # a digest that is not a scalar must be caught by proof shape
    bad3 = copy.deepcopy(proof)
    bad3.whir_proof.codeword_commits[0] = np.zeros(8, dtype=np.uint64)
    with pytest.raises(VerifierError):
        eng.verify(vk, bad3)


def test_outer_preprocessed_air():
    """Preprocessed commitments also carry BN254 digests (keygen committer
    goes through the scheme tree builder)."""
    from swirl.testing.fixtures import FibonacciSelectorAir

    eng = StarkEngine(_small_params(2, 4, 3), hash_scheme="bn254-outer")
    air = FibonacciSelectorAir([i % 2 == 0 for i in range(16)])
    vk, proof = eng.run_test(
        [air], [(air.generate_trace(1, 1), air.pvs(1, 1), [])]
    )
    prep = vk.per_air[0].preprocessed_data
    assert prep is not None and isinstance(prep.commit, int)
    eng.verify(vk, proof)
