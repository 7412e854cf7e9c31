"""Golden parity fixtures: today's prover must reproduce the checked-in
proof bytes / vk bytes / vk pre-hash / transcript event log byte-for-byte.

This is the drift guard the reference gets from verifying proofs under a
pinned verifier + `DuplexSpongeValidator` replay
(``transcript/duplex_sponge.rs:131-196``): one swapped observe, one changed
length prefix, one codec field reorder — and these tests fail at the exact
diverging transcript event, while the ordinary self-consistent test suite
would stay green. See ``docs/golden_fixtures.md`` for regeneration policy
and for validating the same fixtures against the Rust reference verifier.
"""

import os

import numpy as np
import pytest

from swirl.codec import decode_proof, decode_vk, encode_proof
from swirl.testing.golden import (
    CASE_SCHEME,
    build_case,
    case_has_codec,
    decode_transcript_log,
    golden_cases,
    paths_for,
)

CASES = sorted(golden_cases())


def _read(path: str) -> bytes:
    assert os.path.exists(path), (
        f"missing golden file {path}; regenerate with "
        "`JAX_PLATFORMS=cpu python -m swirl.testing.golden` ONLY if the "
        "protocol change is intentional"
    )
    with open(path, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def built():
    return {name: build_case(name) for name in CASES}


@pytest.mark.parametrize("name", CASES)
def test_reproduces_golden_bytes(built, name):
    vk_bytes, pre_hash_hex, proof_bytes, log, _, _ = built[name]
    p = paths_for(name)

    golden_log = decode_transcript_log(_read(p["transcript"]))
    if log != golden_log:
        # Locate the first diverging Fiat-Shamir event for a precise error.
        for i, (got, want) in enumerate(zip(log, golden_log)):
            assert got == want, (
                f"{name}: transcript diverges at event {i}: "
                f"golden {want}, today {got}"
            )
        pytest.fail(
            f"{name}: transcript length changed: golden {len(golden_log)} "
            f"events, today {len(log)}"
        )

    assert pre_hash_hex == _read(p["prehash"]).decode().strip(), (
        f"{name}: vk pre-hash drifted (keygen serialization or hash change)"
    )
    if not case_has_codec(name):
        return  # outer scheme: transcript + pre-hash fixtures only
    assert vk_bytes == _read(p["vk"]), f"{name}: vk codec bytes drifted"
    assert proof_bytes == _read(p["proof"]), (
        f"{name}: proof bytes drifted with an IDENTICAL transcript — "
        "codec-layer change (field order / width / length prefix)"
    )


@pytest.mark.parametrize("name", CASES)
def test_golden_proof_verifies_today(built, name):
    """The frozen bytes must decode and verify under today's verifier —
    guards the decode path + verifier against incompatible changes even
    when the prover moved in lockstep."""
    from swirl.engine import StarkEngine

    if not case_has_codec(name):
        pytest.skip("outer scheme has no inner-codec byte fixtures")
    _, _, _, _, vk, _ = built[name]
    p = paths_for(name)
    proof = decode_proof(_read(p["proof"]))
    golden_vk = decode_vk(_read(p["vk"]))
    assert encode_proof(proof) == _read(p["proof"]), "decode/encode not involutive"
    eng = StarkEngine(golden_vk.params)
    eng.verify(golden_vk, proof)


@pytest.mark.parametrize("name", CASES)
def test_verifier_replays_prover_transcript(built, name):
    """Replay the verifier against the prover's recorded event log: the
    verifier must consume the EXACT same observe/sample stream (the
    reference's DuplexSpongeValidator harness)."""
    from swirl.engine import StarkEngine
    from swirl.transcript import TranscriptValidator

    _, _, _, _, vk, proof = built[name]
    golden_log = decode_transcript_log(_read(paths_for(name)["transcript"]))
    if case_has_codec(name):
        validator = TranscriptValidator(golden_log)
    else:
        from swirl.hash.multi_field import MultiFieldTranscriptValidator

        validator = MultiFieldTranscriptValidator(golden_log)
    eng = StarkEngine(vk.params, hash_scheme=CASE_SCHEME.get(name))
    eng.verify(vk, proof, transcript=validator)
    validator.finish()
