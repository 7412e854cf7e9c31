"""Extract proof content from a pure transcript stream and compare with the
original proof (the reference's transcript_extractor harness)."""

import numpy as np

import tests.conftest  # noqa: F401

from swirl.verifier.transcript_extractor import extract_proof_from_transcript


def _assert_fields_equal(a, b):
    assert np.array_equal(a.common_main_commit, b.common_main_commit)
    ga, gb = a.gkr_proof, b.gkr_proof
    assert ga.logup_pow_witness == gb.logup_pow_witness
    assert np.array_equal(ga.q0_claim, gb.q0_claim)
    assert len(ga.claims_per_layer) == len(gb.claims_per_layer)
    for ca, cb in zip(ga.claims_per_layer, gb.claims_per_layer):
        for f in ("p_xi_0", "q_xi_0", "p_xi_1", "q_xi_1"):
            assert np.array_equal(getattr(ca, f), getattr(cb, f))
    ba, bb = a.batch_constraint_proof, b.batch_constraint_proof
    for x, y in zip(ba.univariate_round_coeffs, bb.univariate_round_coeffs):
        assert np.array_equal(x, y)
    assert len(ba.column_openings) == len(bb.column_openings)
    for pa, pb in zip(ba.column_openings, bb.column_openings):
        for fa, fb in zip(pa, pb):
            assert len(fa) == len(fb)
            for x, y in zip(fa, fb):
                assert np.array_equal(x, y)
    sa, sb = a.stacking_proof, b.stacking_proof
    for oa, ob in zip(sa.stacking_openings, sb.stacking_openings):
        for x, y in zip(oa, ob):
            assert np.array_equal(x, y)
    wa, wb = a.whir_proof, b.whir_proof
    assert wa.mu_pow_witness == wb.mu_pow_witness
    assert wa.folding_pow_witnesses == wb.folding_pow_witnesses
    assert wa.query_phase_pow_witnesses == wb.query_phase_pow_witnesses
    for x, y in zip(wa.codeword_commits, wb.codeword_commits):
        assert np.array_equal(x, y)
    for x, y in zip(wa.ood_values, wb.ood_values):
        assert np.array_equal(x, y)
    for x, y in zip(wa.final_poly, wb.final_poly):
        assert np.array_equal(x, y)


class TestTranscriptExtractor:
    def test_fibonacci(self, recorded_fib_setup):
        _, vk, _, _, proof, log = recorded_fib_setup
        extracted = extract_proof_from_transcript(
            vk, proof.trace_vdata, proof.public_values, log
        )
        _assert_fields_equal(proof, extracted)

    def test_with_interactions(self, recorded_selfint_setup):
        _, vk, _, _, proof, log = recorded_selfint_setup
        extracted = extract_proof_from_transcript(
            vk, proof.trace_vdata, proof.public_values, log
        )
        _assert_fields_equal(proof, extracted)

    def test_extracted_proof_verifies_with_hints(self, recorded_fib_setup):
        """With the Merkle-bound WHIR objects supplied out-of-band, the
        extracted proof passes the FULL verifier (reference WhirProofHints
        round-trip, transcript_extractor.rs:91-151)."""
        from swirl.codec import encode_proof
        from swirl.verifier.transcript_extractor import whir_hints_from_proof

        eng, vk, _, _, proof, log = recorded_fib_setup
        extracted = extract_proof_from_transcript(
            vk,
            proof.trace_vdata,
            proof.public_values,
            log,
            whir_hints=whir_hints_from_proof(proof),
        )
        assert encode_proof(extracted) == encode_proof(proof)
        eng.verify(vk, extracted)

    def test_tampered_stream_detected(self, recorded_fib_setup):
        import pytest

        from swirl.verifier.transcript_extractor import ExtractionError

        _, vk, _, _, proof, log = recorded_fib_setup
        log = list(log)
        del log[-1]
        with pytest.raises(ExtractionError):
            extract_proof_from_transcript(
                vk, proof.trace_vdata, proof.public_values, log
            )

    def test_typed_extraction_errors(self, recorded_fib_setup):
        """Each malformation maps to its taxonomy variant with positional
        fields (reference TranscriptExtractionError variants,
        transcript_extractor.rs:46-66)."""
        import pytest

        from swirl.verifier.transcript_extractor import (
            StreamExhausted,
            TrailingEntries,
            UnexpectedEntryKind,
            ValueMismatch,
        )

        _, vk, _, _, proof, log = recorded_fib_setup
        log = list(log)

        # truncated log -> StreamExhausted at the end position
        with pytest.raises(StreamExhausted) as ei:
            extract_proof_from_transcript(
                vk, proof.trace_vdata, proof.public_values, log[:-1]
            )
        assert ei.value.fields["position"] == len(log) - 1

        # trailing events -> TrailingEntries with the remaining count
        with pytest.raises(TrailingEntries) as ei:
            extract_proof_from_transcript(
                vk,
                proof.trace_vdata,
                proof.public_values,
                log + [("observe", 0), ("observe", 0)],
            )
        assert ei.value.fields["remaining"] == 2

        # flipped entry kind mid-stream -> UnexpectedEntryKind at that index
        k, v = log[10]
        flipped = list(log)
        flipped[10] = ("sample" if k == "observe" else "observe", v)
        with pytest.raises(UnexpectedEntryKind) as ei:
            extract_proof_from_transcript(
                vk, proof.trace_vdata, proof.public_values, flipped
            )
        assert ei.value.fields["position"] == 10

        # corrupted pre-hash felt -> ValueMismatch("vk pre-hash")
        bad = list(log)
        bad[0] = (bad[0][0], (bad[0][1] + 1) % (1 << 31))
        with pytest.raises(ValueMismatch) as ei:
            extract_proof_from_transcript(
                vk, proof.trace_vdata, proof.public_values, bad
            )
        assert ei.value.fields["label"] == "vk pre-hash"

        # variants compare by value
        assert TrailingEntries(position=3, remaining=2) == TrailingEntries(
            position=3, remaining=2
        )
        assert TrailingEntries(position=3, remaining=2) != TrailingEntries(
            position=3, remaining=1
        )
