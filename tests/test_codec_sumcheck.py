import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swirl.codec import CodecError, decode_proof, encode_proof
from swirl.fields import ext
from swirl.fields import jfield as jf
from swirl.fields.babybear import P
from swirl.prover.errors import SumcheckError
from swirl.prover.plain_sumcheck import (
    sumcheck_multilinear,
    sumcheck_prismalinear,
    verify_sumcheck_multilinear,
    verify_sumcheck_prismalinear,
)
from swirl.transcript import Transcript
from swirl import poly as hpoly


class TestPlainSumcheck:
    def test_multilinear_roundtrip(self):
        rng = np.random.default_rng(0)
        n = 5
        evals_host = rng.integers(0, P, (1 << n, 4), dtype=np.uint64)
        proof, r = sumcheck_multilinear(Transcript(), jf.const_arr(evals_host))
        assert ext.eeq(proof.sum_claim, ext.esum(evals_host, axis=0))
        r2 = verify_sumcheck_multilinear(Transcript(), proof, n)
        for a, b in zip(r, r2):
            assert ext.eeq(a, b)
        # final claim == MLE(evals)(r) (note fold order: var i <-> bit i)
        expect = hpoly.eval_mle_evals_at_point(
            evals_host, np.stack(list(r))
        )
        assert ext.eeq(proof.eval_claim, expect)

    def test_multilinear_tamper_rejected(self):
        rng = np.random.default_rng(1)
        evals_host = rng.integers(0, P, (8, 4), dtype=np.uint64)
        proof, _ = sumcheck_multilinear(Transcript(), jf.const_arr(evals_host))
        proof.round_polys_eval[1][0] = (proof.round_polys_eval[1][0] + 1) % P
        with pytest.raises(SumcheckError):
            verify_sumcheck_multilinear(Transcript(), proof, 3)

    def test_prismalinear_roundtrip(self):
        rng = np.random.default_rng(2)
        l_skip, n = 2, 3
        evals_host = rng.integers(0, P, (1 << (l_skip + n), 4), dtype=np.uint64)
        proof, r = sumcheck_prismalinear(
            Transcript(), l_skip, jf.const_arr(evals_host)
        )
        assert ext.eeq(proof.sum_claim, ext.esum(evals_host, axis=0))
        r2 = verify_sumcheck_prismalinear(Transcript(), proof, l_skip, n)
        for a, b in zip(r, r2):
            assert ext.eeq(a, b)


class TestCodec:
    def test_roundtrip_and_verify(self, fib_setup):
        engine, vk, _, _, proof = fib_setup
        blob = encode_proof(proof)
        proof2 = decode_proof(blob)
        engine.verify(vk, proof2)
        # re-encoding is byte-identical (canonical)
        assert encode_proof(proof2) == blob

    def test_roundtrip_with_interactions(self, selfint_setup):
        engine, vk, _, _, proof = selfint_setup
        blob = encode_proof(proof)
        proof2 = decode_proof(blob)
        engine.verify(vk, proof2)

    def test_version_check(self, fib_setup):
        proof = fib_setup[4]
        blob = bytearray(encode_proof(proof))
        blob[0] ^= 1
        with pytest.raises(CodecError):
            decode_proof(bytes(blob))

    def test_noncanonical_felt_rejected(self, fib_setup):
        proof = fib_setup[4]
        blob = bytearray(encode_proof(proof))
        # overwrite the first digest element with a non-canonical value
        import struct

        blob[4:8] = struct.pack("<I", P)
        with pytest.raises(CodecError):
            decode_proof(bytes(blob))

    def test_trailing_bytes_rejected(self, fib_setup):
        proof = fib_setup[4]
        blob = encode_proof(proof) + b"\x00"
        with pytest.raises(CodecError):
            decode_proof(blob)


class TestVkCodec:
    def test_vk_roundtrip_and_verify(self, selfint_setup):
        """encode_vk/decode_vk roundtrip; a decoded vk verifies a proof."""
        from swirl.codec import decode_vk, encode_vk
        from swirl.verifier import verify

        _, vk, _, _, proof = selfint_setup
        data = encode_vk(vk)
        vk2 = decode_vk(data)
        assert encode_vk(vk2) == data
        assert vk2.params == vk.params
        assert len(vk2.per_air) == len(vk.per_air)
        assert vk2.per_air[0].symbolic_constraints.nodes == (
            vk.per_air[0].symbolic_constraints.nodes
        )
        assert np.array_equal(vk2.pre_hash, vk.pre_hash)
        verify(vk2.params, vk2, proof)

    def test_vk_codec_rejects_bad_version(self, fib_setup):
        from swirl.codec import decode_vk, encode_vk

        vk = fib_setup[1]
        data = bytearray(encode_vk(vk))
        data[0] ^= 0xFF
        with pytest.raises(CodecError):
            decode_vk(bytes(data))
