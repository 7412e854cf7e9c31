"""Tests for the BN254 outer hash scheme: Poseidon2 widths 2/3, the
multi-field hasher, and the multi-field transcript."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swirl.fields.babybear import P
from swirl.hash import bn254_poseidon2 as bn
from swirl.hash.multi_field import (
    MultiFieldHasher,
    MultiFieldTranscript,
    pack_felts,
)


class TestBn254Poseidon2:
    def test_permutation_deterministic_and_in_field(self):
        for t in (2, 3):
            out1 = bn.permute([1, 2, 3][:t], t)
            out2 = bn.permute([1, 2, 3][:t], t)
            assert out1 == out2
            assert all(0 <= x < bn.P_BN254 for x in out1)
            assert out1 != [1, 2, 3][:t]

    def test_input_sensitivity(self):
        base = bn.permute([0, 0, 0], 3)
        for lane in range(3):
            s = [0, 0, 0]
            s[lane] = 1
            assert bn.permute(s, 3) != base

    def test_grain_reproduces_frozen_rc3(self):
        """The live Grain-LFSR generator must reproduce the frozen vendored
        width-3 table (swirl/hash/bn254_rc3.py) bit-exactly — pins the
        BN254-field Grain sampling path (peer of the reference's
        zkhash-vs-p3 runtime check, width3.rs:95-110)."""
        from swirl.hash.bn254_rc3 import (
            RC3_EXTERNAL_FINAL,
            RC3_EXTERNAL_INITIAL,
            RC3_INTERNAL,
        )
        from swirl.hash.grain import poseidon2_round_constants

        ext_i, internal, ext_f = poseidon2_round_constants(
            bn.P_BN254, bn.N_BITS, 3, 8, 56
        )
        assert tuple(tuple(r) for r in ext_i) == RC3_EXTERNAL_INITIAL
        assert tuple(internal) == RC3_INTERNAL
        assert tuple(tuple(r) for r in ext_f) == RC3_EXTERNAL_FINAL
        # Published HorizenLabs poseidon2_instance_bn256.rs RC3[0][0]
        # (cross-check anchor; full table could not be fetched — no egress).
        assert RC3_EXTERNAL_INITIAL[0][0] == int(
            "1d066a255517b7fd8bddd3a93f7804ef7f8fcde48bb4c37a59a09a1a97052816",
            16,
        )

    def test_constants_distinct_per_width(self):
        a = bn.constants(2)
        b = bn.constants(3)
        assert a[1] != b[1]

    def test_compress_and_sponge(self):
        c = bn.compress2(5, 7)
        assert 0 <= c < bn.P_BN254
        assert c != bn.compress2(7, 5)
        h = bn.hash_scalars([1, 2, 3])
        assert h != bn.hash_scalars([1, 2, 4])
        assert h != bn.hash_scalars([1, 2])


class TestMultiFieldHasher:
    def test_pack_felts(self):
        vals = [1, 2, 3, 4, 5, 6, 7, 8, 9]
        packed = pack_felts(vals)
        assert len(packed) == 2
        acc = packed[0]
        for j in range(8):
            assert (acc >> (31 * j)) & ((1 << 31) - 1) == vals[j]
        assert packed[1] == 9

    def test_hash_slice_sensitivity(self):
        a = MultiFieldHasher.hash_slice(np.arange(20, dtype=np.uint64))
        b = MultiFieldHasher.hash_slice(np.arange(20, dtype=np.uint64) + 1)
        assert a != b

    def test_merkle_root(self):
        rows = [[i, i + 1] for i in range(8)]
        root = MultiFieldHasher.merkle_root(rows)
        assert 0 <= root < bn.P_BN254
        rows[3][0] += 1
        assert MultiFieldHasher.merkle_root(rows) != root


class TestMultiFieldTranscript:
    def test_prover_verifier_lockstep(self):
        t1, t2 = MultiFieldTranscript(), MultiFieldTranscript()
        for t in (t1, t2):
            t.observe(7)
            t.observe_slice([1, 2, 3])
        assert t1.sample() == t2.sample()
        t1.observe(9)
        t2.observe(9)
        assert t1.sample_ext().tolist() == t2.sample_ext().tolist()

    def test_samples_in_field_and_distinct(self):
        t = MultiFieldTranscript()
        t.observe(123)
        vals = [t.sample() for _ in range(16)]
        assert all(0 <= v < P for v in vals)
        assert len(set(vals)) > 10

    def test_observe_changes_future_samples(self):
        t1, t2 = MultiFieldTranscript(), MultiFieldTranscript()
        t1.observe(1)
        t2.observe(2)
        assert t1.sample() != t2.sample()

    def test_commit_digest_absorbed(self):
        t1, t2 = MultiFieldTranscript(), MultiFieldTranscript()
        t1.observe_commit(12345)
        t2.observe_commit(54321)
        assert t1.sample() != t2.sample()

    def test_grind_roundtrip(self):
        t = MultiFieldTranscript()
        t.observe(42)
        checker = t.clone()
        w = t.grind(4)
        assert checker.check_witness(4, w)
        assert t.sample() == checker.sample()

    def test_bad_witness_rejected(self):
        t = MultiFieldTranscript()
        t.observe(42)
        w = t.clone().grind(6)
        assert not t.check_witness(6, w + 1) or w + 1 == w
