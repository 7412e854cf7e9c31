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
