import numpy as np

from swirl.fields.babybear import P
from swirl.hash import poseidon2 as p2
from swirl.transcript import Transcript


class TestPoseidon2:
    def test_permutation_changes_state_deterministically(self):
        s = np.arange(16, dtype=np.uint64)
        out1 = p2.permute_np(s)
        out2 = p2.permute_np(s)
        assert np.all(out1 == out2)
        assert not np.all(out1 == s)
        assert np.all(out1 < P)

    def test_batched_matches_single(self):
        rng = np.random.default_rng(0)
        states = rng.integers(0, P, (5, 16), dtype=np.uint64)
        batched = p2.permute_np(states)
        for i in range(5):
            assert np.all(batched[i] == p2.permute_np(states[i]))

    def test_constants_are_reference_rc16(self):
        """constants() must be the vendored HorizenLabs/Plonky3 RC16 table
        (reference cuda-common/include/poseidon2.cuh:14-47)."""
        ext_init, internal, ext_final, diag = p2.constants()
        assert ext_init.shape == (4, 16)
        assert internal.shape == (13,)
        assert ext_final.shape == (4, 16)
        # spot-pin a few values straight from the reference header
        assert ext_init[0][0] == 1774958255
        assert ext_init[3][15] == 506915399
        assert internal[0] == 1518359488
        assert internal[12] == 605745517
        assert ext_final[0][0] == 1922082829
        assert ext_final[3][15] == 1619482808
        assert diag[0] == P - 2 and diag[14] == P - pow(16, P - 2, P)

    def test_grain_reproduces_vendored_rc16(self):
        """The Grain-LFSR generator (used for instances without a vendored
        table, e.g. BN254 width-3 RC3) must reproduce the vendored BabyBear
        RC16 exactly — this pins the generator's draw order and sampling."""
        from swirl.hash import constants as rc
        from swirl.hash.grain import poseidon2_round_constants

        init, internal, final = poseidon2_round_constants(P, 31, 16, 8, 13)
        assert init == [list(map(int, r)) for r in rc.EXTERNAL_INITIAL]
        assert internal == list(rc.INTERNAL)
        assert final == [list(map(int, r)) for r in rc.EXTERNAL_FINAL]

    def test_hash_slice_and_rows(self):
        rng = np.random.default_rng(1)
        for w in [1, 7, 8, 9, 16, 20]:
            mat = rng.integers(0, P, (4, w), dtype=np.uint64)
            rows = p2.hash_rows_np(mat)
            for i in range(4):
                assert np.all(rows[i] == p2.hash_slice_np(mat[i]))

    def test_compress(self):
        rng = np.random.default_rng(2)
        l = rng.integers(0, P, 8, dtype=np.uint64)
        r = rng.integers(0, P, 8, dtype=np.uint64)
        d = p2.compress_np(l, r)
        assert d.shape == (8,)
        pairs = np.stack([np.stack([l, r])])
        assert np.all(p2.compress_rows_np(pairs)[0] == d)

    def test_device_matches_host(self):
        import tests.conftest  # noqa: F401
        from swirl.fields import jfield as jf
        from swirl.hash import jposeidon2 as jp2

        rng = np.random.default_rng(3)
        states = rng.integers(0, P, (6, 16), dtype=np.uint64)
        dev = jf.to_host(jp2.permute(jf.const_arr(states)))
        host = p2.permute_np(states)
        assert np.all(dev == host)

        for w in [1, 8, 11]:
            mat = rng.integers(0, P, (5, w), dtype=np.uint64)
            dev_rows = jf.to_host(jp2.hash_rows(jf.const_arr(mat)))
            assert np.all(dev_rows == p2.hash_rows_np(mat))

        l = rng.integers(0, P, (3, 8), dtype=np.uint64)
        r = rng.integers(0, P, (3, 8), dtype=np.uint64)
        dev_c = jf.to_host(jp2.compress_pairs(jf.const_arr(l), jf.const_arr(r)))
        host_c = p2.compress_rows_np(np.stack([l, r], axis=1))
        assert np.all(dev_c == host_c)


class TestTranscript:
    def test_deterministic(self):
        t1, t2 = Transcript(), Transcript()
        for t in (t1, t2):
            t.observe(5)
            t.observe(7)
        assert t1.sample() == t2.sample()

    def test_duplex_semantics(self):
        # sampling twice without observing must not permute in between
        t = Transcript()
        t.observe(1)
        a = t.sample()
        b = t.sample()
        assert a != b  # drawn from different lanes (w.h.p.)
        # observing then sampling permutes
        t2 = Transcript()
        t2.observe(1)
        _ = t2.sample()
        t2.observe(2)
        c = t2.sample()
        assert isinstance(c, int)

    def test_sample_consumes_rate_then_permutes(self):
        t = Transcript()
        t.observe(1)
        vals = [t.sample() for _ in range(9)]
        assert len(set(vals)) >= 8  # 8 lanes + 1 after re-permute

    def test_sample_ext_order(self):
        t1, t2 = Transcript(), Transcript()
        t1.observe(3)
        t2.observe(3)
        e = t1.sample_ext()
        singles = [t2.sample() for _ in range(4)]
        assert [int(x) for x in e] == singles

    def test_observe_ext_matches_slice(self):
        t1, t2 = Transcript(), Transcript()
        vals = [1, 2, 3, 4]
        t1.observe_ext(np.array(vals, dtype=np.uint64))
        for v in vals:
            t2.observe(v)
        assert t1.sample() == t2.sample()

    def test_grind_and_check(self):
        t = Transcript()
        t.observe(42)
        checker = t.clone()
        w = t.grind(bits=6)
        assert checker.check_witness(6, w)
        # transcripts advanced identically
        assert t.sample() == checker.sample()

    def test_grind_zero_bits(self):
        t = Transcript()
        assert t.grind(0) == 0

    def test_sample_bits(self):
        t = Transcript()
        t.observe(9)
        b = t.sample_bits(10)
        assert 0 <= b < 1024


class TestTranscriptValidator:
    def test_replay_matches(self):
        from swirl.transcript import Transcript, TranscriptValidator

        rec = Transcript(record=True)
        rec.observe(5)
        rec.observe_slice([1, 2, 3])
        s1 = rec.sample()
        rec.observe(9)
        s2 = rec.sample_ext()

        val = TranscriptValidator(rec.log)
        val.observe(5)
        val.observe_slice([1, 2, 3])
        assert val.sample() == s1
        val.observe(9)
        assert val.sample_ext().tolist() == list(s2)
        val.finish()

    def test_divergence_detected(self):
        import pytest
        from swirl.transcript import (
            Transcript,
            TranscriptDivergence,
            TranscriptValidator,
        )

        rec = Transcript(record=True)
        rec.observe(5)
        rec.sample()

        val = TranscriptValidator(rec.log)
        with pytest.raises(TranscriptDivergence):
            val.observe(6)

        val2 = TranscriptValidator(rec.log)
        val2.observe(5)
        with pytest.raises(TranscriptDivergence):
            val2.finish()

    def test_prover_verifier_event_stream_identical(self, recorded_fib_setup):
        """Record the prover's transcript, replay the verifier against it
        event-by-event (the reference's recorder/validator QA harness)."""
        from swirl.transcript import TranscriptValidator

        eng, vk, _, _, proof, log = recorded_fib_setup
        val = TranscriptValidator(log)
        eng.verify(vk, proof, transcript=val)
        val.finish()


class TestMerkleCompressionSemantics:
    """The 2-to-1 Merkle compression is ONE truncated permutation
    (compress_np), not a sponge absorb — the Pallas and fallback paths must
    both implement it (regression: the Pallas path once aliased the
    sponge, diverging for layers >= 1024 digests)."""

    def test_compress_cols_matches_compress_np(self):
        import os

        import jax.numpy as jnp

        from swirl.fields import jfield as jf
        from swirl.fields.babybear import P
        from swirl.hash import jposeidon2 as jp2
        from swirl.hash.poseidon2 import compress_np

        rng = np.random.default_rng(9)
        prev = os.environ.get("SWIRL_PALLAS")
        # 1024 crosses the layers->=1024 regression threshold; 2048 adds
        # only interpret-mode runtime (was 76 s of the default tier)
        for mode, sizes in (("interpret", (1024,)), (None, (64, 256))):
            if mode:
                os.environ["SWIRL_PALLAS"] = mode
            elif "SWIRL_PALLAS" in os.environ:
                del os.environ["SWIRL_PALLAS"]
            try:
                for n in sizes:
                    p_h = rng.integers(0, P, (16, n), dtype=np.uint64)
                    got = jf.to_host(
                        jp2.compress_cols(jnp.asarray(jf.const_arr(p_h)))
                    )
                    exp = compress_np(p_h[:8].T, p_h[8:].T).T
                    assert np.array_equal(got, exp), (mode, n)
            finally:
                if prev is None:
                    os.environ.pop("SWIRL_PALLAS", None)
                else:
                    os.environ["SWIRL_PALLAS"] = prev

    def test_merkle_tree_matches_host_oracle(self):
        import os

        import jax.numpy as jnp

        from swirl.fields import jfield as jf
        from swirl.fields.babybear import P
        from swirl.hash.poseidon2 import compress_np, hash_rows_np
        from swirl.prover.merkle import build_merkle_tree

        rng = np.random.default_rng(10)
        # 256 leaves cover both the strided-pair levels and the plain tower
        # (2048 added ~1 min of interpret-mode Pallas time for no coverage)
        w, n, rpq = 2, 256, 16
        m_h = rng.integers(0, P, (w, n), dtype=np.uint64)
        prev = os.environ.get("SWIRL_PALLAS")
        os.environ["SWIRL_PALLAS"] = "interpret"
        try:
            tree = build_merkle_tree(jnp.asarray(jf.const_arr(m_h)), rpq)
        finally:
            if prev is None:
                os.environ.pop("SWIRL_PALLAS", None)
            else:
                os.environ["SWIRL_PALLAS"] = prev
        digs = hash_rows_np(m_h.T).T
        qs = n // rpq
        cur, size = digs, n
        while size > qs:
            half = size // 2
            g = cur.reshape(8, half // qs, 2, qs)
            cur = compress_np(
                g[:, :, 0].reshape(8, half).T, g[:, :, 1].reshape(8, half).T
            ).T
            size = half
        exp_layers = [cur]
        while exp_layers[-1].shape[1] > 1:
            prevl = exp_layers[-1]
            exp_layers.append(
                compress_np(prevl[:, 0::2].T, prevl[:, 1::2].T).T
            )
        assert len(tree.layers) == len(exp_layers)
        for a, b in zip(tree.layers, exp_layers):
            assert np.array_equal(jf.to_host(a), b)
