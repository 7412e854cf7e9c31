"""Native C++ host kernels: bit-exactness against the numpy spec."""

import numpy as np
import pytest

from swirl import native
from swirl.fields.babybear import P
from swirl.hash.poseidon2 import _permute_np_py, compress_np
from swirl.transcript import Transcript

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_permute_matches_numpy():
    rng = np.random.default_rng(0)
    s = rng.integers(0, P, (17, 16), dtype=np.uint64)
    assert np.array_equal(native.permute_batch(s), _permute_np_py(s))


def test_hash_rows_matches_numpy():
    rng = np.random.default_rng(1)
    for w in (0, 3, 8, 11, 64):
        m = rng.integers(0, P, (9, w), dtype=np.uint64)
        # numpy spec path
        from swirl.hash.poseidon2 import WIDTH, RATE, DIGEST

        n = m.shape[0]
        state = np.zeros((n, WIDTH), dtype=np.uint64)
        # p3 PaddingFreeSponge: empty input hashes to the zero digest with
        # NO permutation (hasher.rs/PaddingFreeSponge semantics).
        for i in range(0, w, RATE):
            chunk = m[:, i : i + RATE]
            state[:, : chunk.shape[1]] = chunk
            state = _permute_np_py(state)
        assert np.array_equal(native.hash_rows(m), state[:, :DIGEST]), w


def test_grind_matches_python_reference():
    for bits in (1, 6, 12):
        t = Transcript()
        t.observe(42)
        w = native.grind(t.state, t.absorb_idx, t.sample_idx, bits)
        assert w >= 0
        assert t.check_witness(bits, w)
        # minimality: no smaller witness passes
        for cand in range(min(w, 50)):
            t2 = Transcript()
            t2.observe(42)
            assert not t2.check_witness(bits, cand)


def test_transcript_grind_uses_native_and_verifies():
    t = Transcript()
    t.observe(7)
    w = t.grind(10)
    t2 = Transcript()
    t2.observe(7)
    assert t2.check_witness(10, w)
