import numpy as np
import pytest

from swirl.fields import babybear as bb
from swirl.fields import ext


def ref_mul(a, b):
    return (a * b) % bb.P


class TestHostField:
    def test_basic_ops(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, bb.P, 100, dtype=np.uint64)
        b = rng.integers(0, bb.P, 100, dtype=np.uint64)
        assert np.all(bb.fadd(a, b) == (a + b) % bb.P)
        assert np.all(bb.fsub(a, b) == (a + bb.P - b) % bb.P)
        assert np.all(bb.fmul(a, b) == (a * b) % bb.P)

    def test_inverse(self):
        rng = np.random.default_rng(1)
        a = rng.integers(1, bb.P, 50, dtype=np.uint64)
        inv = bb.finv(a)
        assert np.all(bb.fmul(a, inv) == 1)
        assert bb.fmul(bb.finv(7), 7) == 1

    def test_batch_inverse(self):
        rng = np.random.default_rng(2)
        a = rng.integers(1, bb.P, 33, dtype=np.uint64)
        inv = bb.batch_inverse(a)
        assert np.all(bb.fmul(a, inv) == 1)

    def test_two_adic_generator(self):
        for bits in [0, 1, 2, 5, 27]:
            g = bb.two_adic_generator(bits)
            assert pow(g, 1 << bits, bb.P) == 1
            if bits > 0:
                assert pow(g, 1 << (bits - 1), bb.P) != 1
        assert bb.two_adic_generator(0) == 1
        assert bb.two_adic_generator(1) == bb.P - 1

    def test_roots_of_unity(self):
        r = bb.roots_of_unity(3)
        w = bb.two_adic_generator(3)
        assert r[0] == 1
        for i in range(8):
            assert int(r[i]) == pow(w, i, bb.P)


class TestExtField:
    def test_mul_matches_naive(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            a = rng.integers(0, bb.P, 4, dtype=np.uint64)
            b = rng.integers(0, bb.P, 4, dtype=np.uint64)
            c = ext.emul(a, b)
            # naive polynomial mult mod (x^4 - W)
            full = [0] * 7
            for i in range(4):
                for j in range(4):
                    full[i + j] = (full[i + j] + int(a[i]) * int(b[j])) % bb.P
            expect = [
                (full[k] + bb.EXT_W * full[k + 4]) % bb.P if k < 3 else full[k]
                for k in range(4)
            ]
            assert [int(x) for x in c] == expect

    def test_inverse(self):
        rng = np.random.default_rng(4)
        for _ in range(5):
            a = rng.integers(0, bb.P, 4, dtype=np.uint64)
            if ext.is_zero(a):
                continue
            inv = ext.einv(a)
            assert ext.eeq(ext.emul(a, inv), ext.eone())

    def test_batched_shapes(self):
        rng = np.random.default_rng(5)
        a = rng.integers(0, bb.P, (7, 4), dtype=np.uint64)
        b = rng.integers(0, bb.P, (7, 4), dtype=np.uint64)
        c = ext.emul(a, b)
        assert c.shape == (7, 4)
        for i in range(7):
            assert ext.eeq(c[i], ext.emul(a[i], b[i]))

    def test_w_is_nonresidue(self):
        # x^4 - 11 must be irreducible: 11 should not be a 4th power... check
        # at least that 11^((p-1)/2) != 1 or 11^((p-1)/4)... quick sanity:
        # the extension inverse test above would fail if reducible for random
        # elements; here just check frobenius consistency a^(p^4) == a.
        rng = np.random.default_rng(6)
        a = rng.integers(0, bb.P, 4, dtype=np.uint64)
        assert ext.eeq(ext.epow(a, bb.P**4), a)


class TestDeviceField:
    def setup_method(self):
        from swirl.fields import jfield as jf

        self.jf = jf

    def test_roundtrip(self):
        jf = self.jf
        rng = np.random.default_rng(7)
        a = rng.integers(0, bb.P, 100, dtype=np.uint64)
        x = jf.const_arr(a)
        back = jf.to_host(x)
        assert np.all(back == a)

    def test_mul_add_sub(self):
        jf = self.jf
        rng = np.random.default_rng(8)
        a = rng.integers(0, bb.P, 256, dtype=np.uint64)
        b = rng.integers(0, bb.P, 256, dtype=np.uint64)
        xa, xb = jf.const_arr(a), jf.const_arr(b)
        assert np.all(jf.to_host(jf.mul(xa, xb)) == (a * b) % bb.P)
        assert np.all(jf.to_host(jf.add(xa, xb)) == (a + b) % bb.P)
        assert np.all(jf.to_host(jf.sub(xa, xb)) == (a + bb.P - b) % bb.P)
        assert np.all(jf.to_host(jf.neg(xa)) == (bb.P - a) % bb.P)

    def test_inv(self):
        jf = self.jf
        rng = np.random.default_rng(9)
        a = rng.integers(1, bb.P, 64, dtype=np.uint64)
        xa = jf.const_arr(a)
        assert np.all(jf.to_host(jf.mul(xa, jf.inv(xa))) == 1)

    def test_ext_mul_matches_host(self):
        jf = self.jf
        rng = np.random.default_rng(10)
        a = rng.integers(0, bb.P, (32, 4), dtype=np.uint64)
        b = rng.integers(0, bb.P, (32, 4), dtype=np.uint64)
        c = jf.ext_to_host(jf.ext_mul(jf.const_arr(a), jf.const_arr(b)))
        expect = ext.emul(a, b)
        assert np.all(c == expect)

    def test_ext_sum(self):
        jf = self.jf
        rng = np.random.default_rng(11)
        a = rng.integers(0, bb.P, (37, 4), dtype=np.uint64)
        s = jf.ext_to_host(jf.ext_sum(jf.const_arr(a), axis=0))
        assert np.all(s == ext.esum(a, axis=0))

    def test_edge_values(self):
        jf = self.jf
        edge = np.array([0, 1, 2, bb.P - 1, bb.P - 2, (bb.P - 1) // 2], dtype=np.uint64)
        a = np.repeat(edge, len(edge))
        b = np.tile(edge, len(edge))
        xa, xb = jf.const_arr(a), jf.const_arr(b)
        assert np.all(jf.to_host(jf.mul(xa, xb)) == (a * b) % bb.P)
        assert np.all(jf.to_host(jf.add(xa, xb)) == (a + b) % bb.P)
