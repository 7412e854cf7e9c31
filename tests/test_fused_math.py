"""Traced twins (fields.text / swirl.tpoly / DeviceTranscript) must agree
bit-for-bit with their host-mode counterparts."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swirl.fields import ext as hext
from swirl.fields import text
from swirl.fields import jfield as jf
from swirl.fields.babybear import P, U64
from swirl import poly as hpoly
from swirl import tpoly

rng = np.random.default_rng(42)


def rand_ef(shape=()):
    return rng.integers(0, P, shape + (4,), dtype=np.uint64)


def m(v):  # host canonical -> device monty
    return jf.const_arr(v)


def h(x):  # device monty -> host canonical
    return jf.ext_to_host(x)


class TestTextTwin:
    def test_ring_ops(self):
        a, b = rand_ef(), rand_ef()
        assert np.array_equal(h(text.eadd(m(a), m(b))), hext.eadd(a, b))
        assert np.array_equal(h(text.esub(m(a), m(b))), hext.esub(a, b))
        assert np.array_equal(h(text.emul(m(a), m(b))), hext.emul(a, b))
        assert np.array_equal(h(text.eneg(m(a))), hext.eneg(a))

    def test_scale_pow_powers(self):
        a = rand_ef()
        assert np.array_equal(h(text.escale(m(a), 12345)), hext.escale(a, 12345))
        assert np.array_equal(h(text.epow(m(a), 77)), hext.epow(a, 77))
        assert np.array_equal(h(text.epowers(m(a), 5)), hext.epowers(a, 5))
        assert np.array_equal(h(text.epowers(m(a), 40)), hext.epowers(a, 40))

    def test_inv(self):
        a = rand_ef()
        got = h(text.einv(m(a)))
        assert np.array_equal(got, hext.einv(a))

    def test_batch_inv(self):
        a = rand_ef((7,))
        got = h(text.batch_einv(m(a)))
        exp = np.stack([hext.einv(a[i]) for i in range(7)])
        assert np.array_equal(got, exp)

    def test_from_base(self):
        assert np.array_equal(h(np.asarray(text.from_base(9))), hext.from_base(9))
        base = rng.integers(0, P)
        traced = text.from_base(jf.const_arr(np.uint64(base)))
        assert np.array_equal(h(traced), hext.from_base(int(base)))


class TestTpolyTwin:
    def test_eq_kernels(self):
        x, y = rand_ef((3,)), rand_ef((3,))
        assert np.array_equal(
            h(tpoly.eval_eq_mle(m(x), m(y))), hpoly.eval_eq_mle(x, y)
        )
        assert np.array_equal(
            h(tpoly.evals_eq_hypercube(m(x))), hpoly.evals_eq_hypercube(x)
        )

    def test_uni_kernels(self):
        x, y = rand_ef(), rand_ef()
        for l in (2, 4):
            assert np.array_equal(
                h(tpoly.eval_eq_uni(l, m(x), m(y))), hpoly.eval_eq_uni(l, x, y)
            )
            assert np.array_equal(
                h(tpoly.eval_eq_uni_at_one(l, m(x))),
                hpoly.eval_eq_uni_at_one(l, x),
            )
        assert np.array_equal(
            h(tpoly.eval_in_uni(3, -2, m(x))), hpoly.eval_in_uni(3, -2, x)
        )
        xi = rand_ef((2,))
        assert np.array_equal(
            h(tpoly.eval_eq_sharp_uni(2, m(xi), m(x))),
            hpoly.eval_eq_sharp_uni(2, xi, x),
        )

    def test_uni_polys(self):
        x = rand_ef()
        assert np.array_equal(h(tpoly.eq_uni_poly(3, m(x))), hpoly.eq_uni_poly(3, x))
        xi = rand_ef((3,))
        assert np.array_equal(
            h(tpoly.eq_sharp_uni_poly(m(xi))), hpoly.eq_sharp_uni_poly(xi)
        )

    def test_horner_lagrange_dft(self):
        coeffs = rand_ef((6,))
        x = rand_ef()
        assert np.array_equal(
            h(tpoly.horner_eval(m(coeffs), m(x))), hpoly.horner_eval(coeffs, x)
        )
        pts = [0, 1, 2, 3, 5]
        evals = rand_ef((5,))
        assert np.array_equal(
            h(tpoly.lagrange_coeffs(pts, m(evals))),
            hpoly.lagrange_coeffs(pts, evals),
        )
        c8 = rand_ef((8,))
        assert np.array_equal(h(tpoly.dft_ef(m(c8))), hpoly.dft_ef(c8))
        assert np.array_equal(h(tpoly.idft_ef(m(c8))), hpoly.idft_ef(c8))

    def test_geometric_cosets(self):
        from swirl.fields.babybear import GENERATOR

        evals = rand_ef((4, 3))
        assert np.array_equal(
            h(tpoly.from_geometric_cosets_evals(m(evals), GENERATOR, GENERATOR)),
            hpoly.from_geometric_cosets_evals(evals, GENERATOR, GENERATOR),
        )


class TestDeviceTranscript:
    def test_lockstep_with_host(self):
        from swirl.transcript import Transcript
        from swirl.prover.device_transcript import DeviceTranscript

        ht = Transcript()
        dt = DeviceTranscript()
        ht.observe(7)
        dt.observe(7)
        for v in ([1, 2, 3, 4, 5, 6, 7, 8, 9],):
            ht.observe_slice(v)
            dt.observe_slice(v)
        assert int(jf.to_host(dt.sample())) == ht.sample()
        e_h = ht.sample_ext()
        e_d = h(dt.sample_ext())
        assert np.array_equal(e_d, e_h)
        ef = rand_ef()
        ht.observe_ext(ef)
        dt.observe_ext(m(ef))
        assert ht.sample_bits(7) == int(np.asarray(dt.sample_bits(7)))
        dig = rng.integers(0, P, 8, dtype=np.uint64)
        ht.observe_commit(dig)
        dt.observe_commit(m(dig))  # traced path (monty array)
        assert int(jf.to_host(dt.sample())) == ht.sample()

    def test_grind_matches_host(self):
        from swirl.transcript import Transcript
        from swirl.prover.device_transcript import DeviceTranscript

        ht = Transcript()
        dt = DeviceTranscript()
        ht.observe(1234)
        dt.observe(1234)
        w_h = ht.grind(5)
        w_d = int(np.asarray(dt.grind(5)))
        assert w_h == w_d
        assert int(jf.to_host(dt.sample())) == ht.sample()

    def test_sample_bits_batch_matches_sequential(self):
        """One jitted sample_bits_batch == n sequential sample_bits: same
        values, same exit cursor, same downstream samples — across batch
        sizes that cross permute boundaries and both entry cursors."""
        from swirl.prover.device_transcript import DeviceTranscript

        for prefix_felts, n in [(1, 3), (9, 8), (2, 21), (8, 1)]:
            a = DeviceTranscript()
            b = DeviceTranscript()
            for t in (a, b):
                t.observe_slice(list(range(1, prefix_felts + 1)))
            seq = [int(np.asarray(a.sample_bits(11))) for _ in range(n)]
            bat = [int(x) for x in np.asarray(b.sample_bits_batch(11, n))]
            assert seq == bat
            assert (a.absorb_idx, a.sample_idx) == (b.absorb_idx, b.sample_idx)
            assert int(jf.to_host(a.sample())) == int(jf.to_host(b.sample()))

    def test_works_under_jit(self):
        import jax
        from swirl.prover.device_transcript import DeviceTranscript

        def run(x):
            t = DeviceTranscript()
            t.observe(5)
            t.observe_ext(x)
            w = t.grind(3)
            return t.sample_ext(), w

        jitted = jax.jit(run)
        ef = rand_ef()
        s_j, w_j = jitted(m(ef))
        s_e, w_e = run(m(ef))
        assert np.array_equal(np.asarray(s_j), np.asarray(s_e))
        assert int(w_j) == int(w_e)
