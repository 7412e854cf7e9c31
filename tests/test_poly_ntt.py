import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swirl.fields import babybear as bb, ext
from swirl.fields import jfield as jf
from swirl import poly
from swirl.prover import ntt as jntt
from swirl.prover.stacked_pcs import StackedLayout, stack_traces


def naive_dft(coeffs):
    n = len(coeffs)
    w = bb.two_adic_generator(n.bit_length() - 1)
    return np.array(
        [
            sum(int(c) * pow(w, i * j, bb.P) for j, c in enumerate(coeffs)) % bb.P
            for i in range(n)
        ],
        dtype=np.uint64,
    )


class TestDeviceNtt:
    def test_ntt_matches_naive(self):
        rng = np.random.default_rng(0)
        for log_n in [0, 1, 3, 5]:
            n = 1 << log_n
            coeffs = rng.integers(0, bb.P, n, dtype=np.uint64)
            out = jf.to_host(jntt.ntt(jf.const_arr(coeffs)))
            assert np.all(out == naive_dft(coeffs)), log_n

    def test_intt_roundtrip(self):
        rng = np.random.default_rng(1)
        coeffs = rng.integers(0, bb.P, (3, 16), dtype=np.uint64)
        x = jf.const_arr(coeffs)
        assert np.all(jf.to_host(jntt.intt(jntt.ntt(x))) == coeffs)

    def test_coset_ntt(self):
        rng = np.random.default_rng(2)
        n = 8
        coeffs = rng.integers(0, bb.P, n, dtype=np.uint64)
        shift = bb.GENERATOR
        out = jf.to_host(jntt.coset_ntt(jf.const_arr(coeffs), shift))
        w = bb.two_adic_generator(3)
        for i in range(n):
            x = shift * pow(w, i, bb.P) % bb.P
            expect = sum(int(c) * pow(x, j, bb.P) for j, c in enumerate(coeffs)) % bb.P
            assert int(out[i]) == expect

    def test_ext_ntt(self):
        rng = np.random.default_rng(3)
        coeffs = rng.integers(0, bb.P, (8, 4), dtype=np.uint64)
        x = jf.const_arr(coeffs)
        y = jntt.intt(jntt.ntt(x, ext=True), ext=True)
        assert np.all(jf.to_host(y) == coeffs)

    def test_zeta_mobius_roundtrip(self):
        rng = np.random.default_rng(4)
        a = rng.integers(0, bb.P, (2, 16), dtype=np.uint64)
        x = jf.const_arr(a)
        z = jntt.zeta_transform(x, 4)
        back = jntt.mobius_transform(z, 4)
        assert np.all(jf.to_host(back) == a)

    def test_pallas_four_step_matches_xla(self):
        """Interpret-mode four-step Stockham kernel vs the XLA butterfly path
        (the Pallas kernel only engages at log N >= 16, so this drives it
        directly with a lowered MIN via monkeypatch-free direct call)."""
        import os

        from swirl.tpu import ntt_pallas

        rng = np.random.default_rng(7)
        prev = os.environ.get("SWIRL_PALLAS")
        os.environ["SWIRL_PALLAS"] = "interpret"
        try:
            x = rng.integers(0, bb.P, (2, 1 << 16), dtype=np.uint64)
            xm = jf.const_arr(x)
            got = jf.to_host(ntt_pallas.ntt(xm))
            goti = jf.to_host(ntt_pallas.ntt(xm, inverse=True))
        finally:
            if prev is None:
                os.environ.pop("SWIRL_PALLAS")
            else:
                os.environ["SWIRL_PALLAS"] = prev
        ref = jf.to_host(jntt.ntt(jf.const_arr(x)))
        refi = jf.to_host(jntt.ntt(jf.const_arr(x), inverse=True))
        assert np.array_equal(ref, got)
        assert np.array_equal(refi, goti)

    def test_zeta_is_mle_coeffs_to_evals(self):
        # zeta(a)[mask] = sum_{S subset mask} a[S] = MLE with coeffs a
        # evaluated at the boolean point bits(mask)
        rng = np.random.default_rng(5)
        n = 3
        a = rng.integers(0, bb.P, 1 << n, dtype=np.uint64)
        z = jf.to_host(jntt.zeta_transform(jf.const_arr(a), n))
        for mask in range(1 << n):
            expect = (
                sum(int(a[s]) for s in range(1 << n) if (s & mask) == s) % bb.P
            )
            assert int(z[mask]) == expect


class TestEqKernels:
    def test_eq_hypercube_table(self):
        rng = np.random.default_rng(6)
        x = rng.integers(0, bb.P, (3, 4), dtype=np.uint64)
        tab = poly.evals_eq_hypercube(x)
        for mask in range(8):
            y = np.stack(
                [ext.from_base((mask >> i) & 1) for i in range(3)]
            )
            assert ext.eeq(tab[mask], poly.eval_eq_mle(x, y))

    def test_eq_uni_is_lagrange_delta(self):
        l = 3
        roots = bb.roots_of_unity(l)
        for i in range(8):
            for j in range(8):
                v = poly.eval_eq_uni(
                    l, ext.from_base(int(roots[i])), ext.from_base(int(roots[j]))
                )
                expect = ext.eone() if i == j else ext.ezero()
                assert ext.eeq(v, expect), (i, j)

    def test_eq_uni_poly_consistency(self):
        rng = np.random.default_rng(7)
        l = 3
        x = rng.integers(0, bb.P, 4, dtype=np.uint64)
        y = rng.integers(0, bb.P, 4, dtype=np.uint64)
        coeffs = poly.eq_uni_poly(l, x)
        assert ext.eeq(poly.horner_eval(coeffs, y), poly.eval_eq_uni(l, x, y))

    def test_eq_sharp_consistency(self):
        rng = np.random.default_rng(8)
        l = 2
        xi = rng.integers(0, bb.P, (l, 4), dtype=np.uint64)
        z = rng.integers(0, bb.P, 4, dtype=np.uint64)
        coeffs = poly.eq_sharp_uni_poly(xi)
        direct = poly.eval_eq_sharp_uni(l, xi, z)
        assert ext.eeq(poly.horner_eval(coeffs, z), direct)

    def test_rot_kernel_prism_delta(self):
        l, n = 2, 2
        roots = bb.roots_of_unity(l)
        H = 1 << (l + n)

        def point(row):
            z = ext.from_base(int(roots[row % (1 << l)]))
            xs = [ext.from_base((row >> (l + i)) & 1) for i in range(n)]
            return np.stack([z] + xs)

        for i in range(H):
            for j in [i, (i + 1) % H, (i + 2) % H]:
                # kernel(x=point(i), y=point(j)) == 1 iff i == j + 1 mod H
                v = poly.eval_rot_kernel_prism(l, point(i), point(j))
                expect = ext.eone() if (j + 1) % H == i else ext.ezero()
                assert ext.eeq(v, expect), (i, j)

    def test_mobius_decoder_identity(self):
        # hatF evals dot mobius_eq(u) == MLE with coeff table a at point u
        rng = np.random.default_rng(9)
        m = 4
        a = rng.integers(0, bb.P, 1 << m, dtype=np.uint64)
        rs_coeffs = jf.to_host(jntt.zeta_transform(jf.const_arr(a), m))
        hatf_evals = jf.to_host(jntt.zeta_transform(jf.const_arr(rs_coeffs), m))
        u = rng.integers(0, bb.P, (m, 4), dtype=np.uint64)
        mob = poly.evals_mobius_eq_hypercube(u)
        lhs = ext.esum(ext.emul(ext.from_base(hatf_evals), mob), axis=0)
        rhs = ext.ezero()
        for mask in range(1 << m):
            term = ext.from_base(int(a[mask]))
            for i in range(m):
                if (mask >> i) & 1:
                    term = ext.emul(term, u[i])
            rhs = ext.eadd(rhs, term)
        assert ext.eeq(lhs, rhs)

    def test_interpolators(self):
        rng = np.random.default_rng(10)
        cs = [rng.integers(0, bb.P, 4, dtype=np.uint64) for _ in range(4)]
        x = rng.integers(0, bb.P, 4, dtype=np.uint64)

        def f(pt, deg):
            acc = ext.ezero()
            for i in range(deg + 1):
                acc = ext.eadd(acc, ext.emul(cs[i], ext.epow(pt, i)))
            return acc

        ev2 = [f(ext.from_base(i), 1) for i in range(2)]
        assert ext.eeq(poly.interpolate_linear_at_01(ev2, x), f(x, 1))
        ev3 = [f(ext.from_base(i), 2) for i in range(3)]
        assert ext.eeq(poly.interpolate_quadratic_at_012(ev3, x), f(x, 2))
        ev4 = [f(ext.from_base(i), 3) for i in range(4)]
        assert ext.eeq(poly.interpolate_cubic_at_0123(ev4, x), f(x, 3))
        evs = np.stack([f(ext.from_base(i), 3) for i in range(4)])
        assert ext.eeq(poly.lagrange_interpolate_at_integers(evs, x), f(x, 3))

    def test_dft_ef_roundtrip(self):
        rng = np.random.default_rng(11)
        coeffs = rng.integers(0, bb.P, (8, 4), dtype=np.uint64)
        assert np.all(poly.idft_ef(poly.dft_ef(coeffs)) == coeffs)

    def test_geometric_cosets_interpolation(self):
        rng = np.random.default_rng(12)
        height, width = 8, 3
        coeffs = rng.integers(0, bb.P, (height * width, 4), dtype=np.uint64)
        shift = bb.GENERATOR
        init = bb.GENERATOR
        w = bb.two_adic_generator(3)
        evals = np.zeros((height, width, 4), dtype=np.uint64)
        for r in range(height):
            for c in range(width):
                pt = ext.from_base(
                    init * pow(shift, c, bb.P) % bb.P * pow(w, r, bb.P) % bb.P
                )
                evals[r, c] = poly.horner_eval(coeffs, pt)
        rec = poly.from_geometric_cosets_evals(evals, shift, init)
        assert np.all(rec == coeffs)


class TestStacking:
    def _traces(self, cols):
        # each col list -> (1, h) device matrix
        return [jf.const_arr(np.array([c], dtype=np.uint64)) for c in cols]

    def test_stacked_no_stride(self):
        traces = self._traces([[1, 2, 3, 4], [5, 6], [7]])
        stacked, layout = stack_traces(0, 2, traces)
        host = jf.to_host(stacked)
        assert host.shape == (2, 4)
        assert list(host[0]) == [1, 2, 3, 4]
        assert list(host[1]) == [5, 6, 7, 0]
        assert layout.mat_starts == [0, 1, 2]

    def test_stacked_strided(self):
        traces = self._traces([[1, 2, 3, 4], [5, 6], [7]])
        stacked, _ = stack_traces(2, 0, traces)
        host = jf.to_host(stacked)
        assert host.shape == (3, 4)
        assert list(host[0]) == [1, 2, 3, 4]
        assert list(host[1]) == [5, 0, 6, 0]
        assert list(host[2]) == [7, 0, 0, 0]

    def test_stacked_strided_deeper(self):
        traces = self._traces([[1, 2, 3, 4], [5, 6], [7]])
        stacked, _ = stack_traces(3, 0, traces)
        host = jf.to_host(stacked)
        assert host.shape == (3, 8)
        assert list(host[0]) == [1, 0, 2, 0, 3, 0, 4, 0]
        assert list(host[1]) == [5, 0, 0, 0, 6, 0, 0, 0]
        assert list(host[2]) == [7, 0, 0, 0, 0, 0, 0, 0]

    def test_stacked_matches_index_oracle(self):
        """The reshape/concat stacking must equal a per-slice index-map
        placement (the reference's column-copy semantics,
        stacked_pcs.rs:294) on layouts with striding and multi-matrix
        wrapping."""
        import jax.numpy as jnp

        rng = np.random.default_rng(7)

        def oracle(l_skip, n_stack, traces):
            dims = [
                (t.shape[0], int(t.shape[1]).bit_length() - 1) for t in traces
            ]
            layout = StackedLayout.new(l_skip, l_skip + n_stack, dims)
            out = np.zeros((layout.width, layout.height), np.uint32)
            for mat_idx, j, s in layout.sorted_cols:
                h_t = 1 << s.log_height
                stride = s.stride(l_skip)
                out[s.col_idx, s.row_idx + stride * np.arange(h_t)] = traces[
                    mat_idx
                ][j]
            return out

        cases = [
            (2, 4, [(3, 6), (2, 4), (5, 2), (4, 1), (2, 0)]),
            (4, 5, [(7, 9), (1, 6), (3, 4), (2, 2)]),
            (2, 3, [(4, 5)]),
            (3, 6, [(2, 9), (2, 9), (1, 3)]),
        ]
        for l_skip, n_stack, dims in cases:
            traces = [
                rng.integers(0, 2**31, (w, 1 << lh), dtype=np.uint32)
                for w, lh in dims
            ]
            got, _ = stack_traces(
                l_skip, n_stack, [jnp.asarray(t) for t in traces]
            )
            assert np.array_equal(
                np.asarray(got), oracle(l_skip, n_stack, traces)
            ), (l_skip, n_stack, dims)
