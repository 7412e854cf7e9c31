"""Standalone WHIR PCS-level tests: commit random stacked matrices, open at
a random prism point, verify — no AIR/engine involved (peer of the
reference backend-tests WHIR section, lib.rs:1191-1414)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax.numpy as jnp

from swirl.fields import ext as hext
from swirl.fields import jfield as jf
from swirl.fields.babybear import P, two_adic_generator
from swirl.params import test_system_params_small as small_params
from swirl.prover.stacked_pcs import stacked_commit
from swirl.prover.sumcheck import (
    barycentric_weights_host,
    fold_mle,
    fold_ple,
)
from swirl.prover.whir import prove_whir_opening
from swirl.transcript import Transcript
from swirl.verifier.whir import WhirError, binary_k_fold, verify_whir

rng = np.random.default_rng(77)


def _commit_random(params, widths):
    datas = []
    roots = []
    h = 1 << params.log_stacked_height
    for w in widths:
        trace = jnp.asarray(
            jf.const_arr(rng.integers(0, P, (w, h), dtype=np.uint64))
        )
        root, data = stacked_commit(
            params.l_skip, params.n_stack, params.log_blowup, params.k_whir, [trace]
        )
        roots.append(root)
        datas.append(data)
    return roots, datas


def _openings_at(params, data, u):
    """PLE evaluations of every stacked column at the prism point u."""
    weights = jnp.asarray(
        jf.const_arr(barycentric_weights_host(params.l_skip, u[0]))
    )
    q = fold_ple(data.get_matrix(), params.l_skip, False, weights)
    for ui in u[1:]:
        q = fold_mle(q, jnp.asarray(jf.const_arr(ui)))
    host = jf.ext_to_host(q[:, 0])
    return [host[c] for c in range(host.shape[0])]


def _u_cube(params, u):
    out = []
    cur = u[0]
    for _ in range(params.l_skip):
        out.append(cur)
        cur = hext.emul(cur, cur)
    out.extend(u[1:])
    return out


def _roundtrip(params, widths, tamper=None):
    roots, datas = _commit_random(params, widths)
    n_vars = 1 + params.n_stack
    u = [rng.integers(0, P, 4, dtype=np.uint64) for _ in range(n_vars)]
    openings = [_openings_at(params, d, u) for d in datas]
    u_cube = _u_cube(params, u)

    t_prove = Transcript()
    proof = prove_whir_opening(t_prove, params, datas, u_cube)
    if tamper:
        tamper(proof)
    t_verify = Transcript()
    verify_whir(t_verify, params, proof, openings, roots, u_cube)


class TestWhirPcs:
    def test_single_commitment(self):
        _roundtrip(small_params(2, 4, 2), [3])

    def test_multiple_commitments(self):
        _roundtrip(small_params(2, 3, 2), [1, 2, 4])

    def test_larger_k(self):
        _roundtrip(small_params(2, 5, 3), [2, 2])

    def test_tampered_final_poly_rejected(self):
        def tamper(proof):
            proof.final_poly[0] = (proof.final_poly[0] + 1) % P

        with pytest.raises(WhirError):
            _roundtrip(small_params(2, 4, 2), [2], tamper=tamper)

    def test_tampered_ood_rejected(self):
        def tamper(proof):
            if proof.ood_values:
                proof.ood_values[0] = (proof.ood_values[0] + 1) % P
            else:
                proof.final_poly[0] = (proof.final_poly[0] + 1) % P

        with pytest.raises(WhirError):
            _roundtrip(small_params(2, 4, 2), [2], tamper=tamper)

    def test_binary_k_fold_consistency(self):
        """k-ary fold of subgroup evaluations == direct evaluation of the
        fold-composed polynomial (unit test, lib.rs:1191)."""
        k = 3
        log_n = 5
        n = 1 << log_n
        coeffs = rng.integers(0, P, (n, 4), dtype=np.uint64)
        omega = two_adic_generator(log_n)

        def poly_eval(cs, x_ef):
            acc = hext.ezero()
            for c in reversed(cs):
                acc = hext.eadd(hext.emul(acc, x_ef), c)
            return acc

        x = pow(omega, 5, P)
        # gather the 2^k coset points x * w^(j * n/2^k)
        pts = [x * pow(omega, (n >> k) * t, P) % P for t in range(1 << k)]
        values = np.stack([poly_eval(coeffs, hext.from_base(p)) for p in pts])
        alphas = [rng.integers(0, P, 4, dtype=np.uint64) for _ in range(k)]
        got = binary_k_fold(values, alphas, x)

        # reference: repeated even/odd split f(x) = f_e(x^2) + x f_o(x^2),
        # folded f' = f_e + alpha * f_o
        cur = [coeffs[i] for i in range(n)]
        for a in alphas:
            nxt = []
            for i in range(0, len(cur), 2):
                even, odd = cur[i], cur[i + 1]
                nxt.append(hext.eadd(even, hext.emul(a, odd)))
            cur = nxt
        x2k = pow(x, 1 << k, P)
        expect = poly_eval(np.stack(cur), hext.from_base(x2k))
        assert np.array_equal(got, expect)
