"""Traced twin of :mod:`swirl.poly`: protocol-small polynomial math inside
the jit trace (Monty-form jnp values).

Only the functions the prover orchestration uses are twinned; the host
module remains the spec (and the verifier's implementation). Wherever the
host code mixes static data (integer points, subgroup roots, coset shifts)
with transcript-dependent values, the static part is precomputed as numpy
constant matrices so the traced part is a handful of vector ops.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from .fields import text
from .fields import jfield as jf
from .fields.babybear import P, U64, finv, roots_of_unity, two_adic_generator


def eval_eq_mle(x, y):
    x = jnp.asarray(x).reshape(-1, 4)
    y = jnp.asarray(y).reshape(-1, 4)
    one = jnp.asarray(text.eone())
    acc = one
    for i in range(x.shape[0]):
        xi, yi = x[i], y[i]
        t = text.emul(xi, yi)
        term = text.eadd(
            text.esub(text.eadd(one, text.eadd(t, t)), xi), text.eneg(yi)
        )
        acc = text.emul(acc, term)
    return acc


def evals_eq_hypercube(x):
    x = jnp.asarray(x).reshape(-1, 4)
    out = jnp.asarray(text.eone()).reshape(1, 4)
    one = jnp.asarray(text.eone())
    for i in range(x.shape[0]):
        lo = text.emul(out, text.esub(one, x[i]))
        hi = text.emul(out, x[i])
        out = jnp.concatenate([lo, hi], axis=0)
    return out


def _exp_powers_of_2(x, count: int) -> List:
    out = [jnp.asarray(x)]
    for _ in range(count - 1):
        out.append(text.emul(out[-1], out[-1]))
    return out


def eval_eq_uni(l_skip: int, x, y):
    res = jnp.asarray(text.eone())
    one = jnp.asarray(text.eone())
    if l_skip > 0:
        xs = _exp_powers_of_2(x, l_skip)
        ys = _exp_powers_of_2(y, l_skip)
        for xp, yp in zip(xs, ys):
            res = text.eadd(
                text.emul(text.eadd(xp, yp), res),
                text.emul(text.esub(xp, one), text.esub(yp, one)),
            )
    return text.escale(res, pow((P + 1) // 2, l_skip, P))


def eval_eq_uni_at_one(l_skip: int, x):
    res = jnp.asarray(text.eone())
    one = jnp.asarray(text.eone())
    if l_skip > 0:
        for xp in _exp_powers_of_2(x, l_skip):
            res = text.emul(res, text.eadd(xp, one))
    return text.escale(res, pow((P + 1) // 2, l_skip, P))


def eval_in_uni(l_skip: int, n: int, z):
    if n >= 0:
        return jnp.asarray(text.eone())
    zp = _exp_powers_of_2(z, l_skip + n + 1)[-1]
    return eval_eq_uni_at_one(-n, zp)


def eval_eq_sharp_uni(l_skip: int, xi_1, z):
    xi_1 = jnp.asarray(xi_1).reshape(-1, 4)
    assert xi_1.shape[0] == l_skip
    omega_pows = roots_of_unity(l_skip)
    eq_tab = evals_eq_hypercube(xi_1)
    res = jnp.asarray(text.ezero())
    for k in range(1 << l_skip):
        term = text.emul(
            eval_eq_uni(l_skip, z, jnp.asarray(text.from_base(int(omega_pows[k])))),
            eq_tab[k],
        )
        res = text.eadd(res, term)
    return res


def eq_uni_poly(l_skip: int, x):
    n = 1 << l_skip
    n_inv = pow(n, P - 2, P)
    pows = text.epowers(x, n + 1)
    rows = [text.escale(jnp.asarray(text.eone()), n_inv)]
    for j in range(1, n):
        rows.append(text.escale(pows[n - j], n_inv))
    return jnp.stack(rows)


def eq_sharp_uni_poly(xi_1):
    return idft_ef(evals_eq_hypercube(xi_1))


def horner_eval(coeffs, x):
    coeffs = jnp.asarray(coeffs).reshape(-1, 4)
    acc = jnp.asarray(text.ezero())
    for i in range(coeffs.shape[0] - 1, -1, -1):
        acc = text.eadd(text.emul(acc, x), coeffs[i])
    return acc


@lru_cache(maxsize=None)
def _lagrange_matrix(points: tuple) -> np.ndarray:
    """Static (k, k) base-field Monty matrix M with
    coeffs = sum_i evals[i] * M[i, :] (columns are coefficient degrees)."""
    k = len(points)
    mat = np.zeros((k, k), dtype=U64)
    for i in range(k):
        li = np.zeros(k, dtype=U64)
        li[0] = 1
        deg = 0
        denom = 1
        for j in range(k):
            if j == i:
                continue
            pj = int(points[j]) % P
            denom = denom * ((int(points[i]) - pj) % P) % P
            deg += 1
            for t in range(deg, 0, -1):
                li[t] = (int(li[t - 1]) + (P - pj) * int(li[t])) % P
            li[0] = int(li[0]) * (P - pj) % P
        mat[i] = (li * U64(finv(denom))) % U64(P)
    return jf.const_arr(mat)


def lagrange_coeffs(points: Sequence[int], evals):
    evals = jnp.asarray(evals).reshape(-1, 4)
    k = evals.shape[0]
    assert len(points) == k
    if k == 0:
        return jnp.zeros((0, 4), jnp.uint32)
    mat = jnp.asarray(_lagrange_matrix(tuple(int(p) for p in points)))
    prod = jf.mul(evals[:, None, :], mat[:, :, None])  # (k, k, 4)
    return jf.ext_sum(prod, axis=0)


@lru_cache(maxsize=None)
def _twiddle_matrix(n: int, inverse: bool, scaled: bool) -> np.ndarray:
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    w = two_adic_generator(log_n)
    if inverse:
        w = finv(w)
    idx = (np.arange(n)[:, None] * np.arange(n)[None, :]) % n
    pw = np.empty(n, dtype=U64)
    acc = 1
    for i in range(n):
        pw[i] = acc
        acc = acc * w % P
    tw = pw[idx]
    if scaled:
        tw = (tw * U64(finv(n))) % U64(P)
    return jf.const_arr(tw)


def dft_ef(coeffs):
    coeffs = jnp.asarray(coeffs).reshape(-1, 4)
    n = coeffs.shape[0]
    if n <= 1:
        return coeffs
    W = jnp.asarray(_twiddle_matrix(n, False, False))
    prod = jf.mul(coeffs[None, :, :], W[:, :, None])
    return jf.ext_sum(prod, axis=1)


def idft_ef(evals):
    evals = jnp.asarray(evals).reshape(-1, 4)
    n = evals.shape[0]
    if n <= 1:
        return evals
    W = jnp.asarray(_twiddle_matrix(n, True, True))
    prod = jf.mul(evals[None, :, :], W[:, :, None])
    return jf.ext_sum(prod, axis=1)


@lru_cache(maxsize=None)
def _unshift_scales(height: int, width: int, shift: int, init: int) -> np.ndarray:
    out = np.zeros((height, width), dtype=U64)
    for c in range(width):
        s_inv = finv(init * pow(shift, c, P) % P)
        acc = 1
        for t in range(height):
            out[t, c] = acc
            acc = acc * s_inv % P
    return jf.const_arr(out)


def from_geometric_cosets_evals(evals, shift: int, init: int):
    evals = jnp.asarray(evals)
    height, width = int(evals.shape[0]), int(evals.shape[1])
    if height == 0 or width == 0:
        return jnp.zeros((0, 4), jnp.uint32)
    cols = jnp.stack([idft_ef(evals[:, c]) for c in range(width)], axis=1)
    cols = jf.ext_scale(cols, jnp.asarray(_unshift_scales(height, width, shift, init)))
    pts = [pow(init * pow(shift, c, P) % P, height, P) for c in range(width)]
    mat = jnp.asarray(_lagrange_matrix(tuple(pts)))  # (width, width)
    # out[c*height + t] = lagrange(pts, cols[t])[c]
    prod = jf.mul(cols[:, :, None, :], mat[None, :, :, None])  # (h, w_in, w_out, 4)
    out = jf.ext_sum(prod, axis=1)  # (height, w_out, 4)
    return jnp.transpose(out, (1, 0, 2)).reshape(height * width, 4)


def powers_ef(x, n: int):
    return text.epowers(x, n)
