"""Device-side sumcheck building blocks (JAX).

The sumcheck workloads of SWIRL (constraint batch sumcheck, GKR layers,
stacked reduction, WHIR folds) share a few primitives, implemented here as
batched array programs over the trailing "hypercube" axis:

- ``fold_ple``: evaluate prismalinear columns at a univariate point r
  (the univariate-skip round fold) via barycentric interpolation over each
  2^l_skip chunk, with optional rotation and cyclic lifting of short traces.
- ``fold_mle``: the standard multilinear fold t(y) = t0 + (t1 - t0) * r.
- ``eq_hypercube_dev`` / ``mobius_eq_hypercube_dev``: iterative-doubling
  weight tables in EF on device.
- ``coset_eval_chunks``: per-chunk iDFT + coset DFT batched over columns,
  the heavy step of univariate-skip round 0.

Matrices: base (w, h) / extension (w, h, 4) uint32 Monty arrays; the
hypercube/prism index is the trailing data axis.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import ext as hext
from ..fields import jfield as jf
from ..fields.babybear import P, U64, batch_inverse, roots_of_unity
from .ntt import coset_ntt, intt


def barycentric_weights_host(l_skip: int, r: np.ndarray) -> np.ndarray:
    """Host EF weights c_i with p(r) = sum_i c_i * p(w^i) for deg < 2^l_skip.

    c_i = (r^N - 1)/N * w^i / (r - w^i), N = 2^l_skip.
    """
    n = 1 << l_skip
    omega = roots_of_unity(l_skip)  # (n,)
    r = np.asarray(r, U64)
    rn = hext.epow(r, n)
    pref = hext.escale(hext.esub(rn, hext.eone()), pow(n, P - 2, P))
    denoms = np.stack([hext.esub(r, hext.from_base(int(w))) for w in omega])
    # batch invert EF via single elements (small n)
    weights = np.zeros((n, 4), dtype=U64)
    for i in range(n):
        inv = hext.einv(denoms[i])
        weights[i] = hext.escale(hext.emul(pref, inv), int(omega[i]))
    return weights


def barycentric_weights_dev(l_skip: int, r):
    """Device Monty (2^l_skip, 4) barycentric weights; `r` is a value in the
    current :mod:`swirl.prover.vmode` mode."""
    from .vmode import vm

    v = vm()
    if not v.is_trace:
        return v.const_vec(barycentric_weights_host(l_skip, r))
    from ..fields import text

    n = 1 << l_skip
    omega = roots_of_unity(l_skip)
    rn = text.epow(r, n)
    pref = text.escale(text.esub(rn, text.eone()), pow(n, P - 2, P))
    denoms = jnp.stack(
        [text.esub(r, text.from_base(int(w))) for w in omega]
    )
    invs = text.batch_einv(denoms)
    return jnp.stack(
        [
            text.escale(text.emul(pref, invs[i]), int(omega[i]))
            for i in range(n)
        ]
    )


def lift_mat(mat, l_skip: int):
    """Cyclically tile a (w, h[,4]) matrix to height >= 2^l_skip."""
    h = mat.shape[1]
    if h >= 1 << l_skip:
        return mat
    reps = (1 << l_skip) // h
    tiles = (reps,) + (1,) * (mat.ndim - 2)
    return jnp.tile(mat, (1,) + tiles)


def rot1(mat):
    """Rotate rows by one: out[i] = mat[(i + 1) % h] along axis 1."""
    return jnp.roll(mat, -1, axis=1)


def fold_ple(mat, l_skip: int, is_rot: bool, weights_dev):
    """Fold prismalinear evaluations at r (weights from
    :func:`barycentric_weights_host`, converted to device).

    mat: (w, h) base or (w, h, 4) EF; returns (w, lifted_h >> l_skip, 4) EF.
    """
    is_ext = mat.ndim == 3
    if is_rot:
        mat = rot1(mat)
    mat = lift_mat(mat, l_skip)
    w = mat.shape[0]
    h = mat.shape[1]
    n_chunks = h >> l_skip
    if is_ext:
        chunks = mat.reshape(w, n_chunks, 1 << l_skip, 4)
        prods = jf.ext_mul(chunks, weights_dev[None, None, :, :])
    else:
        chunks = mat.reshape(w, n_chunks, 1 << l_skip)
        prods = jf.mul(chunks[..., None], weights_dev[None, None, :, :])
    return jf.ext_sum(prods, axis=2)


def fold_mle(mat, r_dev):
    """(w, h, 4) -> (w, h/2, 4): t0 + (t1 - t0) * r.

    Stride-2 slices, not reshape+index: the (w, h/2, 1, 4) temps of the
    reshape form tile T(1,128) on TPU (32x padding; see gkr._pair_split)."""
    h = mat.shape[1]
    if h <= 1:
        return mat
    t0 = mat[:, 0::2]
    t1 = mat[:, 1::2]
    return jf.ext_add(t0, jf.ext_mul(jf.ext_sub(t1, t0), r_dev))


def fold_mle_vec(vec, r_dev):
    """(h, 4) -> (h/2, 4)."""
    h = vec.shape[0]
    if h <= 1:
        return vec
    t0, t1 = vec[0::2], vec[1::2]
    return jf.ext_add(t0, jf.ext_mul(jf.ext_sub(t1, t0), r_dev))


def interp_mle_at_int(mat, x: int):
    """Evaluate MLE pairs at small integer X: t0 + (t1 - t0) * X.

    mat (w, h, 4) -> (w, h/2, 4). X is a compile-time int.
    """
    w, h = mat.shape[0], mat.shape[1]
    pairs = mat.reshape(w, h // 2, 2, 4)
    t0, t1 = pairs[:, :, 0], pairs[:, :, 1]
    if x == 0:
        return t0
    if x == 1:
        return t1
    return jf.ext_add(t0, jf.ext_scale(jf.ext_sub(t1, t0), jf.const(x)))


def interp_mle_at_int_base(mat, x: int):
    """Base-field variant: (w, h) -> (w, h/2)."""
    w, h = mat.shape[0], mat.shape[1]
    pairs = mat.reshape(w, h // 2, 2)
    t0, t1 = pairs[:, :, 0], pairs[:, :, 1]
    if x == 0:
        return t0
    if x == 1:
        return t1
    return jf.add(t0, jf.mul(jf.sub(t1, t0), jf.const(x)))


def eq_hypercube_dev(xi_vec, bitrev: bool = False):
    """eq(xi, y) table over H_n on device: (2^n, 4).

    `xi_vec` is a (n, 4) EF vector in the current vmode (host canonical
    numpy or traced Monty); the table is always device Monty.

    bitrev=True emits the table in BIT-REVERSED index order (entry j holds
    eq at mask rev_n(j)) by iterating the variables in reverse — the layout
    the GKR device path keeps its MLEs in so pair splits are contiguous
    halves instead of stride-2 slices (measured 8x kernel speedup on the
    v5e; see STATUS round 5).
    """
    from .vmode import vm

    v = vm()
    xi = xi_vec.reshape(-1, 4)
    order = range(xi.shape[0] - 1, -1, -1) if bitrev else range(xi.shape[0])
    out = v.ef_dev(v.ext.eone()).reshape(1, 4)
    for i in order:
        x = v.ef_dev(xi[i])
        one_minus = v.ef_dev(v.ext.esub(v.ext.eone(), xi[i]))
        lo = jf.ext_mul(out, one_minus)
        hi = jf.ext_mul(out, x)
        # convention: table[mask], bit i of mask <-> xi[i]; building from
        # bit 0 upward means new bit is the high bit of the doubled table
        # (reversed iteration puts xi[0] highest => bit-reversed table).
        out = jnp.concatenate([lo, hi], axis=0)
    return out


@lru_cache(maxsize=None)
def _bitrev_perm_jit(bits: int):
    """(2^bits, ...) -> same array with index bit-reversal applied (one
    gather; the index vector is computed in-program, no literal table)."""

    @jax.jit
    def f(x):
        n = 1 << bits
        i = jnp.arange(n, dtype=jnp.uint32)
        r = jnp.zeros_like(i)
        for b in range(bits):
            r = r | (((i >> b) & jnp.uint32(1)) << (bits - 1 - b))
        return jnp.take(x, r, axis=0)

    return f


def bitrev_permute(x):
    """Bit-reverse the leading (power-of-two) axis of ``x``."""
    n = int(x.shape[0])
    bits = n.bit_length() - 1
    assert n == 1 << bits
    if bits <= 1:
        return x
    return _bitrev_perm_jit(bits)(x)


def mobius_eq_hypercube_dev(u_vec, bitrev: bool = False):
    """Möbius-adjusted eq table over H_n on device: weights (1-2u_i, u_i).

    bitrev=True emits the bit-reversed-index table (variables iterated in
    reverse; see eq_hypercube_dev)."""
    from .vmode import vm

    v = vm()
    u = u_vec.reshape(-1, 4)
    out = v.ef_dev(v.ext.eone()).reshape(1, 4)
    one = v.ext.eone()
    order = range(u.shape[0] - 1, -1, -1) if bitrev else range(u.shape[0])
    for i in order:
        w0 = v.ef_dev(v.ext.esub(one, v.ext.eadd(u[i], u[i])))
        w1 = v.ef_dev(u[i])
        lo = jf.ext_mul(out, w0)
        hi = jf.ext_mul(out, w1)
        out = jnp.concatenate([lo, hi], axis=0)
    return out


def eq_pows_hypercube_dev(z, n: int, base_field: bool, bitrev: bool = False):
    """eq(pow(z), y) table where pow(z) = (z, z^2, z^4, ...): (2^n, 4).

    Equivalently eq table at the vector of repeated squarings of z.
    `z` is a value in the current vmode (base-field or EF per the flag).
    """
    from .vmode import vm

    v = vm()
    if base_field:
        if isinstance(z, (int, np.integer)):
            zv = v.ext.from_base(int(z) % P)
        else:
            zv = v.ext.from_base(z)
    else:
        zv = z
    pows = []
    cur = zv
    for _ in range(n):
        pows.append(cur)
        cur = v.ext.emul(cur, cur)
    vec = v.stack(pows)
    return eq_hypercube_dev(vec, bitrev=bitrev)


def eq_pows_base_batch_dev(zvec, n: int, bitrev: bool = False):
    """Batched eq(pow(z), y) tables for a vector of BASE-field points.

    zvec: (Q,) device Monty scalars. Returns (Q, 2^n) base-field Monty —
    row i is the eq table at (z_i, z_i^2, z_i^4, ...). One doubling ladder
    for all Q points (the per-query ladders dominated the WHIR trace's op
    count; the values are identical)."""
    q = zvec.shape[0]
    one = jf.const(1)
    # squaring ladder first so bitrev mode can consume the factors in
    # reverse (bitrev tables iterate variables MSB-first; see
    # eq_hypercube_dev)
    zs = []
    z = zvec
    for _ in range(n):
        zs.append(z)
        z = jf.mul(z, z)
    if bitrev:
        zs = list(reversed(zs))
    out = jnp.full((q, 1), one, jnp.uint32)
    for z in zs:
        x = z[:, None]
        lo = jf.mul(out, jf.sub(jnp.uint32(one), x))
        hi = jf.mul(out, x)
        out = jnp.concatenate([lo, hi], axis=1)  # new bit = high index bit
    return out


def coset_eval_chunks(mat, l_skip: int, coset_shifts: Sequence[int], is_rot: bool):
    """Univariate-skip round-0 evaluation grid.

    mat: (w, h) base-field trace columns (h is the true height; lifted if
    short). For each hypercube point x (the chunk index) the degree <2^l_skip
    polynomial through the chunk values is evaluated on the cosets
    ``shift * D`` for each shift.

    Returns (w, n_chunks, n_shifts << l_skip) base-field evals where the
    trailing index is z_int = coset_idx * 2^l_skip + z_idx — i.e. grouped by
    coset, matching the host interpolation layout.
    """
    if is_rot:
        mat = rot1(mat)
    mat = lift_mat(mat, l_skip)
    w, h = mat.shape
    n_chunks = h >> l_skip
    chunks = mat.reshape(w, n_chunks, 1 << l_skip)
    coeffs = intt(chunks)
    outs = [coset_ntt(coeffs, s) for s in coset_shifts]
    return jnp.concatenate(outs, axis=2)


def selectors_matrix(height: int, l_skip: int):
    """(3, lifted_height) base selectors [is_first, is_transition, is_last]
    of the lift of a height-`height` trace.

    Built on device from iota (O(log) traced ops) — a numpy version would
    bake a 3*height literal into every traced prover program."""
    import jax

    lifted = max(height, 1 << l_skip)
    idx = jax.lax.iota(jnp.uint32, lifted) % jnp.uint32(height)
    one = jnp.uint32(jf.const(1))
    zero = jnp.uint32(0)
    is_first = jnp.where(idx == 0, one, zero)
    is_last = jnp.where(idx == jnp.uint32(height - 1), one, zero)
    is_transition = jnp.where(idx == jnp.uint32(height - 1), zero, one)
    return jnp.stack([is_first, is_transition, is_last])
