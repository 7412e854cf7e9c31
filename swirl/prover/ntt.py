"""Batched NTT over BabyBear on device (JAX).

Design: a recursive radix-2 Cooley-Tukey over the trailing axis, fully
vectorized over all leading axes (columns batch). The recursion is unrolled
at trace time into log2(N) stages of strided slices + butterflies, which XLA
fuses into a small number of kernels; twiddle tables are Monty-form device
constants. Works on base-field arrays (..., N) and extension-field arrays
(..., N, 4) via `ext=True` (twiddles stay in the base field since the
two-adic subgroup lies in F_p).

This is the TPU-native peer of the reference NTT stack
(``cuda-backend/cuda/supra/ntt.cu`` + ``src/batch_ntt_small.cu``); the
algorithm is the textbook DIT factorization, not a port.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import jfield as jf
from ..fields.babybear import P, roots_of_unity, two_adic_generator


def _twiddles(log_n: int, inverse: bool) -> tuple:
    """Per-stage twiddle tables in Monty form, indexed by merge-stage size.

    Computed ON DEVICE via log-depth power doubling (``jf.powers_dev``) so no
    O(n) literal is baked into the traced program (a 2^21-point transform
    would otherwise embed ~16 MB of constants per call)."""
    w = two_adic_generator(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    tables = []
    # stage s merges blocks of size 2^s into 2^(s+1): twiddle w_{2^(s+1)}^k
    for s in range(log_n):
        m = 1 << (s + 1)
        wm = pow(w, 1 << (log_n - s - 1), P)
        tables.append(jf.powers_dev(jf.const(wm), m // 2))
    return tuple(tables)


def _mul_maybe_ext(x, tw, ext: bool):
    if ext:
        return jf.mul(x, tw[..., None])
    return jf.mul(x, tw)


from functools import partial


def _bitrev_indices(log_n: int):
    """Bit-reversal permutation, computed on device from iota (no literal)."""
    return jf.bitrev_perm_dev(log_n)


def _dif_twiddles(log_n: int, inverse: bool) -> tuple:
    """Per-DIF-stage twiddles: stage with half-block size h uses w_{2h}^j.

    Device-computed (``jf.powers_dev``) — see ``_twiddles``."""
    w = two_adic_generator(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    tables = []
    for s in range(log_n):  # h = n/2, n/4, ..., 1
        h = 1 << (log_n - 1 - s)
        wm = pow(w, 1 << s, P)  # order-2h root
        tables.append(jf.powers_dev(jf.const(wm), h))
    return tuple(tables)


@partial(jax.jit, static_argnames=("inverse", "ext"))
def ntt(x, inverse: bool = False, ext: bool = False):
    """DFT along the trailing data axis (axis -1, or -2 for ext arrays).

    ntt(coeffs)[i] = poly(w^i) with w = two_adic_generator(log N), natural
    order in/out. Large 2D base-field transforms route to the four-step
    Stockham Pallas kernel (``swirl/tpu/ntt_pallas.py``, ~2 HBM passes);
    otherwise this is iterative decimation-in-frequency with
    contiguous-block butterflies (TPU-friendly: no minor-axis strided
    slicing) followed by one bit-reversal gather. With inverse=True this is
    the unscaled inverse; :func:`intt` applies the 1/N scale.
    """
    from ..tpu import ntt_pallas

    if ntt_pallas.usable(x.shape, ext):
        if ext:
            return ntt_pallas.ntt_ext(x, inverse=inverse)
        return ntt_pallas.ntt(x, inverse=inverse)
    axis = -2 if ext else -1
    n = x.shape[axis]
    if n == 1:
        return x
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    tables = _dif_twiddles(log_n, inverse)

    shape = list(x.shape)
    lead = shape[: axis if axis == -1 else -2]
    for s in range(log_n):
        h = 1 << (log_n - 1 - s)
        nb = n // (2 * h)
        tw = tables[s]
        if ext:
            v = x.reshape(lead + [nb, 2, h, 4])
            a = v[..., 0, :, :]
            b = v[..., 1, :, :]
            top = jf.add(a, b)
            bot = jf.mul(jf.sub(a, b), tw[:, None])
            x = jnp.stack([top, bot], axis=-3).reshape(shape)
        else:
            v = x.reshape(lead + [nb, 2, h])
            a = v[..., 0, :]
            b = v[..., 1, :]
            top = jf.add(a, b)
            bot = jf.mul(jf.sub(a, b), tw)
            x = jnp.stack([top, bot], axis=-2).reshape(shape)
    rev = jnp.asarray(_bitrev_indices(log_n))
    return jnp.take(x, rev, axis=axis)


def intt(x, ext: bool = False):
    """Inverse DFT (with 1/N scaling)."""
    axis = -2 if ext else -1
    n = x.shape[axis]
    if n == 1:
        return x
    log_n = n.bit_length() - 1
    y = ntt(x, inverse=True, ext=ext)
    n_inv = jf.const(pow(n, P - 2, P))
    return jf.mul(y, n_inv)


def _coset_powers(log_n: int, shift: int):
    """[shift^0, ..., shift^{N-1}] in Monty form, device-computed."""
    return jf.powers_dev(jf.const(int(shift) % P), 1 << log_n)


def coset_ntt(coeffs, shift: int, ext: bool = False):
    """Evaluate poly(coeffs) on the coset shift * <w>: scale then NTT."""
    axis = -2 if ext else -1
    n = coeffs.shape[axis]
    log_n = n.bit_length() - 1
    pows = _coset_powers(log_n, shift)
    if ext:
        scaled = jf.mul(coeffs, pows[:, None])
    else:
        scaled = jf.mul(coeffs, pows)
    return ntt(scaled, ext=ext)


def _bit_mask(n: int, b: int, ext: bool):
    """(n,)-or-(n,1) bool mask of indices with bit b set, device-computed."""
    idx = jax.lax.iota(jnp.uint32, n)
    mask = ((idx >> np.uint32(b)) & jnp.uint32(1)).astype(bool)
    return mask[:, None] if ext else mask


def zeta_transform(x, log_k: int, ext: bool = False):
    """Subset-zeta (coeffs->evals of MLE over the low log_k index bits).

    For each prefix bit position b: x[i | 2^b] += x[i]. Implemented as a
    cyclic roll + iota-mask + add so every intermediate keeps the big data
    axis minor: the earlier pair-stack form reshaped to (..., n/span, 2,
    step) with step as small as 1, and XLA:TPU materialized those
    tiny-minor-dim stacks with (8,128) tiles at ~3% utilization — a 32x
    padded 8 GB temp at the bench shape (compile-time HBM OOM). Wrapped
    roll values land only at masked-off (bit-clear) positions.
    """
    axis = -2 if ext else -1
    n = x.shape[axis]
    for b in range(log_k):
        m = _bit_mask(n, b, ext)
        shifted = jnp.roll(x, 1 << b, axis=axis)
        x = jnp.where(m, jf.add(x, shifted), x)
    return x


def mobius_transform(x, log_k: int, ext: bool = False):
    """Inverse of zeta_transform (evals->coeffs of MLE on low bits):
    x[i | 2^b] -= x[i] for each bit position b in increasing order.
    Same roll+mask structure as :func:`zeta_transform` (see its note)."""
    axis = -2 if ext else -1
    n = x.shape[axis]
    for b in range(log_k):
        m = _bit_mask(n, b, ext)
        shifted = jnp.roll(x, 1 << b, axis=axis)
        x = jnp.where(m, jf.sub(x, shifted), x)
    return x
