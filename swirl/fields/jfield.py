"""BabyBear field arithmetic on device (JAX), in Montgomery form on uint32.

Why Montgomery/uint32: TPUs have no native 64-bit integer path and no
32x32->64 widening multiply exposed through XLA; we synthesize the 64-bit
product from 16-bit limbs using only wrapping ``uint32`` ops, then apply a
textbook REDC. The same code runs unchanged on the CPU backend (used by the
test suite) and inside Pallas TPU kernels (the ops are plain ``jnp`` ops).

Representation: a device array ``x`` holds ``val * R mod P`` with
``R = 2^32``. Conversions to/from the canonical host representation happen at
protocol boundaries only (transcript observes, proof assembly).

Extension field EF4 = F_p[x]/(x^4 - 11) is represented with a trailing
dimension of size 4.

This module is the TPU-native peer of the reference's field headers
(``cuda-common/include/mont32_t.cuh``, ``ff/baby_bear.hpp``) — re-derived from
the standard Montgomery algorithm, not translated.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .babybear import EXT_W, P as P_INT

# numpy scalars (not jnp) so they embed as immediates inside jit *and*
# Pallas kernels (jnp scalars become captured constants pallas rejects)
P = np.uint32(P_INT)
# R = 2^32 mod P, R2 = R^2 mod P
R_INT = (1 << 32) % P_INT
R2_INT = (R_INT * R_INT) % P_INT
# NPRIME = -P^{-1} mod 2^32  (so that m = t_lo * NPRIME makes t + m*P divisible by 2^32)
NPRIME_INT = (-pow(P_INT, -1, 1 << 32)) % (1 << 32)
NPRIME = np.uint32(NPRIME_INT)
R2 = np.uint32(R2_INT)

MASK16 = np.uint32(0xFFFF)


def _mul_full(a, b):
    """Full 32x32 -> 64-bit product as (hi, lo) uint32 pair, via 16-bit limbs."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl
    carry_mid = (mid < lh).astype(jnp.uint32)
    lo = ll + (mid << 16)
    carry_lo = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> 16) + (carry_mid << 16) + carry_lo
    return hi, lo


def _redc(hi, lo):
    """Montgomery reduction of 64-bit (hi, lo) < P * 2^32; returns value < P."""
    m = lo * NPRIME  # wrapping
    mp_hi, mp_lo = _mul_full(m, P)
    # (hi:lo) + (mp_hi:mp_lo) has zero low word; carry is 1 unless lo == 0
    carry = (lo != jnp.uint32(0)).astype(jnp.uint32)
    u = hi + mp_hi + carry
    return jnp.where(u >= P, u - P, u)


@jax.jit
def mul(a, b):
    """Montgomery product of arrays in Monty form (broadcasts).

    jit-wrapped (like every jf op below): in eager host mode a field op is
    one fused dispatch instead of ~20, and inside larger traces (including
    the fused whole-proof prover) each call contributes ONE call equation
    instead of dozens of primitives — tracing the full prove would
    otherwise take minutes. Mosaic inlines inner pjit calls, so Pallas
    kernels can keep calling these helpers.
    """
    a, b = jnp.broadcast_arrays(a, b)
    hi, lo = _mul_full(a, b)
    return _redc(hi, lo)


@jax.jit
def add(a, b):
    s = a + b  # both < P < 2^31 so no wrap
    return jnp.where(s >= P, s - P, s)


@jax.jit
def sub(a, b):
    d = a - b  # wraps if negative
    return jnp.where(a >= b, d, d + P)


@jax.jit
def neg(a):
    return jnp.where(a == 0, a, P - a)


@jax.jit
def from_u32(x):
    """Canonical uint32 values -> Monty form (device)."""
    x = jnp.asarray(x, jnp.uint32)
    return mul(x, R2)


@jax.jit
def to_u32(x):
    """Monty form -> canonical uint32 (device). REDC with hi = 0."""
    return _redc(jnp.zeros_like(x), x)


def const(v: int):
    """Host int -> Monty-form scalar constant.

    Returned as numpy so values may be safely cached across jit traces
    (XLA embeds them as constants at trace time).
    """
    return np.uint32((int(v) % P_INT) * R_INT % P_INT)


def const_arr(vals):
    """Host canonical array -> Monty-form constant array (numpy-backed; safe
    to cache and reuse across jit/shard_map traces)."""
    a = np.asarray(vals, dtype=np.uint64) % np.uint64(P_INT)
    return np.asarray((a * np.uint64(R_INT)) % np.uint64(P_INT), dtype=np.uint32)


def to_host(x) -> np.ndarray:
    """Monty-form device array -> canonical numpy uint64 array."""
    return np.asarray(jax.device_get(to_u32(x)), dtype=np.uint64)


def pow_const(a, e: int):
    """a ** e for python int e (unrolled square-and-multiply at trace time)."""
    result = None
    base = a
    ee = int(e)
    while ee > 0:
        if ee & 1:
            result = base if result is None else mul(result, base)
        base = mul(base, base)
        ee >>= 1
    if result is None:
        return jnp.full_like(a, const(1))
    return result


@jax.jit
def inv(a):
    """Elementwise inverse by Fermat (a^(P-2)). a must be nonzero."""
    return pow_const(a, P_INT - 2)


# ---------------------------------------------------------------------------
# Extension field EF4: trailing dim 4, coefficients in Monty form.
# ---------------------------------------------------------------------------

W_MONT = const(EXT_W)


def ext_from_base(a):
    """Base field (Monty) -> EF with zero high coefficients."""
    a = jnp.asarray(a)
    return jnp.concatenate(
        [a[..., None], jnp.zeros(a.shape + (3,), dtype=jnp.uint32)], axis=-1
    )


def ext_add(a, b):
    return add(a, b)


def ext_sub(a, b):
    return sub(a, b)


def ext_neg(a):
    return neg(a)


# ext_mul combine permutation: c_k = sum_i m[i, (k-i) % 4], with a W factor
# on wrapped terms (i > k). Flattened gather indices into m.reshape(-1, 16):
# entry (k, i) -> 4*i + ((k - i) % 4).
_EXT_MUL_PERM = np.asarray(
    [[4 * i + ((k - i) % 4) for i in range(4)] for k in range(4)],
    dtype=np.int32,
).reshape(-1)
_EXT_MUL_WRAP = np.asarray(
    [[i > k for i in range(4)] for k in range(4)], dtype=bool
)


def _dbl(x):
    return add(x, x)


def _mul_w(x):
    """x * W (= 11) via modular doublings: 11x = 8x + 2x + x."""
    d1 = _dbl(x)
    d3 = _dbl(_dbl(d1))
    return add(add(d3, d1), x)


@jax.jit
def _ext_mul_compact(a, b):
    """Compact form: one batched Montgomery product for all 16 coefficient
    pairs + a fixed gather/fold — ~6x fewer HLO ops per call site than the
    coefficient-wise form, which dominated the fused prover's post-inline
    module size. Used for the ~1.5k protocol-scalar sites (tiny operands)."""
    m = mul(a[..., :, None], b[..., None, :])  # (..., 4, 4) all products
    flat = m.reshape(m.shape[:-2] + (16,))
    sel = jnp.take(flat, jnp.asarray(_EXT_MUL_PERM), axis=-1).reshape(
        m.shape[:-2] + (4, 4)
    )
    wrap = jnp.asarray(_EXT_MUL_WRAP)
    terms = jnp.where(wrap, _mul_w(sel), sel)
    t01 = add(terms[..., 0], terms[..., 1])
    t23 = add(terms[..., 2], terms[..., 3])
    return add(t01, t23)


@jax.jit
def _ext_mul_wide(a, b):
    """Component-explicit schoolbook form for BULK operands.

    The compact gather/fold form lowers (on TPU) to reduce-fusions over the
    tiny stacked-term dims with minor-dim-4/5 tiled layouts — measured at
    ~0.3 GB/s effective (63 ms per 16 MB call inside the GKR layer scans,
    94% of the whole segmented prove). Sixteen Montgomery products on
    (..., ) component slices keep the big axis minor and fully
    lane-vectorized; no gathers, no tiny-axis reduces. c_k =
    sum_{i+j=k} a_i b_j + W * sum_{i+j=k+4} a_i b_j over F[x]/(x^4 - W)."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    c0 = add(mul(a0, b0), _mul_w(add(add(mul(a1, b3), mul(a2, b2)), mul(a3, b1))))
    c1 = add(add(mul(a0, b1), mul(a1, b0)), _mul_w(add(mul(a2, b3), mul(a3, b2))))
    c2 = add(add(mul(a0, b2), mul(a1, b1)), add(mul(a2, b0), _mul_w(mul(a3, b3))))
    c3 = add(add(mul(a0, b3), mul(a1, b2)), add(mul(a2, b1), mul(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


# Operand-size threshold (elements, excluding the component dim) above which
# ext_mul switches to the wide form. Shapes are static under trace, so the
# dispatch is resolved at trace time; small protocol-math sites keep the
# compact HLO footprint.
_EXT_MUL_WIDE_MIN = 1 << 10


def ext_mul(a, b):
    """EF4 * EF4 with x^4 = W (broadcasts leading dims)."""
    a, b = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(b))
    n = 1
    for d in a.shape[:-1]:
        n *= int(d)
    if n >= _EXT_MUL_WIDE_MIN:
        return _ext_mul_wide(a, b)
    return _ext_mul_compact(a, b)


@jax.jit
def ext_scale(a, s):
    """EF * base-field scalar (both Monty)."""
    return mul(a, jnp.asarray(s)[..., None])


def ext_const(coeffs) -> jnp.ndarray:
    """Host canonical 4-coeff value -> Monty EF constant (shape (4,))."""
    return const_arr(np.asarray(coeffs, dtype=np.uint64))


def ext_to_host(x) -> np.ndarray:
    return to_host(x)


def ext_pow_const(a, e: int):
    result = None
    base = a
    ee = int(e)
    while ee > 0:
        if ee & 1:
            result = base if result is None else ext_mul(result, base)
        base = ext_mul(base, base)
        ee >>= 1
    if result is None:
        one = jnp.zeros(jnp.asarray(a).shape, dtype=jnp.uint32)
        return one.at[..., 0].set(const(1))
    return result


@partial(jax.jit, static_argnames=("axis",))
def _ext_sum_jit(a, axis: int):
    a = jnp.moveaxis(a, axis, 0)
    while a.shape[0] > 1:
        m = a.shape[0]
        if m % 2 == 1:
            a = jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], jnp.uint32)], 0)
            m += 1
        half = m // 2
        v = a.reshape((half, 2) + a.shape[1:])
        a = add(v[:, 0], v[:, 1])
    return a[0]


def ext_sum(a, axis=0):
    """Sum along an axis with modular reduction.

    uint32 sums wrap; we reduce pairwise with the modular `add` via a
    log-depth tree of contiguous pair-halves (reshape + unit slices, no
    strided gathers). jit-wrapped so each call site contributes ONE call
    equation to an outer trace — the unrolled tree (log n levels) was a
    dominant share of the fused prover's HLO size.
    """
    a = jnp.asarray(a)
    n = a.shape[axis]
    if n == 0:
        shape = list(a.shape)
        del shape[axis]
        return jnp.zeros(shape, dtype=jnp.uint32)
    return _ext_sum_jit(a, int(axis) % a.ndim)


base_sum = ext_sum  # same tree reduction works for base field arrays


# ---------------------------------------------------------------------------
# Device-computed tables.
#
# Any O(n) table materialized on host at trace time (numpy twiddles, power
# series, selector masks, gather maps) is baked into the traced program as an
# HLO literal; at production heights that is tens-to-hundreds of MB of
# constants per program and makes lowering/compiling the fused prover blow up
# superlinearly. These helpers build the same tables ON DEVICE from iota in
# O(log n) traced ops, so program size stays flat in the trace height.
# ---------------------------------------------------------------------------


def powers_dev(base, n: int):
    """[base^0, ..., base^{n-1}] in Monty form as a device (n,) array.

    `base` is a Monty-form scalar (traced or constant). Log-depth doubling:
    each round appends arr * arr[-1]'s successor power, so the traced program
    is O(log n) equations with no O(n) literal."""
    one = jnp.full((1,), const(1), jnp.uint32)
    if n <= 0:
        return jnp.zeros((0,), jnp.uint32)
    arr = one
    cur = jnp.asarray(base, jnp.uint32).reshape(())  # base^(len(arr))
    while arr.shape[0] < n:
        arr = jnp.concatenate([arr, mul(arr, cur)])
        cur = mul(cur, cur)
    return arr[:n]


def pow_bits_dev(base_int: int, exp, nbits: int):
    """base^exp (Monty form) for a traced uint32 exponent < 2^nbits.

    Square-and-multiply over the exponent bits with the host-side squares
    base^(2^b) folded in as scalar constants: O(nbits) traced equations,
    elementwise in exp's shape. Replaces gather-from-a-2^nbits-roots-table
    (which baked an O(2^nbits) literal into the program)."""
    exp = jnp.asarray(exp, jnp.uint32)
    acc = jnp.full(exp.shape, const(1), jnp.uint32)
    b_pow = int(base_int) % P_INT
    for b in range(nbits):
        s = const(b_pow)
        bit = ((exp >> b) & jnp.uint32(1)) != 0
        acc = jnp.where(bit, mul(acc, s), acc)
        b_pow = b_pow * b_pow % P_INT
    return acc


def ext_powers_dev(base, n: int):
    """[base^0, ..., base^{n-1}] for an EF4 Monty scalar, device (n, 4)."""
    one = jnp.zeros((1, 4), jnp.uint32).at[0, 0].set(const(1))
    if n <= 0:
        return jnp.zeros((0, 4), jnp.uint32)
    arr = one
    cur = jnp.asarray(base, jnp.uint32).reshape(1, 4)
    while arr.shape[0] < n:
        arr = jnp.concatenate([arr, ext_mul(arr, cur)])
        cur = ext_mul(cur, cur)
    return arr[:n]


def bitrev_perm_dev(log_n: int):
    """Bit-reversal permutation indices as a device (2^log_n,) int32 array."""
    n = 1 << log_n
    idx = jax.lax.iota(jnp.uint32, n)
    rev = jnp.zeros((n,), jnp.uint32)
    for b in range(log_n):
        rev = rev | (((idx >> b) & jnp.uint32(1)) << (log_n - 1 - b))
    return rev.astype(jnp.int32)
