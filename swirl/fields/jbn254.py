"""BN254 scalar-field arithmetic on device (JAX) for the outer hash scheme.

The reference accelerates its outer-recursion hashing tier (Poseidon2 over
the BN254 scalar field) with dedicated CUDA kernels
(``cuda-backend/cuda/src/bn254_poseidon2.cu``, ``bn254_merkle.cu``,
``bn254_grind.cu`` driven by ``src/bn254_sponge.rs``). This module is the
TPU-stack peer's field layer: 254-bit modular arithmetic built from the only
fast integer primitive a TPU exposes — elementwise 32-bit lanes — so the
device Poseidon2 (``swirl.hash.jbn254_poseidon2``) can hash Merkle leaf rows
and grind on device instead of on host.

Representation: a field element is a trailing ``(16,)`` axis of uint32, each
lane holding one 16-bit limb (little-endian), value in Montgomery form with
``R = 2^256``. All ops broadcast over leading batch axes, so hashing ``h``
Merkle rows runs as elementwise work on ``(h, 16)`` arrays — VPU-shaped.
16-bit limbs keep every partial product (``< 2^32 - 2^17``) and every lazily
carried accumulator inside uint32, the same trick the BabyBear field uses
for its 32x32 product (``jfield._mul_full``); reduction is textbook
word-serial Montgomery (CIOS), re-derived, not translated.

Carry discipline: inside the CIOS loop carries are *lazy* — one vectorized
shift/mask pass per accumulation keeps every limb <= 0x1FFFE and every
product-plus-limb <= 2^32 - 1 (exactly; see ``mont_mul``). Boundaries
(``add``/``sub``/final normalization) use an exact 16-step sequential carry,
which XLA unrolls to a short dependency chain per element.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..hash.bn254_poseidon2 import P_BN254

L = 16  # limbs
LIMB_BITS = 16
MASK = np.uint32(0xFFFF)

_R_INT = (1 << (L * LIMB_BITS)) % P_BN254
_R2_INT = (_R_INT * _R_INT) % P_BN254
_NP16_INT = (-pow(P_BN254, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
NP16 = np.uint32(_NP16_INT)


def limbs_from_int(v: int) -> np.ndarray:
    """Host int (< 2^256, NOT reduced — P itself must round-trip) ->
    (16,) uint32 16-bit limbs."""
    v = int(v)
    assert 0 <= v < (1 << (L * LIMB_BITS))
    return np.array(
        [(v >> (LIMB_BITS * i)) & 0xFFFF for i in range(L)], dtype=np.uint32
    )


def int_from_limbs(arr) -> int:
    a = np.asarray(arr, dtype=np.uint64).reshape(-1)
    assert a.shape[0] == L
    return sum(int(a[i]) << (LIMB_BITS * i) for i in range(L))


def const(v: int) -> np.ndarray:
    """Host int -> Monty-form (16,) limb constant (reduced)."""
    return limbs_from_int((int(v) % P_BN254) * _R_INT % P_BN254)


P_LIMBS = limbs_from_int(P_BN254)
R2 = limbs_from_int(_R2_INT)
ONE_CANON = limbs_from_int(1)


def _seq_carry(limbs):
    """Exact carry normalization: list of (...,) uint32 limb values (each
    < 2^32) -> stacked (..., n) 16-bit limbs + final carry."""
    out = []
    carry = jnp.zeros(limbs[0].shape, jnp.uint32)
    for x in limbs:
        s = x + carry
        out.append(s & MASK)
        carry = s >> LIMB_BITS
    return jnp.stack(out, axis=-1), carry


def _ge_p(t):
    """Lexicographic t >= P over the trailing (16,) limb axis (t 16-bit)."""
    ge = jnp.ones(t.shape[:-1], dtype=bool)
    for i in range(L):  # LSB -> MSB: higher differing limb decides last
        gt = t[..., i] > P_LIMBS[i]
        lt = t[..., i] < P_LIMBS[i]
        ge = jnp.where(gt, True, jnp.where(lt, False, ge))
    return ge


def _sub_p(t):
    """t - P with sequential borrow (only applied where t >= P)."""
    out = []
    borrow = jnp.zeros(t.shape[:-1], jnp.uint32)
    for i in range(L):
        d = t[..., i] - P_LIMBS[i] - borrow
        borrow = d >> 31  # 1 iff wrapped negative (operands are 16/17-bit)
        out.append(d & MASK)
    return jnp.stack(out, axis=-1)


def _cond_sub_p(t):
    return jnp.where(_ge_p(t)[..., None], _sub_p(t), t)


@jax.jit
def add(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    t, _ = _seq_carry([a[..., i] + b[..., i] for i in range(L)])
    return _cond_sub_p(t)


@jax.jit
def sub(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    # s = a + P (carry chain; a + P < 2^255 so no top carry), then s - b
    # (borrow chain; s >= b always) — two separate chains, NOT mergeable
    # into one pass: a limb can need a carry out and a borrow in at once.
    s, _ = _seq_carry([a[..., i] + P_LIMBS[i] for i in range(L)])
    out = []
    borrow = jnp.zeros(a.shape[:-1], jnp.uint32)
    for i in range(L):
        d = s[..., i] - b[..., i] - borrow
        borrow = d >> 31  # 1 iff wrapped negative (operands are 16-bit)
        out.append(d & MASK)
    t = jnp.stack(out, axis=-1)
    return _cond_sub_p(t)


@jax.jit
def mont_mul(a, b):
    """Montgomery product over the trailing limb axis (word-serial CIOS,
    word 2^16).

    Lazy-carry bound: after each vectorized carry pass a limb is at most
    ``0xFFFF + 0xFFFF = 0x1FFFE``; adding a partial product keeps it at most
    ``0xFFFE0001 + 0x1FFFE = 0xFFFFFFFF`` — no uint32 overflow."""
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    t = jnp.zeros(batch + (L + 1,), jnp.uint32)

    def lazy_pass(t):
        c = t >> LIMB_BITS
        t = t & MASK
        return t.at[..., 1:].add(c[..., :-1])

    for i in range(L):
        ai = a[..., i : i + 1]
        t = t.at[..., :L].add(ai * b)
        t = lazy_pass(t)
        m = (t[..., 0] * NP16) & MASK
        t = t.at[..., :L].add(m[..., None] * P_LIMBS)
        t = lazy_pass(t)
        # limb 0 now ≡ 0 mod 2^16 with its carry already propagated: shift
        # one word right. (The dropped limb's masked value is exactly 0.)
        t = jnp.concatenate(
            [t[..., 1:], jnp.zeros(batch + (1,), jnp.uint32)], axis=-1
        )
    # exact normalization; CIOS result < 2P < 2^255 so the top limb clears
    t, _ = _seq_carry([t[..., i] for i in range(L + 1)])
    return _cond_sub_p(t[..., :L])


@jax.jit
def from_canonical(t):
    """Canonical limbs -> Monty form."""
    return mont_mul(t, R2)


@jax.jit
def to_canonical(a):
    """Monty form -> canonical limbs (multiply by canonical 1 = REDC)."""
    return mont_mul(a, ONE_CANON)


def dbl(a):
    return add(a, a)
