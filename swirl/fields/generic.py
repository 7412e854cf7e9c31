"""Generic device field arithmetic: 31-bit Montgomery fields, sparse-modulus
extensions, and 64-bit Goldilocks — the TPU peer of the reference's
``benchmarks/fields`` CUDA crate (``benchmarks/fields/src/lib.rs``,
``cuda/include/{baby_bear,koala_bear,goldilocks}/*.h``).

Everything is whole-array jnp math on uint32 (no 64-bit integer path on
TPU): 31-bit primes use the same 16-bit-limb Montgomery core as
``swirl/fields/jfield.py`` but parameterized over P; Goldilocks synthesizes
the 64x64->128 product from u32 pairs and reduces with the
``2^64 = 2^32 - 1`` identity.

Layouts put the big data axis MINOR (coeff/limb axis leading) per the TPU
tiling rule (STATUS.md round-3): extension elements are ``(d, ...)``
coefficient-major, Goldilocks values are ``(2, ...)`` (lo, hi).

Field inventory (moduli copied from the reference headers, arithmetic
re-derived):

- BabyBear  p = 2^31 - 2^27 + 1: fp5 = F_p[x]/(x^5 - 2),
  fp6 = F_p[x]/(x^6 - 31)  (fp4 lives in ``jfield.py``)
- KoalaBear p = 2^31 - 2^24 + 1: base, kb5 = F_p[x]/(x^5 + x^2 - 1),
  kb6 = F_p[x]/(x^6 + x^3 + 1)
- Goldilocks p = 2^64 - 2^32 + 1: base, gl3 = F_p[X]/(X^3 - X - 1)

Inversion is Fermat powering (p^d - 2) over the batched mul — one code
path for every field, bit-exact by construction, and still a pure device
program (the reference uses per-field adjugate formulas; the throughput
difference only matters for the inv bench row, which reports its own
number).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

MASK16 = np.uint32(0xFFFF)


def _mul_full(a, b):
    """Full 32x32 -> 64-bit product as (hi, lo) uint32, via 16-bit limbs."""
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


@dataclass(frozen=True)
class Mont31:
    """Montgomery arithmetic over a 31-bit prime (batched jnp uint32)."""

    p: int

    @property
    def P(self):
        return np.uint32(self.p)

    @property
    def NPRIME(self):
        return np.uint32((-pow(self.p, -1, 1 << 32)) % (1 << 32))

    @property
    def R(self) -> int:
        return (1 << 32) % self.p

    @property
    def R2(self):
        return np.uint32((self.R * self.R) % self.p)

    # -- host <-> device -------------------------------------------------

    def to_monty(self, vals) -> jnp.ndarray:
        a = np.asarray(vals, dtype=np.uint64) % np.uint64(self.p)
        return jnp.asarray(
            (a * np.uint64(self.R)) % np.uint64(self.p), dtype=jnp.uint32
        )

    def to_host(self, x) -> np.ndarray:
        # multiply by 1 (Monty form of R^{-1}) = REDC(x)
        one = jnp.ones((), jnp.uint32)
        return np.asarray(
            jax.device_get(self._redc(jnp.zeros_like(x), x * one)),
            dtype=np.uint64,
        )

    # -- core ------------------------------------------------------------

    def _redc(self, hi, lo):
        m = lo * self.NPRIME
        mp_hi, _ = _mul_full(m, self.P)
        carry = (lo != jnp.uint32(0)).astype(jnp.uint32)
        u = hi + mp_hi + carry
        return jnp.where(u >= self.P, u - self.P, u)

    def add(self, a, b):
        s = a + b
        return jnp.where(s >= self.P, s - self.P, s)

    def sub(self, a, b):
        return jnp.where(a >= b, a - b, a + self.P - b)

    def neg(self, a):
        return jnp.where(a == 0, a, self.P - a)

    def mul(self, a, b):
        hi, lo = _mul_full(a, b)
        return self._redc(hi, lo)

    def const(self, v: int):
        """Monty form of a host constant (embeds as an immediate)."""
        return np.uint32((int(v) % self.p) * self.R % self.p)

    def inv(self, a):
        """Fermat: a^(p-2)."""
        return self.pow_int(a, self.p - 2)

    def pow_int(self, a, e: int):
        result = jnp.full_like(a, self.const(1))
        base = a
        while e > 0:
            if e & 1:
                result = self.mul(result, base)
            base = self.mul(base, base)
            e >>= 1
        return result


@dataclass(frozen=True)
class ExtField:
    """F_p[x] / (monic modulus), coefficient-major ``(d, ...)`` arrays.

    ``reduction``: the substitution x^d = sum_i c_i x^i as a length-d tuple
    of host ints (so kb5's x^5 + x^2 - 1 is ``(1, 0, -1, 0, 0)`` meaning
    x^5 = 1 - x^2).
    """

    base: Mont31
    d: int
    reduction: Tuple[int, ...]

    def _red_consts(self):
        return [self.base.const(c % self.base.p) for c in self.reduction]

    def add(self, a, b):
        return self.base.add(a, b)

    def sub(self, a, b):
        return self.base.sub(a, b)

    def mul(self, a, b):
        """Schoolbook convolution then degree folding via the reduction."""
        d = self.d
        F = self.base
        # conv[k] = sum_{i+j=k} a_i b_j, k < 2d-1
        conv: List = [None] * (2 * d - 1)
        for i in range(d):
            for j in range(d):
                t = F.mul(a[i], b[j])
                k = i + j
                conv[k] = t if conv[k] is None else F.add(conv[k], t)
        red = self._red_consts()
        # fold top terms down, highest first (reduction rules may cascade)
        for k in range(2 * d - 2, d - 1, -1):
            t = conv[k]
            for i, c in enumerate(red):
                if int(c) == 0:
                    continue
                conv[k - d + i] = F.add(conv[k - d + i], F.mul(t, c))
        return jnp.stack(conv[:d])

    def one_like(self, a):
        out = jnp.zeros_like(a)
        return out.at[0].set(jnp.full_like(a[0], self.base.const(1)))

    def inv(self, a):
        """Fermat in the extension: a^(p^d - 2)."""
        e = self.base.p**self.d - 2
        result = self.one_like(a)
        base = a
        while e > 0:
            if e & 1:
                result = self.mul(result, base)
            base = self.mul(base, base)
            e >>= 1
        return result

    def to_monty(self, coeffs) -> jnp.ndarray:
        return self.base.to_monty(np.asarray(coeffs, dtype=np.uint64))

    def to_host(self, x) -> np.ndarray:
        return self.base.to_host(x)


# ---------------------------------------------------------------------------
# Goldilocks: p = 2^64 - 2^32 + 1, values as (lo, hi) uint32 pairs.

GL_P = (1 << 64) - (1 << 32) + 1
_GL_EPS = np.uint32(0xFFFFFFFF)  # 2^32 - 1 == 2^64 mod p


def _u64_add(alo, ahi, blo, bhi):
    lo = alo + blo
    c = (lo < alo).astype(jnp.uint32)
    hi = ahi + bhi + c
    c2 = jnp.where(c == 1, (hi <= ahi).astype(jnp.uint32), (hi < ahi).astype(jnp.uint32))
    return lo, hi, c2


def _u64_sub(alo, ahi, blo, bhi):
    lo = alo - blo
    b = (alo < blo).astype(jnp.uint32)
    hi = ahi - bhi - b
    under = jnp.where(
        b == 1, (ahi <= bhi).astype(jnp.uint32), (ahi < bhi).astype(jnp.uint32)
    )
    return lo, hi, under


def _gl_canonical(lo, hi):
    """Reduce a value < 2^64 into [0, p): subtract p once if >= p.
    p = (2^32-1)<<32 | 1."""
    ge = (hi == _GL_EPS) & (lo >= jnp.uint32(1))
    slo, shi, _ = _u64_sub(lo, hi, jnp.uint32(1), _GL_EPS)
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


class Goldilocks:
    """Batched Goldilocks arithmetic on (2, ...) uint32 (lo, hi) arrays
    (canonical form, not Montgomery — the special-prime reduction is cheap)."""

    p = GL_P

    @staticmethod
    def to_dev(vals) -> jnp.ndarray:
        a = np.asarray(vals, dtype=np.uint64) % np.uint64(GL_P)
        return jnp.stack(
            [
                jnp.asarray(a & np.uint64(0xFFFFFFFF), jnp.uint32),
                jnp.asarray(a >> np.uint64(32), jnp.uint32),
            ]
        )

    @staticmethod
    def to_host(x) -> np.ndarray:
        lo = np.asarray(jax.device_get(x[0]), dtype=np.uint64)
        hi = np.asarray(jax.device_get(x[1]), dtype=np.uint64)
        return lo | (hi << np.uint64(32))

    @staticmethod
    def add(a, b):
        lo, hi, c = _u64_add(a[0], a[1], b[0], b[1])
        # overflow past 2^64: add eps (2^32 - 1) back
        lo2, hi2, c2 = _u64_add(lo, hi, _GL_EPS * c, jnp.zeros_like(hi))
        # the second carry can only fire when the first did; eps more can't
        # overflow again after one wrap
        lo3 = lo2 + _GL_EPS * c2
        hi3 = hi2 + (lo3 < lo2).astype(jnp.uint32)
        return jnp.stack(_gl_canonical(lo3, hi3))

    @staticmethod
    def sub(a, b):
        lo, hi, under = _u64_sub(a[0], a[1], b[0], b[1])
        # borrow past 0: subtract eps
        lo2, hi2, u2 = _u64_sub(lo, hi, _GL_EPS * under, jnp.zeros_like(hi))
        lo3 = lo2 - _GL_EPS * u2
        hi3 = hi2 - (lo3 > lo2).astype(jnp.uint32)
        return jnp.stack(_gl_canonical(lo3, hi3))

    @staticmethod
    def neg(a):
        return Goldilocks.sub(jnp.zeros_like(a), a)

    @staticmethod
    def mul(a, b):
        """(a*b) mod p, 128-bit product limbs x0..x3 then the standard
        single-correction reduction (2^64 = 2^32 - 1, 2^96 = -1 mod p):
        r = (x1:x0) - x3, then + x2*(2^32 - 1), each wrap fixed by one
        conditional +-eps (a second wrap is impossible — the corrected
        value is within eps of the boundary)."""
        h00, l00 = _mul_full(a[0], b[0])
        h01, l01 = _mul_full(a[0], b[1])
        h10, l10 = _mul_full(a[1], b[0])
        h11, l11 = _mul_full(a[1], b[1])
        x0 = l00
        # x1 = h00 + l01 + l10 (carries into x2)
        s1 = h00 + l01
        c1 = (s1 < h00).astype(jnp.uint32)
        x1 = s1 + l10
        c1 = c1 + (x1 < s1).astype(jnp.uint32)
        # x2 = h01 + h10 + l11 + c1 (carries into x3)
        s2 = h01 + h10
        c2 = (s2 < h01).astype(jnp.uint32)
        s2b = s2 + l11
        c2 = c2 + (s2b < s2).astype(jnp.uint32)
        x2 = s2b + c1
        c2 = c2 + (x2 < s2b).astype(jnp.uint32)
        x3 = h11 + c2
        # t0 = (x1:x0) - x3; on borrow subtract eps (no second underflow)
        t0_lo, t0_hi, bw = _u64_sub(x0, x1, x3, jnp.zeros_like(x3))
        corr = _GL_EPS * bw
        t0_lo2 = t0_lo - corr
        t0_hi2 = t0_hi - (t0_lo2 > t0_lo).astype(jnp.uint32)
        # t1 = x2 * eps = (x2 << 32) - x2 as a u64 (always fits)
        t1_lo = jnp.uint32(0) - x2
        t1_hi = x2 - (x2 != 0).astype(jnp.uint32)
        # t2 = t0 + t1; on carry add eps (no second overflow)
        t2_lo, t2_hi, cw = _u64_add(t0_lo2, t0_hi2, t1_lo, t1_hi)
        corr2 = _GL_EPS * cw
        t3_lo = t2_lo + corr2
        t3_hi = t2_hi + (t3_lo < t2_lo).astype(jnp.uint32)
        return jnp.stack(_gl_canonical(t3_lo, t3_hi))

    @staticmethod
    def inv(a):
        e = GL_P - 2
        result = jnp.stack([jnp.ones_like(a[0]), jnp.zeros_like(a[1])])
        base = a
        while e > 0:
            if e & 1:
                result = Goldilocks.mul(result, base)
            base = Goldilocks.mul(base, base)
            e >>= 1
        return result


class Goldilocks3:
    """GL cubic extension F_p[X]/(X^3 - X - 1): elements (3, 2, ...)
    (coeff-major over (lo, hi) pairs). X^3 = X + 1."""

    d = 3

    @staticmethod
    def add(a, b):
        return jnp.stack([Goldilocks.add(a[i], b[i]) for i in range(3)])

    @staticmethod
    def sub(a, b):
        return jnp.stack([Goldilocks.sub(a[i], b[i]) for i in range(3)])

    @staticmethod
    def mul(a, b):
        G = Goldilocks
        conv = [None] * 5
        for i in range(3):
            for j in range(3):
                t = G.mul(a[i], b[j])
                k = i + j
                conv[k] = t if conv[k] is None else G.add(conv[k], t)
        # X^4 = X^2 + X ; X^3 = X + 1
        c0 = G.add(conv[0], conv[3])
        c1 = G.add(G.add(conv[1], conv[3]), conv[4])
        c2 = G.add(conv[2], conv[4])
        return jnp.stack([c0, c1, c2])

    @staticmethod
    def inv(a):
        e = GL_P**3 - 2
        result = jnp.zeros_like(a)
        result = result.at[0, 0].set(jnp.ones_like(a[0, 0]))
        base = a
        while e > 0:
            if e & 1:
                result = Goldilocks3.mul(result, base)
            base = Goldilocks3.mul(base, base)
            e >>= 1
        return result

    @staticmethod
    def to_dev(coeffs) -> jnp.ndarray:
        return jnp.stack([Goldilocks.to_dev(c) for c in np.asarray(coeffs, np.uint64)])

    @staticmethod
    def to_host(x) -> np.ndarray:
        return np.stack([Goldilocks.to_host(x[i]) for i in range(3)])


# ---------------------------------------------------------------------------
# The field zoo (moduli per the reference headers)

BABYBEAR_P = (1 << 31) - (1 << 27) + 1  # 0x78000001
KOALABEAR_P = (1 << 31) - (1 << 24) + 1  # 0x7f000001

babybear = Mont31(BABYBEAR_P)
koalabear = Mont31(KOALABEAR_P)

# BabyBear: x^5 = 2 (fp5.h:9), x^6 = 31 (fp6.h:4)
bb5 = ExtField(babybear, 5, (2, 0, 0, 0, 0))
bb6 = ExtField(babybear, 6, (31, 0, 0, 0, 0, 0))
# KoalaBear: x^5 = 1 - x^2 (kb5.h:4), x^6 = -(1 + x^3) (kb6.h:4)
kb5 = ExtField(koalabear, 5, (1, 0, -1, 0, 0))
kb6 = ExtField(koalabear, 6, (-1, 0, 0, -1, 0, 0))

FIELDS: Dict[str, object] = {
    "babybear": babybear,
    "koalabear": koalabear,
    "bb5": bb5,
    "bb6": bb6,
    "kb5": kb5,
    "kb6": kb6,
    "goldilocks": Goldilocks,
    "gl3": Goldilocks3,
}
