"""Traced twin of :mod:`swirl.fields.ext`: EF4 scalar algebra on jnp values.

The host prover orchestration does its protocol-small math (round-poly
assembly, eq kernels, claims) in canonical-u64 numpy via ``fields.ext``.
Under the fused single-program prover the same math must run *inside* the
jit trace, so this module provides the identical vocabulary over
Montgomery-form uint32 jnp arrays (trailing dim 4). ``swirl.prover.vmode``
selects between the two.

Convention: every traced "host value" in the fused prover is Monty form;
conversion to canonical happens only inside the device transcript
(observes) and in the final proof-materialization pass.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .babybear import P
from . import jfield as jf

_P4M2 = P**4 - 2  # Fermat exponent for EF4 inversion


def ezero(shape=()):
    return np.zeros(shape + (4,), dtype=np.uint32)


def eone():
    out = np.zeros(4, dtype=np.uint32)
    out[0] = jf.const(1)
    return out


def from_base(a):
    """Base-field value -> EF. `a` may be a static int or a traced Monty
    base-field scalar/array."""
    if isinstance(a, (int, np.integer)):
        out = np.zeros(4, dtype=np.uint32)
        out[0] = jf.const(int(a))
        return out
    a = jnp.asarray(a)
    return jnp.concatenate(
        [a[..., None], jnp.zeros(a.shape + (3,), jnp.uint32)], axis=-1
    )


def eadd(a, b):
    return jf.ext_add(jnp.asarray(a), jnp.asarray(b))


def esub(a, b):
    return jf.ext_sub(jnp.asarray(a), jnp.asarray(b))


def eneg(a):
    return jf.ext_neg(jnp.asarray(a))


def emul(a, b):
    return jf.ext_mul(jnp.asarray(a), jnp.asarray(b))


def escale(a, s):
    """a * base-field scalar. `s`: static int, static int array, or traced
    Monty base scalar/array (broadcast over the leading dims of a)."""
    if isinstance(s, (int, np.integer)):
        return jf.ext_scale(jnp.asarray(a), jf.const(int(s)))
    if isinstance(s, np.ndarray) and s.dtype != np.uint32:
        return jf.ext_scale(jnp.asarray(a), jnp.asarray(jf.const_arr(s)))
    return jf.ext_scale(jnp.asarray(a), jnp.asarray(s))


def epow(a, e: int):
    return jf.ext_pow_const(jnp.asarray(a), int(e))


def einv(a):
    """EF4 inverse via the norm map: a^-1 = conj / N(a), with
    N(a) = a^(1+p+p^2+p^3) in the base field (3 Frobenius maps, 3 EF muls,
    one base-field inversion) — far cheaper than a p^4-2 Fermat ladder."""
    a = jnp.asarray(a)
    f1 = _frobenius(a, 1)
    f2 = _frobenius(a, 2)
    f3 = _frobenius(a, 3)
    conj = jf.ext_mul(f1, jf.ext_mul(f2, f3))  # a^(p+p^2+p^3)
    norm = jf.ext_mul(a, conj)[..., 0]  # base field
    return jf.ext_scale(conj, jf.inv(norm))


def _frob_consts(k: int):
    # x^4 = W: Frobenius^k maps coeff_i -> coeff_i * W^(i*(p^k-1)/4)
    from .babybear import EXT_W

    out = np.zeros(4, dtype=np.uint32)
    exp = (pow(P, k, P**4) - 1) // 4 % (P - 1)
    for i in range(4):
        out[i] = jf.const(pow(EXT_W, i * exp % (P - 1), P))
    return out


from functools import lru_cache

_frob_cache = lru_cache(maxsize=None)(_frob_consts)


def _frobenius(a, k: int):
    return jf.mul(a, jnp.asarray(_frob_cache(k)))


def epowers(a, n: int):
    """[1, a, a^2, ..., a^(n-1)] as (n, 4). Uses lax.scan so long power
    tables don't blow up the trace."""
    a = jnp.asarray(a).reshape(4)
    if n <= 0:
        return jnp.zeros((0, 4), jnp.uint32)
    one = jnp.asarray(eone())
    if n <= 8:
        out = [one]
        for _ in range(n - 1):
            out.append(jf.ext_mul(out[-1], a))
        return jnp.stack(out)

    def step(carry, _):
        return jf.ext_mul(carry, a), carry

    _, pows = jax.lax.scan(step, one, None, length=n)
    return pows


def esum(a, axis=0):
    return jf.ext_sum(jnp.asarray(a), axis=axis)


def batch_einv(a):
    """(k, 4) batch inverse via Montgomery's trick (one einv total)."""
    a = jnp.asarray(a)
    k = a.shape[0]
    if k == 0:
        return a
    prefixes = [a[0]]
    for i in range(1, k):
        prefixes.append(jf.ext_mul(prefixes[-1], a[i]))
    inv_all = einv(prefixes[-1])
    out = [None] * k
    for i in range(k - 1, 0, -1):
        out[i] = jf.ext_mul(inv_all, prefixes[i - 1])
        inv_all = jf.ext_mul(inv_all, a[i])
    out[0] = inv_all
    return jnp.stack(out)
