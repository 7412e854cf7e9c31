"""Poseidon2-BabyBear-16 on device (JAX, Montgomery uint32).

Batched over leading dims; the hot path is Merkle-leaf hashing where the
batch is the number of rows (2^20+). All lane arithmetic is the portable
uint32 Montgomery kernel from :mod:`swirl.fields.jfield`, so this runs on
CPU, inside jit, and inside Pallas TPU kernels unchanged.

TPU-native peer of the reference CUDA kernels ``src/merkle_tree.cu`` /
``src/sponge.cu`` (re-derived, not translated).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..fields import jfield as jf
from .poseidon2 import DIGEST, RATE, WIDTH, constants


@lru_cache(maxsize=None)
def _mont_constants():
    ext_init, internal, ext_final, diag = constants()
    return (
        jf.const_arr(ext_init),  # (4, 16)
        jf.const_arr(internal),  # (13,)
        jf.const_arr(ext_final),  # (4, 16)
        jf.const_arr(diag),  # (16,)
    )


def _sbox(x):
    x2 = jf.mul(x, x)
    x4 = jf.mul(x2, x2)
    return jf.mul(jf.mul(x4, x2), x)


def _m4(s):
    # s: (..., 4, 4); M4 rows [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]]
    x0, x1, x2, x3 = (s[..., i] for i in range(4))
    t01 = jf.add(x0, x1)
    t23 = jf.add(x2, x3)
    t0123 = jf.add(t01, t23)
    t01123 = jf.add(t0123, x1)
    t01233 = jf.add(t0123, x3)
    out0 = jf.add(t01123, t01)
    out1 = jf.add(t01123, jf.add(x2, x2))
    out2 = jf.add(t01233, t23)
    out3 = jf.add(t01233, jf.add(x0, x0))
    return jnp.stack([out0, out1, out2, out3], axis=-1)


def _external(s):
    s4 = s.reshape(s.shape[:-1] + (4, 4))
    s4 = _m4(s4)
    sums = jf.base_sum(s4, axis=-2)
    s4 = jf.add(s4, sums[..., None, :])
    return s4.reshape(s.shape)


def _internal(s, diag):
    total = jf.base_sum(s, axis=-1)
    return jf.add(jf.mul(s, diag), total[..., None])


def permute(state):
    """Poseidon2 permutation on (..., 16) Monty-form uint32 arrays."""
    ext_init, internal, ext_final, diag = _mont_constants()
    s = _external(state)
    for r in range(ext_init.shape[0]):
        s = _sbox(jf.add(s, ext_init[r]))
        s = _external(s)
    for r in range(internal.shape[0]):
        s0 = _sbox(jf.add(s[..., 0], internal[r]))
        s = s.at[..., 0].set(s0)
        s = _internal(s, diag)
    for r in range(ext_final.shape[0]):
        s = _sbox(jf.add(s, ext_final[r]))
        s = _external(s)
    return s


from functools import partial


@partial(jax.jit)
def hash_rows(mat):
    """Hash each row of a (n, w) Monty-form matrix -> (n, 8) digests.

    Padding-free sponge, rate 8: overwrite-absorb RATE lanes per step.
    """
    n, w = mat.shape
    state = jnp.zeros((n, WIDTH), dtype=jnp.uint32)
    for i in range(0, w, RATE):
        chunk = mat[:, i : i + RATE]
        state = jax.lax.dynamic_update_slice(state, chunk, (0, 0))
        state = permute(state)
    return state[:, :DIGEST]


@jax.jit
def compress_pairs(left, right):
    """(n, 8), (n, 8) -> (n, 8) via truncated permutation."""
    state = jnp.concatenate([left, right], axis=-1)
    return permute(state)[:, :DIGEST]
