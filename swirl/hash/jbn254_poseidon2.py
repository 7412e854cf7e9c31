"""Poseidon2 over BN254 on device (JAX) — leaf row-hash, Merkle compress,
and sponge steps for the outer hash scheme.

TPU-stack peer of the reference's BN254 device kernels
(``cuda-backend/cuda/src/bn254_poseidon2.cu``, ``bn254_merkle.cu``,
``src/bn254_sponge.rs``): the same width-2/width-3 Poseidon2 instances as the
host implementation (:mod:`swirl.hash.bn254_poseidon2` — vendored gnark RC2
for width 2, Grain-generated RC3 for width 3), evaluated over the device
limb field :mod:`swirl.fields.jbn254`. Conformance to the host permutation is
asserted element-for-element in ``tests/test_jbn254.py``.

Shapes: a state is ``(..., t, 16)`` (t lanes of 16 uint32 limbs, Monty form);
all entry points broadcast over leading batch axes, so hashing ``h`` Merkle
leaf rows is elementwise work on ``(h, t, 16)`` arrays. Round loops run as
``lax.scan`` over the round-constant table, keeping the traced program size
independent of the round count (rF=6/8, rP=50/56)."""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import jbn254 as jb
from .bn254_poseidon2 import _PARAMS, P_BN254, constants
from .multi_field import FELTS_PER_SCALAR, FELT_BITS, BABY_BEAR_RATE, RATE, WIDTH


@lru_cache(maxsize=None)
def _dev_constants(t: int):
    """(ext_i, internal, ext_f) as stacked Monty limb arrays:
    (half, t, 16), (r_p, 16), (half, t, 16)."""
    ext_i, internal, ext_f = constants(t)
    m = lambda rows: np.stack([np.stack([jb.const(c) for c in r]) for r in rows])
    return (
        m(ext_i),
        np.stack([jb.const(c) for c in internal]),
        m(ext_f),
    )


def _sbox(x):
    x2 = jb.mont_mul(x, x)
    x4 = jb.mont_mul(x2, x2)
    return jb.mont_mul(x4, x)


def _external(s):
    """M_E = J + I over the lane axis (-2)."""
    t = s.shape[-2]
    total = s[..., 0, :]
    for i in range(1, t):
        total = jb.add(total, s[..., i, :])
    return jnp.stack([jb.add(total, s[..., i, :]) for i in range(t)], axis=-2)


def _internal(s, t: int):
    """M_I = J + diag(d); d = (1,2) or (1,1,2)."""
    d = _PARAMS[t][2]
    total = s[..., 0, :]
    for i in range(1, t):
        total = jb.add(total, s[..., i, :])
    lanes = []
    for i in range(t):
        x = s[..., i, :]
        if d[i] == 2:
            x = jb.dbl(x)
        lanes.append(jb.add(total, x))
    return jnp.stack(lanes, axis=-2)


def permute_dev(state, t: int):
    """Poseidon2 permutation on a (..., t, 16) Monty state."""
    assert state.shape[-2] == t
    ext_i, internal, ext_f = _dev_constants(t)

    def full_round(s, rc):  # rc (t, 16)
        s = jb.add(s, rc)
        s = _sbox(s)
        return _external(s), None

    def partial_round(s, c):  # c (16,)
        s0 = _sbox(jb.add(s[..., 0, :], c))
        s = jnp.concatenate([s0[..., None, :], s[..., 1:, :]], axis=-2)
        return _internal(s, t), None

    s = _external(state)
    s, _ = jax.lax.scan(full_round, s, jnp.asarray(ext_i))
    s, _ = jax.lax.scan(partial_round, s, jnp.asarray(internal))
    s, _ = jax.lax.scan(full_round, s, jnp.asarray(ext_f))
    return s


@jax.jit
def compress2_dev(a, b):
    """Batched 2-to-1 Merkle compression: permute width-2 [a, b], keep lane
    0 (``baby_bear_bn254_poseidon2.rs:59`` TruncatedPermutation)."""
    state = jnp.stack([a, b], axis=-2)
    return permute_dev(state, 2)[..., 0, :]


def pack_felts_dev(felts):
    """Canonical BabyBear (..., k<=8) uint32 -> one canonical BN254 limb
    scalar (..., 16): little-endian base-2^31 packing
    (``multi_field_packing.rs:31-39``).

    Static cross-limb shift network: felt j occupies bits [31j, 31j+31); a
    16-bit limb window overlaps at most two felt windows, so each limb is a
    sum of <= 2 masked shifts plus one exact carry pass."""
    k = felts.shape[-1]
    assert k <= FELTS_PER_SCALAR
    limbs = []
    for limb in range(jb.L):
        lo_bit, hi_bit = 16 * limb, 16 * limb + 16
        acc = None
        for j in range(k):
            f_lo, f_hi = FELT_BITS * j, FELT_BITS * j + FELT_BITS
            lo, hi = max(lo_bit, f_lo), min(hi_bit, f_hi)
            if lo >= hi:
                continue
            piece = (felts[..., j] >> np.uint32(lo - f_lo)) & np.uint32(
                (1 << (hi - lo)) - 1
            )
            piece = piece << np.uint32(lo - lo_bit)
            acc = piece if acc is None else acc + piece
        limbs.append(
            acc
            if acc is not None
            else jnp.zeros(felts.shape[:-1], jnp.uint32)
        )
    packed, _ = jb._seq_carry(limbs)
    return packed


def hash_rows_dev(rows):
    """Batched ``MultiFieldHasher::hash_iter`` (``hasher.rs:119-136``) over
    canonical BabyBear rows (..., w) uint32 -> canonical BN254 digests
    (..., 16).

    Per 16-felt block: pack two base-2^31 scalars, OVERWRITE state lanes
    0/1 (in Monty form), permute width 3; digest = state[0]."""
    batch = rows.shape[:-1]
    w = rows.shape[-1]
    state = jnp.zeros(batch + (WIDTH, jb.L), jnp.uint32)
    for i in range(0, max(w, 1), BABY_BEAR_RATE):
        block = rows[..., i : i + BABY_BEAR_RATE]
        if block.shape[-1] == 0:
            break
        for chunk_id in range(0, -(-block.shape[-1] // FELTS_PER_SCALAR)):
            felts = block[
                ..., chunk_id * FELTS_PER_SCALAR : (chunk_id + 1) * FELTS_PER_SCALAR
            ]
            packed = jb.from_canonical(pack_felts_dev(felts))
            state = jnp.concatenate(
                [
                    state[..., :chunk_id, :],
                    packed[..., None, :],
                    state[..., chunk_id + 1 :, :],
                ],
                axis=-2,
            )
        state = permute_dev(state, WIDTH)
    return jb.to_canonical(state[..., 0, :])


def merkle_layers_dev(leaf_digests):
    """Full Merkle tower over (n, 16) canonical digest limbs (n a power of
    two): returns the list of layers down to the root (``bn254_merkle.cu``
    peer). Compression runs in Monty form; layer outputs are canonical."""
    layers = [leaf_digests]
    cur = jb.from_canonical(leaf_digests)
    while cur.shape[0] > 1:
        cur = compress2_dev(cur[0::2], cur[1::2])
        layers.append(jb.to_canonical(cur))
    return layers
