"""Poseidon2 permutation over BabyBear, width 16 (host numpy + device JAX).

Structure (Poseidon2 paper / Plonky3 ``Poseidon2BabyBear<16>``, used by the
reference config ``crates/stark-sdk/src/config/baby_bear_poseidon2.rs:27``):

- initial external linear layer M_E
- 4 initial full rounds: add round constants, x^7 S-box on all lanes, M_E
- 13 partial rounds: add constant to lane 0, x^7 on lane 0, internal layer M_I
- 4 final full rounds

M_E is the circulant ``circ(2*M4, M4, ..., M4)``: apply the 4x4 MDS block M4
to each 4-lane chunk, then add the per-position column sums across chunks.
M_I is ``J + diag(d)`` (J = all-ones): ``s_i' = sum(s) + d_i * s_i``.

Round constants are the vendored HorizenLabs/Plonky3 ``RC16`` instance
(:mod:`swirl.hash.constants` — reference parity, see that module's docstring);
the internal diagonal is Plonky3's power-of-two-friendly BabyBear diagonal
(``crates/cuda-common/include/poseidon2.cuh:50-67``). All device/native
implementations (jposeidon2, Pallas, C++ host kernels) pull from
:func:`constants` below, so the table is defined exactly once.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..fields.babybear import P, U64
from . import constants as _rc

WIDTH = 16
RATE = 8
DIGEST = 8
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 13
N_BITS = 31

# Internal-layer diagonal d_i (canonical values). This is the
# shift-friendly diagonal family used by Plonky3 for BabyBear width 16:
# [-2, 1, 2, 1/2, 3, 4, -1/2, -3, -4, 1/2^8, 1/4, 1/8, 1/2^27, -1/2^8, -1/16, -1/2^27]
_inv = lambda x: pow(x, P - 2, P)
INTERNAL_DIAG = [
    P - 2,
    1,
    2,
    _inv(2),
    3,
    4,
    P - _inv(2),
    P - 3,
    P - 4,
    _inv(1 << 8),
    _inv(4),
    _inv(8),
    _inv(1 << 27),
    P - _inv(1 << 8),
    P - _inv(16),
    P - _inv(1 << 27),
]


@lru_cache(maxsize=None)
def constants():
    """Round-constant tables (canonical uint64): the vendored reference-parity
    HorizenLabs/Plonky3 RC16 instance (see :mod:`swirl.hash.constants`)."""
    return (
        np.array(_rc.EXTERNAL_INITIAL, dtype=np.uint64),
        np.array(_rc.INTERNAL, dtype=np.uint64),
        np.array(_rc.EXTERNAL_FINAL, dtype=np.uint64),
        np.array(INTERNAL_DIAG, dtype=np.uint64),
    )


# ---------------------------------------------------------------------------
# Host (numpy) implementation. State: uint64 array (..., 16), canonical.
# ---------------------------------------------------------------------------

_P = U64(P)


def _sbox_np(x):
    x2 = (x * x) % _P
    x4 = (x2 * x2) % _P
    x6 = (x4 * x2) % _P
    return (x6 * x) % _P


def _m4_np(s):
    """Apply M4 = circ-style [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]] to
    (..., 4) lanes using the cheap add-chain."""
    x0, x1, x2, x3 = (s[..., i] for i in range(4))
    t01 = (x0 + x1) % _P
    t23 = (x2 + x3) % _P
    t0123 = (t01 + t23) % _P
    t01123 = (t0123 + x1) % _P
    t01233 = (t0123 + x3) % _P
    out0 = (t01123 + t01) % _P
    out1 = (t01123 + 2 * x2) % _P
    out2 = (t01233 + t23) % _P
    out3 = (t01233 + 2 * x0) % _P
    return np.stack([out0, out1, out2, out3], axis=-1)


def _external_np(s):
    s4 = s.reshape(s.shape[:-1] + (4, 4))
    s4 = _m4_np(s4)
    sums = s4.sum(axis=-2, dtype=np.uint64) % _P  # (..., 4)
    s4 = (s4 + sums[..., None, :]) % _P
    return s4.reshape(s.shape)


def _internal_np(s, diag):
    total = s.sum(axis=-1, dtype=np.uint64) % _P
    return (s * diag + total[..., None]) % _P


def permute_np(state: np.ndarray) -> np.ndarray:
    """Poseidon2 permutation on (..., 16) canonical uint64 arrays.

    Dispatches to the native C++ kernel (swirl/native) when available; the
    numpy path below is the bit-exact fallback and spec.
    """
    from .. import native

    if native.available():
        return native.permute_batch(np.asarray(state, dtype=np.uint64) % _P)
    return _permute_np_py(state)


def _permute_np_py(state: np.ndarray) -> np.ndarray:
    ext_init, internal, ext_final, diag = constants()
    s = np.asarray(state, dtype=np.uint64) % _P
    s = _external_np(s)
    for rc in ext_init:
        s = _sbox_np((s + rc) % _P)
        s = _external_np(s)
    for rc in internal:
        s0 = _sbox_np((s[..., 0] + rc) % _P)
        s = s.copy()
        s[..., 0] = s0
        s = _internal_np(s, diag)
    for rc in ext_final:
        s = _sbox_np((s + rc) % _P)
        s = _external_np(s)
    return s


# ---------------------------------------------------------------------------
# Host hashing helpers (numpy, canonical). Used by verifier/keygen/transcript.
# ---------------------------------------------------------------------------


def hash_slice_np(vals) -> np.ndarray:
    """Padding-free sponge, rate 8, digest = first 8 lanes of final state.

    Mirrors Plonky3 PaddingFreeSponge semantics: overwrite state[:len(chunk)]
    per RATE-sized chunk (last chunk may be partial), permute after each.
    """
    vals = np.asarray(vals, dtype=np.uint64).ravel() % _P
    from .. import native

    if native.available():
        return native.hash_rows(vals.reshape(1, -1))[0]
    state = np.zeros(WIDTH, dtype=np.uint64)
    for i in range(0, len(vals), RATE):
        chunk = vals[i : i + RATE]
        state[: len(chunk)] = chunk
        state = permute_np(state)
    return state[:DIGEST]


def hash_rows_np(mat: np.ndarray) -> np.ndarray:
    """Batched hash_slice over rows of a 2D (n, w) canonical array -> (n, 8)."""
    mat = np.asarray(mat, dtype=np.uint64) % _P
    from .. import native

    if native.available():
        return native.hash_rows(mat)
    n, w = mat.shape
    state = np.zeros((n, WIDTH), dtype=np.uint64)
    if w == 0:
        # p3 PaddingFreeSponge on empty input: no permutation, zero digest.
        return state[:, :DIGEST]
    for i in range(0, w, RATE):
        chunk = mat[:, i : i + RATE]
        state[:, : chunk.shape[1]] = chunk
        state = permute_np(state)
    return state[:, :DIGEST]


def compress_np(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """2-to-1 truncated-permutation compression on (..., 8) digests."""
    state = np.concatenate([left, right], axis=-1)
    return permute_np(state)[..., :DIGEST]


def compress_rows_np(pairs: np.ndarray) -> np.ndarray:
    """(n, 2, 8) -> (n, 8)."""
    n = pairs.shape[0]
    return permute_np(pairs.reshape(n, WIDTH))[:, :DIGEST]
