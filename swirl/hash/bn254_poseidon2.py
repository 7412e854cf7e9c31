"""Poseidon2 permutations over the BN254 scalar field (widths 2 and 3).

The reference workspace ships a second hash scheme for *outer* recursion
proofs: Merkle/transcript hashing over the BN254 scalar field so the final
STARK can be wrapped in a BN254 SNARK cheaply (reference:
``crates/stark-sdk/src/config/bn254_poseidon2/*`` widths 2/3,
``crates/stark-sdk/src/config/baby_bear_bn254_poseidon2.rs``,
``cuda-backend/cuda/src/bn254_*.cu``). This module is the TPU-stack peer:
width-2 and width-3 Poseidon2 instances over BN254, x^5 S-box,
Grain-LFSR round constants (same documented procedure as our BabyBear
instance — swap the table for byte-exact parity with an external stack).

BN254 scalars are 254-bit, far beyond any TPU lane type; this hashing tier
is host-side by design (outer proofs are tiny — the reference likewise
keeps BN254 hashing out of the throughput path and only accelerates it for
grinding). Values are Python ints.

Structure (Poseidon2 paper, t <= 3):
- external linear layer M_E = circ-like: t=2 -> [[2,1],[1,2]];
  t=3 -> [[2,1,1],[1,2,1],[1,1,2]]
- internal layer M_I = J + diag(d): t=2 -> d=(1,2); t=3 -> d=(1,1,2)
- 8 full rounds (4+4), 56 partial rounds, S-box x^5.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

from .grain import poseidon2_round_constants

# BN254 (alt_bn128) scalar field modulus
P_BN254 = (
    21888242871839275222246405745257275088548364400416034343698204186575808495617
)
N_BITS = 254
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 56

_INTERNAL_DIAG = {2: (1, 2), 3: (1, 1, 2)}


@lru_cache(maxsize=None)
def constants(t: int) -> Tuple[tuple, tuple, tuple]:
    """(external_initial, internal, external_final) for width t in {2, 3}."""
    assert t in (2, 3)
    ext_i, internal, ext_f = poseidon2_round_constants(
        P_BN254, N_BITS, t, FULL_ROUNDS, PARTIAL_ROUNDS
    )
    return (
        tuple(tuple(r) for r in ext_i),
        tuple(internal),
        tuple(tuple(r) for r in ext_f),
    )


def _sbox(x: int) -> int:
    x2 = x * x % P_BN254
    x4 = x2 * x2 % P_BN254
    return x4 * x % P_BN254


def _external(s: List[int]) -> List[int]:
    total = sum(s) % P_BN254
    return [(total + x) % P_BN254 for x in s]


def _internal(s: List[int], t: int) -> List[int]:
    d = _INTERNAL_DIAG[t]
    total = sum(s) % P_BN254
    return [(total + d[i] * s[i]) % P_BN254 for i in range(t)]


def permute(state: Sequence[int], t: int) -> List[int]:
    """Poseidon2 permutation on a length-t list of BN254 scalars."""
    assert len(state) == t
    ext_i, internal, ext_f = constants(t)
    s = _external(list(state))
    for rc in ext_i:
        s = _external([_sbox((x + c) % P_BN254) for x, c in zip(s, rc)])
    for c in internal:
        s[0] = _sbox((s[0] + c) % P_BN254)
        s = _internal(s, t)
    for rc in ext_f:
        s = _external([_sbox((x + c) % P_BN254) for x, c in zip(s, rc)])
    return s


def compress2(a: int, b: int) -> int:
    """2-to-1 compression via the width-3 permutation (capacity lane 0)."""
    return permute([a, b, 0], 3)[0]


def hash_scalars(vals: Sequence[int]) -> int:
    """Sponge hash of BN254 scalars: width 3, rate 2, capacity 1."""
    s = [0, 0, 0]
    buf = list(vals)
    for i in range(0, len(buf), 2):
        chunk = buf[i : i + 2]
        for j, v in enumerate(chunk):
            s[j] = v % P_BN254  # overwrite mode
        s = permute(s, 3)
    if not buf:
        s = permute(s, 3)
    return s[0]
