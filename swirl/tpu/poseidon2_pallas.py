"""Poseidon2-BabyBear-16 sponge hashing as a Pallas TPU kernel.

Layout: the batch (Merkle leaf index) rides the TPU lane+sublane axes as
(sub, 128) blocks (sub sublanes chosen by ``_pick_sub``, default 8-64);
the sponge state is a (16, sub, 128) VMEM scratch carried across absorb
steps. One grid step = one absorb (overwrite up to RATE=8 state rows) +
one full permutation. Rounds run in ``fori_loop``s with round constants
as kernel operands, keeping the Mosaic program small (~500 vector ops)
while the VPU does ~600 Montgomery multiplies per permutation on
(sub, 128) tiles (sub/8 independent permutation chains per vector op).

Grid: (column_tiles, absorb_chunks); the absorb loop is the *inner* grid
dimension, so the VMEM state scratch carries the sponge across chunks of
the same column tile (TPU grids execute sequentially, last axis fastest).

This kernel is the TPU-native equivalent of the reference CUDA kernels
``cuda/src/merkle_tree.cu`` + ``cuda/src/sponge.cu`` (Poseidon2 row hash +
digest-layer compression).

All values are Montgomery-form uint32 (see ``swirl/fields/jfield.py``); the
arithmetic inside the kernel reuses the same portable jnp Montgomery ops.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import jfield as jf
from ..hash.poseidon2 import DIGEST, RATE, WIDTH

TILE_SUB = 8
TILE_LANE = 128
TILE = TILE_SUB * TILE_LANE  # minimum batch elements per grid step


def _pick_sub(nt: int) -> int:
    """Sublane-tile count per grid step. Bigger blocks amortize grid-step
    overhead and give the VPU several independent permutation chains per
    vector op (each (sub, 128) op is sub/8 vregs); measured on v5e the
    per-step overhead dominates at sub=8. Env SWIRL_P2_SUB pins it for
    experiments."""
    env = int(os.environ.get("SWIRL_P2_SUB", "0"))
    if env:
        # An invalid override (not a positive multiple of TILE_SUB dividing
        # nt) would truncate the grid and silently skip column tiles —
        # validate hard instead of hashing garbage.
        if env <= 0 or env % TILE_SUB != 0 or nt % env != 0:
            raise ValueError(
                f"SWIRL_P2_SUB={env} invalid: need a positive multiple of "
                f"{TILE_SUB} that divides nt={nt}"
            )
        return env
    for sub in (64, 32, 16, 8):
        if nt % sub == 0:
            return sub
    return TILE_SUB


@lru_cache(maxsize=None)
def _mont_round_constants():
    """(ext_all (2*half, 16, 1), internal (n_partial, 1), diag (16, 1))
    Montgomery-form uint32 numpy arrays, kernel-operand shaped."""
    from ..hash.jposeidon2 import _mont_constants

    ext_init, internal, ext_final, diag = _mont_constants()
    ext_all = np.concatenate([ext_init, ext_final], axis=0)
    return (
        np.ascontiguousarray(ext_all, dtype=np.uint32),  # (2*half, 16)
        np.ascontiguousarray(internal[:, None], dtype=np.uint32),  # (13, 1)
        np.ascontiguousarray(diag[:, None], dtype=np.uint32),  # (16, 1)
    )


def _sbox(x):
    x2 = jf.mul(x, x)
    x4 = jf.mul(x2, x2)
    return jf.mul(jf.mul(x4, x2), x)


def _external_t(lanes):
    # lanes: tuple of 16 (8, 128) values; returns a new tuple (no stacking —
    # keeping the state as 16 separate vregs avoids a full-state relayout
    # copy per round)
    lanes = list(lanes)
    for c in range(4):
        x0, x1, x2, x3 = lanes[4 * c : 4 * c + 4]
        t01 = jf.add(x0, x1)
        t23 = jf.add(x2, x3)
        t0123 = jf.add(t01, t23)
        t01123 = jf.add(t0123, x1)
        t01233 = jf.add(t0123, x3)
        lanes[4 * c + 0] = jf.add(t01123, t01)
        lanes[4 * c + 1] = jf.add(t01123, jf.add(x2, x2))
        lanes[4 * c + 2] = jf.add(t01233, t23)
        lanes[4 * c + 3] = jf.add(t01233, jf.add(x0, x0))
    sums = [
        jf.add(jf.add(lanes[i], lanes[4 + i]), jf.add(lanes[8 + i], lanes[12 + i]))
        for i in range(4)
    ]
    return tuple(jf.add(lanes[j], sums[j % 4]) for j in range(16))


def _permute_tuple(lanes, ext_rc_ref, int_rc_ref, diag_ref, n_half: int,
                   n_partial: int):
    """lanes: tuple of 16 (8, 128) Monty values -> permuted tuple."""
    lanes = _external_t(lanes)

    def full_round(base):
        def body(r, lanes):
            return _external_t(
                tuple(
                    _sbox(jf.add(lanes[i], ext_rc_ref[base + r, i]))
                    for i in range(16)
                )
            )

        return body

    lanes = jax.lax.fori_loop(0, n_half, full_round(0), lanes)

    def partial_round(r, lanes):
        rc = int_rc_ref[r, 0]
        s0 = _sbox(jf.add(lanes[0], rc))
        s = (s0,) + lanes[1:]
        t = [jf.add(s[2 * i], s[2 * i + 1]) for i in range(8)]
        t = [jf.add(t[2 * i], t[2 * i + 1]) for i in range(4)]
        total = jf.add(jf.add(t[0], t[1]), jf.add(t[2], t[3]))
        return tuple(
            jf.add(jf.mul(s[i], diag_ref[i, 0]), total) for i in range(16)
        )

    lanes = jax.lax.fori_loop(0, n_partial, partial_round, lanes)
    return jax.lax.fori_loop(0, n_half, full_round(n_half), lanes)


def _hash_kernel(w: int, n_half: int, n_partial: int, in_ref, ext_rc_ref,
                 int_rc_ref, diag_ref, out_ref, state):
    """Grid step: absorb one RATE-chunk of up to 8 input rows, permute.

    in_ref: (RATE, sub, 128) block of the (w_pad, nt, 128) input
    out_ref: (DIGEST, sub, 128) digest block for this column tile
    state: (WIDTH, sub, 128) VMEM scratch carried across the chunk axis
    (sub sublane-tiles per grid step, chosen by ``_pick_sub``)
    """
    j = pl.program_id(1)
    num_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        state[...] = jnp.zeros_like(state)

    k_last = w - (num_chunks - 1) * RATE  # rows in the final (partial) chunk

    def absorb_and_permute(k: int):
        lanes = tuple(in_ref[i] for i in range(k)) + tuple(
            state[i] for i in range(k, WIDTH)
        )
        lanes = _permute_tuple(
            lanes, ext_rc_ref, int_rc_ref, diag_ref, n_half, n_partial
        )
        for i in range(WIDTH):
            state[i] = lanes[i]

    if k_last == RATE:
        absorb_and_permute(RATE)
    else:

        @pl.when(j < num_chunks - 1)
        def _():
            absorb_and_permute(RATE)

        @pl.when(j == num_chunks - 1)
        def _():
            absorb_and_permute(k_last)

    @pl.when(j == num_chunks - 1)
    def _():
        out_ref[...] = state[0:DIGEST]


@lru_cache(maxsize=None)
def _hash_cols_fn(w: int, interpret: bool, sub: int):
    num_chunks = max(1, -(-w // RATE))
    w_pad = num_chunks * RATE
    ext_rc, int_rc, diag = _mont_round_constants()
    n_half = ext_rc.shape[0] // 2
    n_partial = int_rc.shape[0]

    def run(matT):
        n = matT.shape[1]
        nt = n // TILE_LANE
        if w_pad != matT.shape[0]:
            matT = jnp.concatenate(
                [matT, jnp.zeros((w_pad - matT.shape[0], n), jnp.uint32)], axis=0
            )
        arr = matT.reshape(w_pad, nt, TILE_LANE)
        grid = (nt // sub, num_chunks)
        out = pl.pallas_call(
            partial(_hash_kernel, w, n_half, n_partial),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (RATE, sub, TILE_LANE),
                    lambda i, j: (j, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    ext_rc.shape, lambda i, j: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    int_rc.shape, lambda i, j: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    diag.shape, lambda i, j: (0, 0), memory_space=pltpu.SMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (DIGEST, sub, TILE_LANE),
                lambda i, j: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((DIGEST, nt, TILE_LANE), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((WIDTH, sub, TILE_LANE), jnp.uint32)],
            interpret=interpret,
        )(arr, ext_rc, int_rc, diag)
        return out.reshape(DIGEST, n)

    # interpret mode runs eagerly: jitting would fold the kernel into one
    # giant XLA CPU program; eager interpretation is slow but only tests
    # use it.
    return run if interpret else jax.jit(run)


def usable(w: int, n: int) -> bool:
    from . import pallas_mode

    return pallas_mode() != "off" and n % TILE == 0 and n >= TILE and w > 0


def hash_cols(matT) -> jnp.ndarray:
    """(w, n) Monty matrix -> (8, n) column digests via the Pallas kernel.

    Caller must check :func:`usable` first.
    """
    from . import pallas_mode

    w = int(matT.shape[0])
    nt = int(matT.shape[1]) // TILE_LANE
    return _hash_cols_fn(w, pallas_mode() == "interpret", _pick_sub(nt))(matT)


def _compress_kernel(n_half: int, n_partial: int, in_ref, ext_rc_ref,
                     int_rc_ref, diag_ref, out_ref):
    """(WIDTH, sub, 128) digest-pair block -> single truncated permutation.

    The Merkle 2-to-1 compression is ONE Poseidon2 permutation of the
    concatenated digests (``compress_np``), NOT a rate-8 sponge absorb of
    16 values — the two differ in both permutation count and capacity
    handling.
    """
    lanes = tuple(in_ref[i] for i in range(WIDTH))
    lanes = _permute_tuple(
        lanes, ext_rc_ref, int_rc_ref, diag_ref, n_half, n_partial
    )
    for i in range(DIGEST):
        out_ref[i] = lanes[i]


@lru_cache(maxsize=None)
def _compress_cols_fn(interpret: bool, sub: int):
    ext_rc, int_rc, diag = _mont_round_constants()
    n_half = ext_rc.shape[0] // 2
    n_partial = int_rc.shape[0]

    def run(pairs):
        n = pairs.shape[1]
        nt = n // TILE_LANE
        arr = pairs.reshape(WIDTH, nt, TILE_LANE)
        out = pl.pallas_call(
            partial(_compress_kernel, n_half, n_partial),
            grid=(nt // sub,),
            in_specs=[
                pl.BlockSpec(
                    (WIDTH, sub, TILE_LANE),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    ext_rc.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    int_rc.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    diag.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (DIGEST, sub, TILE_LANE),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((DIGEST, nt, TILE_LANE), jnp.uint32),
            interpret=interpret,
        )(arr, ext_rc, int_rc, diag)
        return out.reshape(DIGEST, n)

    return run if interpret else jax.jit(run)


def compress_cols(pairs) -> jnp.ndarray:
    """(16, n) lane-major digest pairs -> (8, n): one truncated permutation
    per pair (``compress_np`` semantics)."""
    from . import pallas_mode

    nt = int(pairs.shape[1]) // TILE_LANE
    return _compress_cols_fn(pallas_mode() == "interpret", _pick_sub(nt))(pairs)


def _tower_kernel(levels: int, n_half: int, n_partial: int, in_ref,
                  ext_rc_ref, int_rc_ref, diag_ref, *out_refs):
    """One grid step: fold a bit-reversed (8, n) digest layer to the root.

    Writes every intermediate layer (n/2, n/4, ..., 1) — Merkle query proofs
    need all of them. The input lanes hold leaf ``bitrev(p)`` at position
    ``p``; in that order the natural pairing (2i, 2i+1) is exactly (first
    half, second half), so every level is two contiguous lane-halves and a
    concatenate — Mosaic has no lane-deinterleave. Outputs stay
    bit-reversed; the caller un-permutes (small XLA gathers).
    """
    n = in_ref.shape[1]
    cur = in_ref[...]  # (8, n) bit-reversed; live prefix shrinks per level
    live = n
    for lvl in range(levels):
        m2 = live // 2
        if m2 % TILE_LANE == 0:
            # tile-aligned halves: plain lane slices
            pairs = jnp.concatenate([cur[:, :m2], cur[:, m2:]], axis=0)
            cur_w = m2
        else:
            # sub-tile levels: stay at full 128-lane width (garbage lanes
            # beyond the live prefix) — Mosaic has no lane-deinterleave and
            # can't concat lane-offset slices, but roll is native
            w = cur.shape[1]
            right = pltpu.roll(cur, shift=w - m2, axis=1)
            pairs = jnp.concatenate([cur, right], axis=0)
            cur_w = w
        lanes = tuple(pairs[i : i + 1] for i in range(WIDTH))
        lanes = _permute_tuple(
            lanes, ext_rc_ref, int_rc_ref, diag_ref, n_half, n_partial
        )
        cur = jnp.concatenate(lanes[:DIGEST], axis=0)  # (8, cur_w)
        out_refs[lvl][...] = cur[:, :m2]
        live = m2


@lru_cache(maxsize=None)
def _tower_fn(n: int, interpret: bool):
    levels = n.bit_length() - 1
    ext_rc, int_rc, diag = _mont_round_constants()
    n_half = ext_rc.shape[0] // 2
    n_partial = int_rc.shape[0]

    def run(digests):
        # device-computed bit-reversal permutation (jf.bitrev_perm_dev):
        # a host _bitrev table here is a 2^levels int32 literal per program
        d_br = jnp.take(digests, jf.bitrev_perm_dev(levels), axis=1)
        outs = pl.pallas_call(
            partial(_tower_kernel, levels, n_half, n_partial),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(levels)
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct((DIGEST, n >> (lvl + 1)), jnp.uint32)
                for lvl in range(levels)
            ),
            interpret=interpret,
        )(d_br, ext_rc, int_rc, diag)
        outs = [outs] if levels == 1 else list(outs)
        # back to natural order: layer lvl stores node bitrev(p) at p
        return [
            jnp.take(layer, jf.bitrev_perm_dev(levels - 1 - lvl), axis=1)
            for lvl, layer in enumerate(outs)
        ]

    return run if interpret else jax.jit(run)


def tower_usable(n: int) -> bool:
    from . import pallas_mode

    return pallas_mode() != "off" and 256 <= n <= 8 * TILE and (n & (n - 1)) == 0


def compress_tower(digests) -> list:
    """(8, n) lane-major digests -> [(8, n/2), ..., (8, 1)] tower layers in
    one kernel launch. Caller must check :func:`tower_usable` first."""
    from . import pallas_mode

    n = int(digests.shape[1])
    return _tower_fn(n, pallas_mode() == "interpret")(digests)
