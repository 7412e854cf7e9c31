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


# Static batch-element threshold below which `permute` unrolls its rounds.
# A fori_loop round is one device `while` iteration; on (16,) transcript
# states and small query-path batches the while launch overhead dwarfs the
# ~20 VPU ops of actual work (TPU profile: ~0.1-0.3ms per while at batch
# <= 128, x327 calls in the WHIR query phase alone). Large tower batches
# keep the rolled form so Merkle jits stay ~20x smaller.
_PERMUTE_UNROLL_MAX = 256


def permute(state, unroll: bool | None = None):
    """Poseidon2 permutation on (..., 16) Monty-form uint32 arrays.

    Rounds run under ``lax.fori_loop`` for large batches (rounds are
    sequentially dependent anyway), keeping the traced graph ~20x smaller
    than full unrolling — important because Merkle towers inline many
    permutations per jit. Small batches (static size <=
    ``_PERMUTE_UNROLL_MAX``) unroll instead: three device whiles per
    permutation is pure launch overhead there.
    """
    ext_init, internal, ext_final, diag = _mont_constants()
    ext_init_d = jnp.asarray(ext_init)
    internal_d = jnp.asarray(internal)
    ext_final_d = jnp.asarray(ext_final)
    diag_d = jnp.asarray(diag)

    if unroll is None:
        n = 1
        for d in jnp.shape(state)[:-1]:
            n *= int(d)
        unroll = n <= _PERMUTE_UNROLL_MAX

    s = _external(state)

    if unroll:
        for rc in ext_init:
            s = _external(_sbox(jf.add(s, jnp.asarray(rc))))
        for rc in internal:
            s0 = _sbox(jf.add(s[..., 0], jnp.asarray(rc)))
            s = jnp.concatenate([s0[..., None], s[..., 1:]], axis=-1)
            s = _internal(s, diag_d)
        for rc in ext_final:
            s = _external(_sbox(jf.add(s, jnp.asarray(rc))))
        return s

    def full_round(consts):
        def body(r, s):
            rc = jax.lax.dynamic_index_in_dim(consts, r, 0, keepdims=False)
            return _external(_sbox(jf.add(s, rc)))

        return body

    s = jax.lax.fori_loop(0, ext_init_d.shape[0], full_round(ext_init_d), s)

    def partial_round(r, s):
        rc = jax.lax.dynamic_index_in_dim(internal_d, r, 0, keepdims=False)
        s0 = _sbox(jf.add(s[..., 0], rc))
        s = jnp.concatenate([s0[..., None], s[..., 1:]], axis=-1)
        return _internal(s, diag_d)

    s = jax.lax.fori_loop(0, internal_d.shape[0], partial_round, s)
    s = jax.lax.fori_loop(0, ext_final_d.shape[0], full_round(ext_final_d), s)
    return s


from functools import partial


@lru_cache(maxsize=None)
def permute_shared():
    """The permutation as a jitted callee in ROLLED form (fori_loop over
    rounds, ~3 KB MLIR per batch shape): call sites inside larger traced
    programs would otherwise inline the unrolled rounds per site (~54 KB
    each, and a Merkle tower has one distinct batch shape per level) — the
    dominant share of the region programs' MLIR against the remote compile
    helper's size ceiling. Same field values; the hot commit path keeps the
    Pallas kernels."""
    return jax.jit(partial(permute, unroll=False))


# When a traced program must stay under the remote compile helper's size
# ceiling (region programs, swirl/prover/regions.py), the lane-major
# dispatchers below route to the shared-callee XLA fallback instead of the
# Pallas kernels: each pallas_call embeds a ~190 KB (2.4 MB for the tower)
# Mosaic payload PER CALL SITE. Toggled per trace via compact_lowering().
_COMPACT = [False]


class compact_lowering:
    def __enter__(self):
        self._prev = _COMPACT[0]
        _COMPACT[0] = True

    def __exit__(self, *exc):
        _COMPACT[0] = self._prev
        return False


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
        state = permute_shared()(state)
    return state[:, :DIGEST]


@jax.jit
def compress_pairs(left, right):
    """(n, 8), (n, 8) -> (n, 8) via truncated permutation."""
    state = jnp.concatenate([left, right], axis=-1)
    return permute_shared()(state)[:, :DIGEST]


# ---------------------------------------------------------------------------
# Lane-major dispatchers: (w, n) column hashing with the batch on the TPU's
# 128-wide lane axis. Routed to the Pallas kernel (swirl/tpu) when usable
# (TPU or interpret mode, n a multiple of its tile); otherwise falls back to
# the row-major spec above via transposes (cheap at small n).
# ---------------------------------------------------------------------------


def hash_cols(matT):
    """Hash each *column* of a (w, n) Monty-form matrix -> (8, n) digests.

    Equivalent to ``hash_rows(matT.T).T``.
    """
    from ..tpu import poseidon2_pallas as pp

    w, n = int(matT.shape[0]), int(matT.shape[1])
    if not _COMPACT[0] and pp.usable(w, n):
        return pp.hash_cols(matT)
    return jnp.transpose(hash_rows(jnp.transpose(matT)))


def compress_cols(pairs):
    """(16, n) lane-major digest pairs -> (8, n)."""
    from ..tpu import poseidon2_pallas as pp

    n = int(pairs.shape[1])
    if not _COMPACT[0] and pp.usable(WIDTH, n):
        return pp.compress_cols(pairs)
    return jnp.transpose(permute_shared()(jnp.transpose(pairs))[:, :DIGEST])


def merkle_tower_scan(digests) -> list:
    """All binary-compression layers above a (8, n) lane-major digest layer
    as ONE ``lax.scan`` over a fixed (8, n/2)-pair buffer.

    Every level shares a single traced step body (the per-level distinct
    shapes otherwise lower one ~11 KB permute callee EACH — a 2^19-leaf
    tower cost ~500 KB of MLIR, the compile-helper ceiling problem). The
    valid prefix front-aligns and halves each step; tail slots compress
    garbage, which is masked out by the static per-level crops at the end.
    Total compute is ~log2(n)/2 x the true tower work — irrelevant for the
    region-program trees this serves. Bit-identical digests to
    :func:`merkle_tower`."""
    n = int(digests.shape[1])
    if n <= 2:
        return merkle_tower(digests)
    levels = n.bit_length() - 1
    m = n // 2

    def step(cur, _):
        left = cur[:, 0::2]
        right = cur[:, 1::2]
        comp = compress_cols(jnp.concatenate([left, right], axis=0))
        nxt = jnp.concatenate(
            [comp, jnp.zeros((DIGEST, n - m), jnp.uint32)], axis=1
        )
        return nxt, comp

    _, ys = jax.lax.scan(step, digests, None, length=levels)
    return [ys[j][:, : n >> (j + 1)] for j in range(levels)]


def merkle_tower(digests) -> list:
    """All binary-compression layers above a (8, n) lane-major digest layer,
    down to the (8, 1) root.

    Large layers compress one level per kernel; once a layer fits the Pallas
    tower kernel (n <= 8 KiB digests) the remaining log2(n) levels run in a
    single launch (small layers would otherwise each pay a dispatch and fall
    off the Pallas tile-size floor). Under :class:`compact_lowering` the
    whole tower runs as one fixed-buffer scan instead (shared step body)."""
    from ..tpu import poseidon2_pallas as pp

    if _COMPACT[0]:
        return merkle_tower_scan(digests)
    layers = []
    cur = digests
    while cur.shape[1] > 1:
        n = int(cur.shape[1])
        if pp.tower_usable(n):
            tail = pp.compress_tower(cur)
            layers.extend(tail)
            return layers
        prev = cur.reshape(DIGEST, n // 2, 2)
        pairs = jnp.concatenate([prev[:, :, 0], prev[:, :, 1]], axis=0)
        cur = compress_cols(pairs)
        layers.append(cur)
    return layers
