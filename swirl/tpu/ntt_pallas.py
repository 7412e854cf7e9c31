"""Four-step Stockham NTT over BabyBear as Pallas TPU kernels.

The batched radix-2 XLA NTT (``swirl/prover/ntt.py``) materializes the full
array once per butterfly stage (log N HBM passes). This kernel family brings
the large-N transform down to ~2 HBM passes:

  N = n1 * n2,  x[j1*n2 + j2]  (row-major (n1, n2) view per column)

  kernel 1 (grid over (j2 tiles, batch)):
     load (n1, 128) block  ->  n1-point Stockham NTT along sublanes
     ->  * w_N^(k1*j2) four-step twiddle block  ->  transpose
     ->  store to A_T (n2, n1)
  kernel 2 (grid over (k1 tiles, batch)):
     load (n2, 128) block of A_T -> n2-point Stockham NTT along sublanes
     ->  store; the (n2, n1) result read row-major IS the natural-order NTT.

The Stockham ladder keeps both input and output of every stage in natural
order (state (r, l): split rows in halves, butterfly, concatenate the two
halves along the transform-count axis), so no bit-reversal gather ever
touches the minor (lane) axis — the whole transform is sublane reshapes +
VPU Montgomery arithmetic on full (8, 128) tiles in VMEM.

Inverse transforms reuse the same ladder with w -> w^-1, and the 1/N scale
is folded into the four-step twiddle matrix (every element crosses kernel 1
exactly once).

TPU-native peer of the reference's sppark-derived CUDA NTT
(``cuda-backend/cuda/supra/ntt.cu``); algorithmically a textbook four-step
Stockham, not a port.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import jfield as jf
from ..fields.babybear import P, two_adic_generator

LANE = 128
# Scoped-VMEM budget for the NTT kernels. The default Mosaic limit (16 MB)
# is exceeded by the unrolled Stockham ladder's live stage buffers at
# n2 = 2^12 (observed 16.9 MB on v5e); the hardware has 128 MB of VMEM,
# so grant the ladder headroom explicitly.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
# minimum log-size for which the four-step kernel engages; below this the
# XLA butterfly path is already cheap.
MIN_LOG_N = 16
# single-level four-step ceiling: at 2^26 the kernel-2 block (1, n2, LANE)
# plus its output fill ~16 MB of VMEM (n2 = 2^13 -> 2 x 4 MB + twiddles).
MAX_LOG_N = 26
# beyond that, the n2-point transforms recurse through a second four-step
# level (one extra HBM transpose pass); matches the reference CUDA ceiling
# 2^27 (cuda-backend/src/cuda/ntt.rs:8) and extends to 2^28.
MAX_RECURSE_LOG_N = 28


def _split(log_n: int) -> tuple:
    """Balanced n1*n2 split with n1 <= n2 (kernel 1 also holds the twiddle
    block and a transpose, so it gets the smaller factor)."""
    ln1 = log_n // 2
    return ln1, log_n - ln1


@lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool) -> tuple:
    """Per-stage Stockham twiddle columns, each a (half_s, 1) Monty array.

    Stage s transforms blocks of size r = n >> s; its half = r/2 twiddles are
    w_n^((n/r) * j), j < r/2. Separate operands (not one packed table) so
    every kernel slice starts at lane offset 0 — Mosaic cannot broadcast a
    lane-offset column across lanes.
    """
    n = 1 << log_n
    w = two_adic_generator(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    master = np.empty(max(n // 2, 1), dtype=np.uint64)
    acc = 1
    for i in range(max(n // 2, 1)):
        master[i] = acc
        acc = (acc * w) % P
    cols = []
    for s in range(log_n):
        r = n >> s
        half = r >> 1
        cols.append(jf.const_arr(master[:: n // r][:half].reshape(half, 1)))
    return tuple(cols)


def _four_step_twiddles(log_n: int, inverse: bool, scale_inv_n: bool):
    """(n1, n2) Monty matrix T[k1, j2] = w_N^(k1*j2) (times 1/N if asked).

    Computed ON DEVICE inside the trace: wk1 = w^k1 by log-depth doubling,
    then T accumulates wk1^(2^b) into the columns whose j2 has bit b set
    (ln2 elementwise passes). A host table here would bake an O(N) literal
    into every executable — 32 MB at N = 2^23 — which bloated cached
    executables to ~200 MB and made warm compile-cache loads take minutes.
    The device computation is O(log N) traced equations and ~ln2 * n1 * n2
    VPU multiplies, negligible against the transform itself.
    """
    ln1, ln2 = _split(log_n)
    n1, n2 = 1 << ln1, 1 << ln2
    w = two_adic_generator(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    wk1 = jf.powers_dev(jf.const(w), n1)  # (n1,) Monty
    scale = pow(1 << log_n, P - 2, P) if scale_inv_n else 1
    t = jnp.full((n1, n2), jf.const(scale), jnp.uint32)
    j2 = jax.lax.iota(jnp.uint32, n2)
    base = wk1  # wk1^(2^b)
    one = jnp.full((1, 1), jf.const(1), jnp.uint32)
    for b in range(ln2):
        bit = ((j2 >> b) & jnp.uint32(1)).astype(jnp.bool_)
        factor = jnp.where(bit[None, :], base[:, None], one)
        t = jf.mul(t, factor)
        base = jf.mul(base, base)
    return t


def _sub_ntt(x, tw_refs, log_n: int):
    """Stockham NTT of every lane-column of x (n, LANE) along the sublanes.

    tw_refs: per-stage (half_s, 1) twiddle refs. Natural order in and out;
    the ladder is unrolled at trace time (log_n stages).
    """
    n = 1 << log_n
    lanes = x.shape[1]
    state = x.reshape(n, 1, lanes)
    for s in range(log_n):
        r = n >> s
        half = r >> 1
        a = state[:half]
        b = state[half:]
        tw = tw_refs[s][...].reshape(half, 1, 1)
        top = jf.add(a, b)
        bot = jf.mul(jf.sub(a, b), tw)
        state = jnp.concatenate([top, bot], axis=1)  # (half, 2l, lanes)
    return state.reshape(n, lanes)


def _kernel1(ln1: int, in_ref, *rest):
    """(1, n1, LANE) input block -> sub-NTT -> *T block -> transposed store."""
    tw_refs, (t_ref, out_ref) = rest[:ln1], rest[ln1:]
    x = in_ref[0]
    y = _sub_ntt(x, tw_refs, ln1)
    y = jf.mul(y, t_ref[...])
    out_ref[0] = jnp.transpose(y)


def _kernel2(ln2: int, in_ref, *rest):
    """(1, n2, LANE) block of A_T -> sub-NTT -> store (final layout)."""
    tw_refs, (out_ref,) = rest[:ln2], rest[ln2:]
    x = in_ref[0]
    out_ref[0] = _sub_ntt(x, tw_refs, ln2)


@lru_cache(maxsize=None)
def _ntt_fn(log_n: int, batch: int, inverse: bool, scale_inv_n: bool,
            interpret: bool):
    ln1, ln2 = _split(log_n)
    n1, n2 = 1 << ln1, 1 << ln2
    tw1 = _stage_twiddles(ln1, inverse)
    tw2 = _stage_twiddles(ln2, inverse)

    const2 = lambda arr: pl.BlockSpec(
        arr.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )

    def run(x):
        # x: (batch, N) Monty uint32. The four-step twiddle matrix is traced
        # per call (device-computed, see _four_step_twiddles) so it must be
        # built inside run(), not captured in the lru_cached closure.
        t_mat = _four_step_twiddles(log_n, inverse, scale_inv_n)
        xm = x.reshape(batch, n1, n2)
        a_t = pl.pallas_call(
            partial(_kernel1, ln1),
            grid=(n2 // LANE, batch),
            in_specs=[
                pl.BlockSpec(
                    (1, n1, LANE), lambda i, j: (j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                *[const2(t) for t in tw1],
                pl.BlockSpec(
                    (n1, LANE), lambda i, j: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, LANE, n1), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, n2, n1), jnp.uint32),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(xm, *tw1, t_mat)
        out = pl.pallas_call(
            partial(_kernel2, ln2),
            grid=(n1 // LANE, batch),
            in_specs=[
                pl.BlockSpec(
                    (1, n2, LANE), lambda i, j: (j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                *[const2(t) for t in tw2],
            ],
            out_specs=pl.BlockSpec(
                (1, n2, LANE), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, n2, n1), jnp.uint32),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(a_t, *tw2)
        return out.reshape(batch, n1 * n2)

    return run


def usable(shape, ext: bool) -> bool:
    """True when the four-step kernel supports an ntt() call of this shape.

    Base field: (batch, N). Extension field: (batch, N, 4) — EF NTTs are
    four independent base-field transforms (the two-adic twiddles live in
    F_p), run through :func:`ntt_ext`.
    """
    from . import pallas_mode

    if pallas_mode() == "off":
        return False
    if ext:
        if len(shape) != 3 or shape[-1] != 4:
            return False
        n = shape[-2]
    else:
        if len(shape) != 2:
            return False
        n = shape[-1]
    log_n = n.bit_length() - 1
    if (1 << log_n) != n or not (MIN_LOG_N <= log_n <= MAX_RECURSE_LOG_N):
        return False
    ln1, ln2 = _split(min(log_n, MAX_LOG_N))
    return (1 << ln1) % LANE == 0 and (1 << ln2) % LANE == 0


def _kernel1_only(log_n: int, batch: int, inverse: bool, scale_inv_n: bool,
                  interpret: bool):
    """First four-step level for the recursive (> MAX_LOG_N) path: sub-NTT
    over j1 + four-step twiddle, producing A_T (batch, n2, n1)."""
    ln1, ln2 = _split(log_n)
    n1, n2 = 1 << ln1, 1 << ln2
    tw1 = _stage_twiddles(ln1, inverse)

    const2 = lambda arr: pl.BlockSpec(
        arr.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )

    def run(x):
        t_mat = _four_step_twiddles(log_n, inverse, scale_inv_n)
        xm = x.reshape(batch, n1, n2)
        return pl.pallas_call(
            partial(_kernel1, ln1),
            grid=(n2 // LANE, batch),
            in_specs=[
                pl.BlockSpec(
                    (1, n1, LANE), lambda i, j: (j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                *[const2(t) for t in tw1],
                pl.BlockSpec(
                    (n1, LANE), lambda i, j: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, LANE, n1), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, n2, n1), jnp.uint32),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(xm, *tw1, t_mat)

    return run


def ntt(x, inverse: bool = False, scale_inv_n: bool = False):
    """Natural-order NTT along axis -1 of a (batch, N) Monty array.

    N <= 2^26 runs the two-kernel four-step (~2 HBM passes). Larger N
    recurses: level-1 kernel produces the twiddled transpose, the n2-point
    transforms run as a second four-step level over a reshaped batch (one
    extra HBM transpose pass each way).
    """
    from . import pallas_mode

    interp = pallas_mode() == "interpret"
    batch, n = int(x.shape[0]), int(x.shape[1])
    log_n = n.bit_length() - 1
    if log_n <= MAX_LOG_N:
        return _ntt_fn(log_n, batch, inverse, scale_inv_n, interp)(x)
    assert log_n <= MAX_RECURSE_LOG_N, log_n
    ln1, ln2 = _split(log_n)
    n1, n2 = 1 << ln1, 1 << ln2
    a_t = _kernel1_only(log_n, batch, inverse, scale_inv_n, interp)(x)
    # A_T: (batch, n2, n1) = [j2, k1]; need n2-point NTTs along j2 per k1.
    b = jnp.transpose(a_t, (0, 2, 1)).reshape(batch * n1, n2)
    z = _ntt_fn(ln2, batch * n1, inverse, False, interp)(b)
    # Z: (batch*n1, n2) = [k1, k2]; natural order is X[k1 + n1*k2].
    z = z.reshape(batch, n1, n2)
    return jnp.transpose(z, (0, 2, 1)).reshape(batch, n1 * n2)


def ntt_ext(x, inverse: bool = False, scale_inv_n: bool = False):
    """EF4-valued NTT along axis -2 of a (batch, N, 4) Monty array.

    The two-adic subgroup lies in F_p, so the transform acts coefficient-
    wise: four independent base-field NTTs over the coefficient planes
    (this is exactly how the reference's WHIR codeword commits use the
    base NTT machinery, cuda-backend/src/whir.rs)."""
    batch, n, d = int(x.shape[0]), int(x.shape[1]), int(x.shape[2])
    assert d == 4
    planes = jnp.transpose(x, (0, 2, 1)).reshape(batch * d, n)
    out = ntt(planes, inverse=inverse, scale_inv_n=scale_inv_n)
    return jnp.transpose(out.reshape(batch, d, n), (0, 2, 1))
