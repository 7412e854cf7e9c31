"""Fully-jitted stacked-commit kernel: RS encode + Merkle tree in one XLA
program (one dispatch per commit instead of hundreds of eager ops).

Used by the benchmark and by high-throughput proving paths; the layout-aware
``stacked_pcs.stacked_commit`` remains the general entry point.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import jfield as jf
from ..hash import jposeidon2 as jp2
from .ntt import ntt
from .stacked_pcs import rs_message


@lru_cache(maxsize=None)
def _jitted(l_skip: int, log_blowup: int, k_whir: int, width: int, height: int):
    blow = 1 << log_blowup

    def kernel(stacked):
        msg = rs_message(l_skip, stacked)
        padded = jnp.concatenate(
            [msg, jnp.zeros((width, height * (blow - 1)), jnp.uint32)], axis=1
        )
        code = ntt(padded)
        digests = jp2.hash_cols(code)  # lane-major (8, n), Pallas on TPU
        n = height * blow
        stride = n >> k_whir
        cur = digests
        # strided pairing for the first k_whir levels (query grouping)
        while cur.shape[1] > stride:
            half = cur.shape[1] // 2
            grouped = cur.reshape(8, half // stride, 2, stride)
            pairs = jnp.concatenate(
                [grouped[:, :, 0].reshape(8, half), grouped[:, :, 1].reshape(8, half)],
                axis=0,
            )
            cur = jp2.compress_cols(pairs)
        layers = [cur] + jp2.merkle_tower(cur)
        return code, layers

    return jax.jit(kernel)


def commit_kernel(l_skip: int, log_blowup: int, k_whir: int, stacked):
    """Returns (codeword matrix, digest layers list) for one stacked matrix.

    Jit-cached per shape; subsequent commits of the same shape reuse the
    compiled program.
    """
    w, h = int(stacked.shape[0]), int(stacked.shape[1])
    return _jitted(l_skip, log_blowup, k_whir, w, h)(stacked)
