"""Merkle tree over Poseidon2 digests, built on device (JAX).

Layout mirrors the stacked-PCS commitment scheme of the reference
(``crates/stark-backend/src/prover/stacked_pcs.rs:413``): rows of the
codeword matrix are leaf-hashed; the first log2(rows_per_query) compression
levels pair rows at stride ``query_stride = num_leaves / rows_per_query``
(so one query index opens 2^k_whir coset-aligned rows with one path), and
the remaining levels are plain binary compression whose layers are retained
for query proofs.

Digest layers are *lane-major* (8, n) device arrays: the batch index rides
the TPU's 128-wide lane axis so leaf hashing and compression run in the
Pallas Poseidon2 kernel (``swirl/tpu/poseidon2_pallas.py``) at full VPU
occupancy, and the codeword matrix feeds the leaf hash without a transpose
(it is already (width, height)).

Query-proof extraction gathers all requested siblings per layer in one
batched op (one small D2H per layer), which keeps host<->device traffic
tiny even at 2^24 leaves.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np
import jax.numpy as jnp

from ..fields import jfield as jf
from ..hash import jposeidon2 as jp2
from .errors import StackedPcsError


@dataclass
class MerkleTree:
    """Digest layers on device (Monty form, lane-major (8, n_i));
    ``layers[0]`` has ``num_leaves / rows_per_query`` digests, the last
    layer is the root."""

    layers: List[jnp.ndarray]  # each (8, n_i) uint32 Monty
    rows_per_query: int

    @property
    def root(self) -> np.ndarray:
        """Root digest as canonical uint64 host array (8,)."""
        return jf.to_host(self.layers[-1][:, 0])

    @property
    def query_stride(self) -> int:
        return int(self.layers[0].shape[1])

    @property
    def proof_depth(self) -> int:
        return len(self.layers) - 1

    def batch_query_proofs(self, indices) -> List[List[np.ndarray]]:
        """Merkle paths for many query indices; one gather+transfer per layer.

        Returns proofs[qi][level] = sibling digest (8,): canonical uint64 in
        host mode, traced Monty in the fused prover's trace mode (indices
        are then traced scalars).
        """
        from .vmode import vm

        v = vm()
        if v.is_trace:
            cur = jnp.stack([jnp.asarray(i, jnp.uint32) for i in indices])
        else:
            cur = np.asarray(indices, dtype=np.int64)
            if not np.all((0 <= cur) & (cur < self.query_stride)):
                raise StackedPcsError(
                    "MerkleTree.query_proof: query index out of bounds"
                )
        per_level = []
        for layer in self.layers[:-1]:
            sib = jnp.take(layer, jnp.asarray(cur ^ 1), axis=1)  # (8, nq)
            per_level.append(v.f(sib).T)  # (nq, 8)
            cur = cur >> 1
        return [
            [per_level[lvl][qi] for lvl in range(len(per_level))]
            for qi in range(len(indices))
        ]

    def query_proof(self, index: int) -> List[np.ndarray]:
        return self.batch_query_proofs([index])[0]

    def batch_query_proofs_arr(self, indices):
        """Trace-mode batched variant: ONE (nq, depth, 8) array instead of
        nq*depth separate digest slices — the per-leaf materialization
        dominated the fused WHIR program's op count. Leaf iteration order
        matches :meth:`batch_query_proofs` (query-major, then level)."""
        cur = _idx_vec(indices)
        per_level = []
        for layer in self.layers[:-1]:
            sib = jnp.take(layer, jnp.asarray(cur ^ 1), axis=1)  # (8, nq)
            per_level.append(sib.T)  # (nq, 8)
            cur = cur >> 1
        return jnp.stack(per_level, axis=1)  # (nq, depth, 8)


def _leaf_hashes(matrix, ext: bool):
    """Column-wise digests (8, height) of the backing matrix.

    matrix: device array (width, height) base field, or (width, height, 4)
    extension field; a logical leaf concatenates all width entries (EF
    coeffs flattened) at one height position.
    """
    if ext:
        w, h, d = matrix.shape
        cols = jnp.transpose(matrix, (0, 2, 1)).reshape(w * d, h)
    else:
        cols = matrix
    return jp2.hash_cols(cols)  # (8, h)


def build_merkle_tree(matrix, rows_per_query: int, ext: bool = False) -> MerkleTree:
    """Build the digest-layer stack for a (width, height[, 4]) matrix."""
    height = matrix.shape[1]
    if height <= 0 or height & (height - 1) != 0:
        raise StackedPcsError("MerkleTree: height must be a positive power of two")
    if rows_per_query & (rows_per_query - 1) != 0:
        raise StackedPcsError(
            f"MerkleTree: rows_per_query ({rows_per_query}) is not a power of two"
        )
    if rows_per_query > height:
        raise StackedPcsError(
            f"MerkleTree: rows_per_query ({rows_per_query}) exceeds leaves ({height})"
        )

    from ..parallel import annotate

    digests = annotate.rows(_leaf_hashes(matrix, ext), axis=1)  # (8, height)
    query_stride = height // rows_per_query
    # strided pairing: query index y combines row groups 2x and 2x+1
    cur = digests
    n = height
    while n > query_stride:
        half = n // 2
        grouped = cur.reshape(8, half // query_stride, 2, query_stride)
        left = grouped[:, :, 0].reshape(8, half)
        right = grouped[:, :, 1].reshape(8, half)
        cur = jp2.compress_cols(jnp.concatenate([left, right], axis=0))
        n = half
    layers = [cur] + jp2.merkle_tower(cur)
    return MerkleTree(layers=layers, rows_per_query=rows_per_query)


def _idx_vec(indices):
    """Query indices as an (nq,) uint32 array: accepts a list of traced
    scalars or an already-batched array (sample_bits_batch)."""
    if isinstance(indices, (list, tuple)):
        return jnp.stack([jnp.asarray(i, jnp.uint32) for i in indices])
    return jnp.asarray(indices, jnp.uint32)


def get_opened_rows_batch(matrix, indices, rows_per_query: int, ext: bool):
    """Trace-mode batched variant of :func:`get_opened_rows`: one gather for
    ALL queries. Returns (nq, rows_per_query, width[, 4]) traced Monty."""
    height = matrix.shape[1]
    query_stride = height // rows_per_query
    idx = _idx_vec(indices)  # (nq,)
    row_ids = idx[:, None] + jnp.uint32(query_stride) * jnp.arange(
        rows_per_query, dtype=jnp.uint32
    )
    g = jnp.take(matrix, row_ids.reshape(-1), axis=1)
    nq = int(idx.shape[0])
    if ext:
        w = matrix.shape[0]
        return g.reshape(w, nq, rows_per_query, 4).transpose(1, 2, 0, 3)
    w = matrix.shape[0]
    return g.reshape(w, nq, rows_per_query).transpose(1, 2, 0)


def get_opened_rows(matrix, index, rows_per_query: int, ext: bool):
    """Rows {index + t*query_stride : t in 0..rows_per_query} of the backing
    matrix as (rows_per_query, width[, 4]) — canonical host array in host
    mode, traced Monty in trace mode (index then a traced scalar)."""
    from .vmode import vm

    v = vm()
    height = matrix.shape[1]
    query_stride = height // rows_per_query
    row_ids = index + query_stride * np.arange(rows_per_query)
    gathered = jnp.take(matrix, jnp.asarray(row_ids), axis=1)
    host = v.f(gathered)  # (width, rpq[, 4])
    if ext:
        return host.transpose(1, 0, 2)
    return host.transpose(1, 0)
