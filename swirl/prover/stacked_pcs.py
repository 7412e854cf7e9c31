"""Stacked polynomial commitment: greedy column stacking + RS encode + Merkle.

Reimplements the stacked PCS of the reference
(``crates/stark-backend/src/prover/stacked_pcs.rs``) TPU-first:

- The layout (which trace column lands where in the stacked matrix) is pure
  host metadata computed once per proof shape.
- Stacking itself is a single device gather driven by a precomputed index
  map, so heterogeneous trace heights become one static-shape operation.
- RS encoding is a batched device pipeline: per-column iDFT on the
  univariate-skip domain chunks, subset-zeta transform over the low l_skip
  index bits (the eval-to-coeff RS message), zero-pad by the blowup and one
  big batched NTT.
- The Merkle tree hashes rows with 2^k_whir rows per query leaf-group.

Matrices are device arrays of shape (width, height) in Monty form ("column
major": axis 0 indexes columns).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..fields import jfield as jf
from .errors import StackedPcsError
from .merkle import MerkleTree, build_merkle_tree
from .ntt import intt, ntt, zeta_transform


@dataclass(frozen=True)
class StackedSlice:
    """Location of one (lifted) trace column inside the stacked matrix."""

    col_idx: int
    row_idx: int
    log_height: int  # true log height; striding if < l_skip

    def length(self, l_skip: int) -> int:
        return 1 << max(self.log_height, l_skip)

    def stride(self, l_skip: int) -> int:
        return 1 << max(0, l_skip - self.log_height)


@dataclass
class StackedLayout:
    l_skip: int
    height: int
    width: int
    # (matrix index, column index, slice) in stacking order
    sorted_cols: List[Tuple[int, int, StackedSlice]]
    mat_starts: List[int]

    @staticmethod
    def new(
        l_skip: int,
        log_stacked_height: int,
        sorted_dims: Sequence[Tuple[int, int]],  # (width, log_height) desc by height
    ) -> "StackedLayout":
        assert l_skip <= log_stacked_height
        assert all(
            sorted_dims[i][1] >= sorted_dims[i + 1][1]
            for i in range(len(sorted_dims) - 1)
        ), "trace dims must be sorted by descending height"
        height = 1 << log_stacked_height
        sorted_cols: List[Tuple[int, int, StackedSlice]] = []
        mat_starts: List[int] = []
        col_idx = 0
        row_idx = 0
        for mat_idx, (width, log_ht) in enumerate(sorted_dims):
            mat_starts.append(len(sorted_cols))
            if width == 0:
                continue
            if log_ht > log_stacked_height:
                raise StackedPcsError(
                    f"StackedLayout.new: column height {log_ht} exceeds "
                    f"stacked height {log_stacked_height}"
                )
            slice_len = 1 << max(log_ht, l_skip)
            for j in range(width):
                if row_idx + slice_len > height:
                    if row_idx != height:
                        raise StackedPcsError(
                            f"StackedLayout.new: row overflow at col_idx={col_idx}"
                        )
                    col_idx += 1
                    row_idx = 0
                sorted_cols.append(
                    (mat_idx, j, StackedSlice(col_idx, row_idx, log_ht))
                )
                row_idx += slice_len
        width = col_idx + (1 if row_idx != 0 else 0)
        return StackedLayout(l_skip, height, width, sorted_cols, mat_starts)

    def get(self, mat_idx: int, col_idx: int) -> Optional[StackedSlice]:
        idx = self.mat_starts[mat_idx] + col_idx
        if idx >= len(self.sorted_cols):
            return None
        m, c, s = self.sorted_cols[idx]
        assert m == mat_idx and c == col_idx
        return s

    def width_of(self, mat_idx: int) -> int:
        start = self.mat_starts[mat_idx]
        end = (
            self.mat_starts[mat_idx + 1]
            if mat_idx + 1 < len(self.mat_starts)
            else len(self.sorted_cols)
        )
        return end - start


@dataclass
class StackedPcsData:
    """Prover-side committed data for one stacked commitment.

    Memory policy (peer of the reference ``GpuProverConfig``,
    ``cuda-backend/src/device.rs:26-47``): ``matrix`` and ``rs_matrix`` may
    be dropped after commitment (``ProverConfig.cache_*`` knobs) and are
    recomputed on demand from the retained traces — trading one extra
    stacking gather / RS NTT for the dominant HBM buffers.
    """

    layout: StackedLayout
    matrix: Optional[jnp.ndarray]  # (width, height) stacked evals, Monty
    rs_matrix: Optional[jnp.ndarray]  # (width, height<<blowup) codewords
    tree: MerkleTree
    # retained inputs + params for recompute-on-demand
    traces: Optional[Sequence[jnp.ndarray]] = None
    l_skip: int = 0
    n_stack: int = 0
    log_blowup: int = 0

    @property
    def commit(self) -> np.ndarray:
        return self.tree.root

    def get_matrix(self) -> jnp.ndarray:
        if self.matrix is not None:
            return self.matrix
        stacked, _ = stack_traces(self.l_skip, self.n_stack, self.traces)
        return stacked

    def get_rs_matrix(self) -> jnp.ndarray:
        if self.rs_matrix is not None:
            return self.rs_matrix
        return rs_code_matrix(self.l_skip, self.log_blowup, self.get_matrix())


def stack_traces(
    l_skip: int,
    n_stack: int,
    traces: Sequence[jnp.ndarray],  # each (width_t, height_t) Monty, height desc
) -> Tuple[jnp.ndarray, StackedLayout]:
    """Stack trace columns into the stacked matrix by pure reshape/concat.

    The greedy layout (``StackedLayout.new``) places slices at
    monotonically advancing (col, row) positions with no inter-slice gaps:
    slice lengths are powers of two, heights are sorted descending, so
    every ``row_idx`` is a multiple of the current slice length and slices
    never straddle a stacked-column boundary. In column-major flat order
    the stacked matrix is therefore EXACTLY the concatenation of each
    trace's flat columns (short traces zero-interleaved to their stride),
    padded with zeros to ``width * height``. That makes stacking free of
    gathers and of trace-time index literals — the reference's
    column-copy loops (``stacked_pcs.rs:294``) become O(1) reshapes.
    """
    dims = [(int(t.shape[0]), int(t.shape[1]).bit_length() - 1) for t in traces]
    layout = StackedLayout.new(l_skip, l_skip + n_stack, dims)
    height = layout.height
    width = layout.width

    blocks = []
    for t in traces:
        h_t = int(t.shape[1])
        stride = (1 << l_skip) // h_t if h_t < (1 << l_skip) else 1
        if stride == 1:
            blocks.append(t.reshape(-1))
        else:
            # strided short columns: value i of each column sits at offset
            # stride*i inside its 2^l_skip-row slice, zeros in between
            ex = jnp.zeros((t.shape[0], h_t, stride), jnp.uint32)
            ex = ex.at[:, :, 0].set(t)
            blocks.append(ex.reshape(-1))
    flat = jnp.concatenate(blocks) if blocks else jnp.zeros((0,), jnp.uint32)
    pad = width * height - int(flat.shape[0])
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint32)])
    stacked = flat.reshape(width, height)
    from ..parallel import annotate

    return annotate.rows(stacked, axis=1), layout


def rs_message(l_skip: int, evals: jnp.ndarray) -> jnp.ndarray:
    """Eval-to-coeff RS message of prismalinear columns (batched over axis 0).

    Input (..., height): evaluations on D x H_n (low l_skip index bits select
    the point of D). Output same shape: iDFT per 2^l_skip chunk then zeta
    transform over the chunk-local bits.
    """
    shape = evals.shape
    height = shape[-1]
    chunks = evals.reshape(shape[:-1] + (height >> l_skip, 1 << l_skip))
    coeffs = intt(chunks).reshape(shape)
    return zeta_transform(coeffs, l_skip)


def rs_code_matrix(l_skip: int, log_blowup: int, stacked: jnp.ndarray) -> jnp.ndarray:
    """Reed-Solomon codewords of all stacked columns (batched NTT)."""
    from ..parallel import annotate

    width, height = stacked.shape
    msg = rs_message(l_skip, stacked)
    padded = jnp.concatenate(
        [msg, jnp.zeros((width, height * ((1 << log_blowup) - 1)), jnp.uint32)],
        axis=1,
    )
    return annotate.rows(ntt(annotate.rows(padded, axis=1)), axis=1)


def stacked_commit(
    l_skip: int,
    n_stack: int,
    log_blowup: int,
    k_whir: int,
    traces: Sequence[jnp.ndarray],
    cache_stacked_matrix: bool = True,
    cache_rs_code_matrix: bool = True,
    tree_builder=None,
) -> Tuple[np.ndarray, StackedPcsData]:
    """Commit to a height-sorted collection of traces; returns (root, data).

    ``tree_builder`` (hash-scheme hook, ``swirl/hash/scheme.py``): when set,
    ``(rs_matrix, rows_per_query, ext) -> (root, tree)`` replaces the device
    Poseidon2 Merkle build — the outer BN254 scheme commits on host."""
    from .vmode import vm

    stacked, layout = stack_traces(l_skip, n_stack, traces)
    rs = rs_code_matrix(l_skip, log_blowup, stacked)
    if tree_builder is not None:
        root, tree = tree_builder(rs, 1 << k_whir, False)
        data = StackedPcsData(
            layout=layout,
            matrix=stacked if cache_stacked_matrix else None,
            rs_matrix=rs if cache_rs_code_matrix else None,
            tree=tree,
            traces=list(traces),
            l_skip=l_skip,
            n_stack=n_stack,
            log_blowup=log_blowup,
        )
        return root, data
    tree = build_merkle_tree(rs, 1 << k_whir)
    data = StackedPcsData(
        layout=layout,
        matrix=stacked if cache_stacked_matrix else None,
        rs_matrix=rs if cache_rs_code_matrix else None,
        tree=tree,
        traces=list(traces),
        l_skip=l_skip,
        n_stack=n_stack,
        log_blowup=log_blowup,
    )
    return vm().f(tree.layers[-1][:, 0]), data
