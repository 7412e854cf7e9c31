"""Sharding-annotation hooks for the SPMD (multi-chip) prover.

The TPU-native way to scale one proof across a chip mesh is GSPMD: trace
the SAME fused prover once, mark the long axis (stacked-matrix height /
hypercube coordinates / Merkle leaves) with ``with_sharding_constraint``,
and let XLA's SPMD partitioner insert the collectives (all-to-all at NTT
boundaries, all-reduce for sumcheck partials, all-gather for Merkle tails)
— the same recipe as the scaling-book's "annotate and let XLA choose".

Stage code calls :func:`rows` / :func:`leaves` unconditionally; outside an
SPMD trace these are identity functions with zero overhead, inside one they
apply the active mesh's constraint. This keeps the stage drivers free of
any mesh plumbing (contrast the reference's explicit single-device CUDA
stream context, ``cuda-common/src/stream.rs:136``).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

AXIS = "rows"

_state = threading.local()


def _mesh():
    return getattr(_state, "mesh", None)


@contextmanager
def spmd_mesh(mesh: Mesh):
    """Activate sharding annotations for the duration of a fused-prover trace."""
    prev = _mesh()
    _state.mesh = mesh
    try:
        yield
    finally:
        _state.mesh = prev


def _constrain(arr, spec: PSpec):
    mesh = _mesh()
    if mesh is None:
        return arr
    return jax.lax.with_sharding_constraint(arr, NamedSharding(mesh, spec))


def rows(arr, axis: int = 1):
    """Constrain a (w, H[, 4]) matrix to be sharded along its height axis.

    The height axis carries the hypercube coordinates — the proof's "long
    axis" (SURVEY §2.6); every whole-array op over it partitions cleanly.
    """
    mesh = _mesh()
    if mesh is None:
        return arr
    if arr.ndim == 0 or arr.shape[axis] % mesh.devices.size != 0:
        return arr  # too small to shard evenly; leave to XLA
    spec = [None] * arr.ndim
    spec[axis] = AXIS
    return _constrain(arr, PSpec(*spec))


def leaves(arr, axis: int = 0):
    """Constrain an (N, 8) digest layer to be sharded along the leaf axis."""
    return rows(arr, axis=axis)


def replicated(arr):
    """Explicitly replicate (tiny claims, sponge state)."""
    mesh = _mesh()
    if mesh is None:
        return arr
    return _constrain(arr, PSpec())
