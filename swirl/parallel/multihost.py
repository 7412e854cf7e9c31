"""Multi-host runtime scaffolding: jax.distributed + DCN/ICI-aware meshes.

The reference prover is single-process/single-accelerator (SURVEY §2.6:
no NCCL/MPI anywhere); scaling one proof across TPU hosts is new,
TPU-native work. This module owns the process-level runtime:

- :func:`initialize`: `jax.distributed.initialize` entry point (idempotent,
  no-op for single-process runs so the same code path serves tests).
- :func:`proof_mesh`: builds the mesh for the sharded prover. The long
  axis (trace height / hypercube coordinates, axis name "rows") is laid
  out so that *within-host* neighbors are contiguous: collectives on the
  fold/NTT axis ride ICI first and only cross DCN at host boundaries —
  the scaling-book recipe of keeping the fast-varying shard dimension on
  the fast interconnect.
- :func:`host_local_mesh`: single-host mesh over local devices (the shape
  `__graft_entry__.dryrun_multichip` validates on 8 virtual CPU devices).

The sharded prover (`swirl.prover.fused.prove_fused(..., mesh=...)`)
accepts any mesh built here unchanged: GSPMD handles both the ICI-only and
the ICI+DCN layouts, inserting hierarchical collectives.

Fiat-Shamir determinism across hosts: the transcript lives in the traced
program (device sponge) and all its inputs are replicated, so every
process computes identical challenges — no host-0 broadcast is needed
(SURVEY §2.6's "deterministic replicated transcript" option).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

AXIS = "rows"

_initialized = [False]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the distributed runtime (idempotent).

    Args default from the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``; TPU pods auto-detect all
    three). Single-process (tests, one host) is a no-op.
    """
    if _initialized[0]:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        _initialized[0] = True
        return  # single-process: nothing to initialize
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized[0] = True


def proof_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """One-axis mesh over all devices with within-host devices contiguous.

    ``jax.devices()`` orders devices by (process, local id), so a simple
    reshape keeps each host's chips adjacent on the "rows" axis: sumcheck
    folds and NTT block exchanges between neighboring shards stay on ICI,
    and only the host-boundary exchanges traverse DCN. For a single host
    this degenerates to the flat local mesh.
    """
    devices = list(devices) if devices is not None else jax.devices()
    by_process: dict = {}
    for d in devices:
        by_process.setdefault(getattr(d, "process_index", 0), []).append(d)
    ordered = [d for p in sorted(by_process) for d in by_process[p]]
    return Mesh(np.array(ordered), (AXIS,))


def host_local_mesh(n: Optional[int] = None) -> Mesh:
    """Mesh over this process's local devices (first ``n`` if given)."""
    devices = jax.local_devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), (AXIS,))


def hierarchical_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """Two-axis ("host", "chip") mesh for layouts that want explicit
    DCN/ICI separation (e.g. data-parallel proofs over "host" with each
    proof sharded over "chip")."""
    devices = list(devices) if devices is not None else jax.devices()
    by_process: dict = {}
    for d in devices:
        by_process.setdefault(getattr(d, "process_index", 0), []).append(d)
    rows = [by_process[p] for p in sorted(by_process)]
    n_local = len(rows[0])
    if any(len(r) != n_local for r in rows):
        raise ValueError("hosts expose unequal device counts")
    return Mesh(np.array(rows), ("host", "chip"))
