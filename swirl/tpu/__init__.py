"""Pallas TPU kernels: the hot device loops of the prover.

The peer of the reference's CUDA kernel set (``cuda-backend/cuda/``): each
module here implements one kernel family (Poseidon2 hashing, NTT butterfly
stages) as a Pallas/Mosaic kernel, with the batched-jnp implementations in
``swirl/prover`` / ``swirl/hash`` remaining the portable spec and fallback.

Kernels run compiled on TPU and in interpreter mode on CPU (used by the
test suite); set ``SWIRL_PALLAS=0`` to force the jnp fallbacks everywhere.
"""

from __future__ import annotations

import os

import jax


def pallas_mode() -> str:
    """"compiled" on TPU, "interpret" when forced for tests, "off" otherwise."""
    env = os.environ.get("SWIRL_PALLAS", "")
    if env == "0":
        return "off"
    if env == "interpret":
        return "interpret"
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon") or "TPU" in str(jax.devices()[0]):
        return "compiled"
    return "off"
