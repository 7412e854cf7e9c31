"""Monty-domain sanitizer — the TPU-native analog of the reference's
``touchemall`` poison-fill feature (``cuda-common/src/d_buffer.rs:84-89``,
``cuda-common/Cargo.toml:28``).

On CUDA, fresh device buffers are memset to ``0xff`` so uninitialized reads
surface as wildly-wrong field values. Under XLA there is no uninitialized
memory to read — every array is a value — so the equivalent failure class is
*out-of-domain data flowing into field arithmetic*: a buffer that was never
written with a valid Monty residue (all swirl field arrays are uint32 Monty
values ``< P``). The sanitizer makes that class loud:

- :func:`poison_fill` builds a buffer of ``0xFFFFFFFF`` sentinels (no valid
  Monty residue — BabyBear ``P < 2^31``) for tests that emulate forgotten
  initialization, exactly like touchemall's memset;
- :func:`check_canonical` asserts every element of a host-visible field
  array is a canonical Monty residue, raising :class:`SanitizerError` with
  the first offending index;
- enabled via ``SWIRL_SANITIZE=1``, checks run at the host-path prover's
  stage boundaries (input traces, committed stacked matrix) and are skipped
  automatically in trace mode (a traced program has no host values to
  check — the fused prover's byte-equality tests against the host path
  extend the coverage there).
"""

from __future__ import annotations

import os

import numpy as np

from .fields.babybear import P

#: No valid Monty residue (P < 2^31 < 0xFFFFFFFF) — the touchemall 0xff fill.
POISON = 0xFFFFFFFF


class SanitizerError(AssertionError):
    """An out-of-domain (non-canonical / poisoned) field value was observed."""


def enabled() -> bool:
    return os.environ.get("SWIRL_SANITIZE", "0") not in ("", "0")


def poison_fill(shape, dtype=np.uint32) -> np.ndarray:
    """An 'uninitialized' buffer: every byte 0xff (d_buffer.rs:84-89)."""
    return np.full(shape, POISON, dtype=dtype)


def check_canonical(arr, what: str) -> None:
    """Assert every element of a field array is a Monty residue < P.

    Accepts numpy or concrete JAX arrays; silently skips tracers (trace-mode
    values have no host data to check)."""
    if not enabled():
        return
    try:
        host = np.asarray(arr)
    except Exception:
        return  # tracer / abstract value
    if host.size == 0:
        return
    bad = host >= np.uint64(P) if host.dtype == np.uint64 else host >= P
    if bad.any():
        idx = tuple(int(i) for i in np.argwhere(bad)[0])
        raise SanitizerError(
            f"sanitizer: non-canonical field value {int(host[idx])} at "
            f"{what}{list(idx)} (>= P={P}); was this buffer initialized?"
        )


def check_traces(traces, what: str) -> None:
    """Range-check a list of (w, h[, 4]) field matrices."""
    if not enabled():
        return
    for i, t in enumerate(traces):
        check_canonical(t, f"{what}[{i}]")
