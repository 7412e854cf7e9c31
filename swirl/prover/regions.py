"""Region-jit: one dispatched XLA program per protocol region.

The eager fused prover runs the trace-mode pipeline with concrete device
arrays, so every primitive op pays one relay dispatch (~350 ms over the
tunneled dev chip — ``docs/eager-dispatch-model.md``). A *region* wraps a
contiguous span of the prover schedule — including its duplex-sponge
transcript events — into ONE jitted program:

- the body is ordinary vmode prover code operating on a
  :class:`~swirl.prover.device_transcript.DeviceTranscript` whose cursors
  are trace-time Python ints, so the whole event schedule stays static;
- the sponge state enters and exits as the program's first operand, and the
  exit cursors (pure host bookkeeping) are captured at trace time and
  replayed onto the caller's transcript;
- all value-carrying device data MUST be passed as arguments — a closed-over
  concrete array would be baked into the compiled program as a constant and
  silently go stale on the next prove.

Under the segmented prover's outer trace the same region call is inlined
(nested ``jax.jit``), so there is exactly one definition of each region's
event schedule for the eager, segmented, and mesh paths. The host/spec
prover does not use regions (its transcript is host-side numpy).

Granularity rule: each region's lowered program must stay well under the
remote compile helper's practical ceiling (~100 KB MLIR compiles in ~75 s;
MB-sized stage programs never return — measured round 4, STATUS.md), so
regions sit between "one op" and "one stage".

Reference analogue: the CUDA backend groups the prover into kernel families
per protocol phase (``crates/cuda-backend/src/logup_zerocheck/``,
``.../whir.rs``); regions are the XLA-native equivalent, with the sponge
schedule fused in instead of synced host-side (``sponge.rs``).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Tuple

import jax


class _Region:
    __slots__ = ("fn", "exit_cursors")

    def __init__(self):
        self.fn = None
        self.exit_cursors = None


_CACHE: Dict[Tuple, _Region] = {}


def clear_region_cache() -> None:
    """Drop every cached region program (tests / leak hygiene)."""
    _CACHE.clear()


def run_region(
    transcript,
    key: Tuple,
    factory: Callable[[], Callable],
    *args: Any,
):
    """Run ``factory()``'s body as one jitted program over ``transcript``.

    ``key`` must determine the region's full event schedule and every static
    closure the factory bakes in (DAG identity, shapes, degrees, flags) —
    two calls with equal keys must trace identical programs. The entry
    cursors are appended to the key automatically.

    The body has signature ``body(tr, *args) -> out_pytree`` and may use any
    DeviceTranscript method on ``tr``; ``out`` must be a pytree of traced
    arrays (no host values).
    """
    full_key = (key, transcript.absorb_idx, transcript.sample_idx)
    reg = _CACHE.get(full_key)
    if reg is None:
        reg = _Region()
        body = factory()
        entry_a = transcript.absorb_idx
        entry_s = transcript.sample_idx

        @jax.jit
        def run(state, *inner):
            from ..hash import jposeidon2 as jp2
            from .device_transcript import DeviceTranscript

            tr = DeviceTranscript()
            tr.state = state
            tr.absorb_idx = entry_a
            tr.sample_idx = entry_s
            # compact lowering: inside region programs, hashing/Merkle work
            # routes through shared rolled callees instead of per-call-site
            # Pallas payloads — the programs must stay under the remote
            # compile helper's size ceiling (see jposeidon2.compact_lowering)
            with jp2.compact_lowering():
                out = body(tr, *inner)
            exit_cursors = (tr.absorb_idx, tr.sample_idx)
            if reg.exit_cursors is None:
                reg.exit_cursors = exit_cursors
            elif reg.exit_cursors != exit_cursors:
                raise AssertionError(
                    f"region {key}: exit cursors {exit_cursors} differ from "
                    f"a previous trace {reg.exit_cursors} — the region key "
                    "does not determine the event schedule"
                )
            return tr.state, out

        reg.fn = run
        _CACHE[full_key] = reg
        if os.environ.get("SWIRL_REGION_SIZES") == "1":
            try:
                import sys

                mlir = reg.fn.lower(transcript.state, *args).as_text()
                print(
                    f"region {key[-1] if isinstance(key, tuple) else key}: "
                    f"{len(mlir) / 1024:.0f} KB MLIR",
                    file=sys.stderr,
                    flush=True,
                )
            except Exception:
                pass
    state, out = reg.fn(transcript.state, *args)
    transcript.state = state
    transcript.absorb_idx, transcript.sample_idx = reg.exit_cursors
    return out
