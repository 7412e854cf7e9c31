"""Fused single-program prover: the ENTIRE prove is one XLA computation.

The host-path prover dispatches one device program per array step and syncs
the Fiat-Shamir transcript on host between rounds — hundreds of round trips
per proof. On TPU the idiomatic shape is the opposite: trace once, compile
once, run the whole proof as a single program. This driver does exactly
that:

- value mode switched to trace (``vmode.trace_mode``): the protocol-small
  math runs as Monty-form tracers via ``fields.text`` / ``swirl.tpoly``;
- the transcript is the device sponge (``DeviceTranscript``) — bit-exact
  with the host sponge, including PoW grinding (a ``while_loop`` on
  device);
- the unchanged ``Coordinator._prove`` drives the same stage code as the
  host path, so the resulting proof is byte-identical to a host-path proof
  (asserted by the conformance tests).

The reference's CUDA backend keeps a device-resident sponge mirror and
still syncs claims to the host every round (``cuda-backend/src/sponge.rs``);
this is the TPU-native end state of that idea — there is nothing left to
sync.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import List

import numpy as np
import jax

from ..fields.babybear import P
from ..proof import (
    BatchConstraintProof,
    GkrLayerClaims,
    GkrProof,
    Proof,
    StackingProof,
    TraceVData,
    WhirProof,
)
from . import vmode
from .device_transcript import DeviceTranscript

_RINV = pow(1 << 32, P - 2, P)


def _canon(x) -> np.ndarray:
    """Monty uint32 array -> canonical uint64 numpy."""
    return (np.asarray(x, dtype=np.uint64) * np.uint64(_RINV)) % np.uint64(P)


def _wit(x) -> int:
    """Canonical uint32 scalar -> int."""
    return int(np.asarray(x))


def _to_plain(x):
    if dataclasses.is_dataclass(x):
        return {
            f.name: _to_plain(getattr(x, f.name)) for f in dataclasses.fields(x)
        }
    if isinstance(x, (list, tuple)):
        return [_to_plain(i) for i in x]
    return x


def _rebuild_proof(plain, trace_vdata, public_values) -> Proof:
    g = plain["gkr_proof"]
    gkr = GkrProof(
        logup_pow_witness=_wit(g["logup_pow_witness"]),
        q0_claim=_canon(g["q0_claim"]),
        claims_per_layer=[
            GkrLayerClaims(**{k: _canon(cl[k]) for k in cl})
            for cl in g["claims_per_layer"]
        ],
        sumcheck_polys=[
            [[_canon(e) for e in rnd] for rnd in layer]
            for layer in g["sumcheck_polys"]
        ],
    )
    b = plain["batch_constraint_proof"]
    batch = BatchConstraintProof(
        numerator_term_per_air=[_canon(x) for x in b["numerator_term_per_air"]],
        denominator_term_per_air=[
            _canon(x) for x in b["denominator_term_per_air"]
        ],
        univariate_round_coeffs=[_canon(x) for x in b["univariate_round_coeffs"]],
        sumcheck_round_polys=[
            [_canon(x) for x in rnd] for rnd in b["sumcheck_round_polys"]
        ],
        column_openings=[
            [[_canon(x) for x in part] for part in air]
            for air in b["column_openings"]
        ],
    )
    s = plain["stacking_proof"]
    stacking = StackingProof(
        univariate_round_coeffs=[_canon(x) for x in s["univariate_round_coeffs"]],
        sumcheck_round_polys=[
            [_canon(x) for x in rnd] for rnd in s["sumcheck_round_polys"]
        ],
        stacking_openings=[
            [_canon(x) for x in com] for com in s["stacking_openings"]
        ],
    )
    w = plain["whir_proof"]
    whir = WhirProof(
        mu_pow_witness=_wit(w["mu_pow_witness"]),
        whir_sumcheck_polys=[
            [_canon(x) for x in rnd] for rnd in w["whir_sumcheck_polys"]
        ],
        codeword_commits=[_canon(x) for x in w["codeword_commits"]],
        ood_values=[_canon(x) for x in w["ood_values"]],
        folding_pow_witnesses=[_wit(x) for x in w["folding_pow_witnesses"]],
        query_phase_pow_witnesses=[
            _wit(x) for x in w["query_phase_pow_witnesses"]
        ],
        initial_round_opened_rows=[
            [_canon(rows) for rows in com]
            for com in w["initial_round_opened_rows"]
        ],
        initial_round_merkle_proofs=[
            [[_canon(d) for d in path] for path in com]
            for com in w["initial_round_merkle_proofs"]
        ],
        codeword_opened_values=[
            [_canon(x) for x in rnd] for rnd in w["codeword_opened_values"]
        ],
        codeword_merkle_proofs=[
            [[_canon(d) for d in path] for path in rnd]
            for rnd in w["codeword_merkle_proofs"]
        ],
        final_poly=[_canon(x) for x in w["final_poly"]],
    )
    return Proof(
        common_main_commit=_canon(plain["common_main_commit"]),
        trace_vdata=trace_vdata,
        public_values=public_values,
        gkr_proof=gkr,
        batch_constraint_proof=batch,
        stacking_proof=stacking,
        whir_proof=whir,
    )


def enable_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Point JAX's persistent compilation cache at a repo-local dir so the
    fused program compiles once per (shape, params) per machine."""
    if jax.config.jax_compilation_cache_dir is None:
        os_makedirs = __import__("os").makedirs
        os_makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache EVERYTHING: on a remote-compile setup (axon) even sub-second
        # modules pay a round trip to the compile helper
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _fused_fn(backend, mpk, ctx, jit: bool = True):
    """Build (and cache on the mpk) the whole-proof function for this
    context shape (jitted single program, or the eager-async variant)."""
    from .backend import AirContext, Coordinator, ProvingContext

    key = (jit,) + tuple(
        (air_id, tc.height, int(tc.common_main.shape[0]))
        for air_id, tc in ctx.per_trace
    )
    cache = getattr(mpk, "_fused_cache", None)
    if cache is None:
        cache = {}
        mpk._fused_cache = cache
    if key in cache:
        return cache[key]

    meta = {}

    def fn(common_list):
        # fresh contexts bound to the jit arguments; pk data and
        # cached/preprocessed device arrays are closed over as constants
        per_trace = [
            (
                air_id,
                AirContext(
                    cached_mains=tc.cached_mains,
                    common_main=arr,
                    public_values=tc.public_values,
                ),
            )
            for (air_id, tc), arr in zip(ctx.per_trace, common_list)
        ]
        with vmode.trace_mode():
            coord = Coordinator(backend, DeviceTranscript())
            proof = coord._prove(mpk, ProvingContext(per_trace))
        plain = {
            "common_main_commit": proof.common_main_commit,
            "gkr_proof": _to_plain(proof.gkr_proof),
            "batch_constraint_proof": _to_plain(proof.batch_constraint_proof),
            "stacking_proof": _to_plain(proof.stacking_proof),
            "whir_proof": _to_plain(proof.whir_proof),
        }
        # pack every (uint32) leaf into ONE buffer: a warm prove then costs
        # a single D2H fetch instead of one per proof field
        import jax.numpy as jnp

        leaves, treedef = jax.tree_util.tree_flatten(plain)
        meta["treedef"] = treedef
        meta["shapes"] = [jnp.shape(l) for l in leaves]
        flat = [jnp.ravel(jnp.asarray(l, jnp.uint32)) for l in leaves]
        return jnp.concatenate(flat) if flat else jnp.zeros((0,), jnp.uint32)

    wrapped = jax.jit(fn) if jit else fn
    cache[key] = (wrapped, meta)
    return wrapped, meta


def prove_fused(backend, mpk, unsorted_ctx, mode: str = "jit") -> Proof:
    """Device-resident prove; byte-identical to ``Coordinator.prove``.

    mode="jit": the whole proof is ONE compiled XLA program (compile once
    per shape, best steady-state latency; compile cost grows with the round
    count).
    mode="eager": the same trace-mode pipeline runs op-by-op with async
    dispatch — the transcript and every intermediate stay on device, there
    are ZERO host round-trips until the single final proof fetch, and
    nothing big ever compiles. The right choice for one-off shapes.
    """
    enable_compile_cache()
    ctx = unsorted_ctx.sorted_for_stacking()
    num_airs = len(mpk.per_air)

    # static proof metadata (mirrors Coordinator._prove's host assembly)
    trace_vdata: List = [None] * num_airs
    public_values: List[List[int]] = [[] for _ in range(num_airs)]
    for air_id, tc in ctx.per_trace:
        trace_vdata[air_id] = TraceVData(
            log_height=tc.height.bit_length() - 1,
            cached_commitments=[cd.commitment for cd in tc.cached_mains],
        )
        public_values[air_id] = list(tc.public_values)

    common = [tc.common_main for _, tc in ctx.per_trace]
    fn, meta = _fused_fn(backend, mpk, ctx, jit=(mode == "jit"))
    flat = np.asarray(fn(common))  # one transfer for the whole proof
    leaves = []
    off = 0
    for shape in meta["shapes"]:
        n = int(np.prod(shape)) if shape else 1
        leaves.append(flat[off : off + n].reshape(shape))
        off += n
    plain = jax.tree_util.tree_unflatten(meta["treedef"], leaves)
    return _rebuild_proof(plain, trace_vdata, public_values)
