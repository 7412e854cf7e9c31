"""Fused-prover conformance: every fused mode must produce a proof whose
codec bytes equal the host-path proof's bytes (the "byte-identical"
guarantee of docs/fused-prover.md, CI-enforced here per the round-1 review).

Peer of the reference's GPU-vs-host equivalence tests
(`cuda-backend/src/tests.rs:78` runs the shared suite on the GPU engine).

The eager mode runs in the default (fast) tier; whole-proof jit and
segmented compiles take minutes on the 1-core CI box, so they live in the
slow tier (--runslow).
"""

import pytest

import tests.conftest  # noqa: F401  (forces CPU platform + 8 virtual devices)

from swirl.codec import encode_proof
from swirl.prover.fused import prove_fused


def _host_bytes(fib_setup):
    eng, vk, dpk, ctx, proof = fib_setup
    return eng, vk, dpk, ctx, encode_proof(proof)


def test_fused_eager_byte_identical(fib_setup):
    eng, vk, dpk, ctx, host_bytes = _host_bytes(fib_setup)
    proof = prove_fused(eng.backend, dpk, ctx, mode="eager")
    assert encode_proof(proof) == host_bytes
    eng.verify(vk, proof)


def test_fused_eager_interactions_byte_identical(selfint_setup):
    """Interactions proof: exercises the GKR layer-rounds lax.scan path."""
    eng, vk, dpk, ctx, host_proof = selfint_setup
    host_bytes = encode_proof(host_proof)
    proof = prove_fused(eng.backend, dpk, ctx, mode="eager")
    assert encode_proof(proof) == host_bytes
    eng.verify(vk, proof)


def test_fused_scan_head_tail_seam_byte_identical(monkeypatch):
    """Force a tiny scan-tail threshold so the unrolled head rounds and the
    masked lax.scan tail BOTH run — in the GKR layers AND in the batch
    sumcheck MLE rounds (trace tall enough for a multi-round head); bytes
    must still equal the host path."""
    from swirl.engine import StarkEngine
    from swirl.params import test_system_params_small
    from swirl.prover import gkr
    from swirl.prover.backend import ProvingContext
    from swirl.testing.fixtures import SelfInteractionAir

    monkeypatch.setattr(gkr, "_TAIL_LOG", 1)
    monkeypatch.setattr(gkr, "_MLE_TAIL_LOG", 1)
    # h=16, l_skip=2 -> n=2: MLE scan_lo=2 so round 1 unrolls and round 2
    # scans (the seam); GKR has 6 layers, head-unrolled above 2^1 pairs
    eng = StarkEngine(test_system_params_small(2, 4, 3))
    air = SelfInteractionAir(4)
    pk, vk = eng.keygen([air])
    dpk = eng.transport_pk(pk)
    ctx = ProvingContext([eng.context_for(0, air.generate_trace(16), [], [])])
    host_bytes = encode_proof(eng.prove(dpk, ctx))
    proof = prove_fused(eng.backend, dpk, ctx, mode="eager")
    assert encode_proof(proof) == host_bytes
    eng.verify(vk, proof)


def test_fused_program_size_stays_bounded():
    """Compile-size canary: the whole-proof program must stay roughly
    height-independent (the scan tier, docs/scan-tier.md). A reintroduced
    unrolled round pyramid shows up as an HLO blow-up long before it shows
    up as a timeout."""
    import jax

    from swirl.engine import StarkEngine
    from swirl.params import app_params_with_100_bits_security
    from swirl.prover.backend import ProvingContext
    from swirl.prover.fused import _segmented_fn
    from swirl.testing.synthetic import SyntheticAir, uniform_shape

    eng = StarkEngine(app_params_with_100_bits_security(14))
    air = SyntheticAir(
        uniform_shape(12, 64, num_constraints=16, num_interactions=8, degree=3)
    )
    pk, vk = eng.keygen([air])
    dpk = eng.transport_pk(pk)
    ctx = ProvingContext(
        [eng.context_for(0, air.generate_trace(), [], [])]
    ).sorted_for_stacking()
    (s1, s2a, s2b, s3, s4), _ = _segmented_fn(eng.backend, dpk, ctx)
    common = [tc.common_main for _, tc in ctx.per_trace]
    o1 = jax.eval_shape(s1, common)
    sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
    commons = [sds(c.common_main) for _, c in ctx.per_trace]
    o2a = jax.eval_shape(s2a, sds(o1[0]), commons)
    lines_a = s2a.lower(sds(o1[0]), commons).as_text().count("\n")
    lines_b = (
        s2b.lower(sds(o2a[0]), sds(o2a[2]), sds(o2a[3]), commons)
        .as_text()
        .count("\n")
    )
    # 30k at 2^12x64 as of round 2 for the combined stage; the
    # pre-scan-tier program exceeded 300k-equivalent (compile never
    # finished). Post-split each phase must stay bounded INDIVIDUALLY —
    # the remote compile helper cap is per program.
    assert lines_a < 40_000, f"seg2a (GKR) HLO blew up: {lines_a} lines"
    assert lines_b < 50_000, f"seg2b (batch) HLO blew up: {lines_b} lines"


def test_fused_segmented_byte_identical(fib_setup):
    """Segmented is the bench's compiled mode — it gates by DEFAULT so the
    path the TPU number is measured on cannot regress unnoticed (round-2
    verdict weak item 4). ~1 min cold compile on the 1-core CI box."""
    eng, vk, dpk, ctx, host_bytes = _host_bytes(fib_setup)
    proof = prove_fused(eng.backend, dpk, ctx, mode="segmented")
    assert encode_proof(proof) == host_bytes
    eng.verify(vk, proof)


@pytest.mark.slow
def test_fused_segmented_aot_reload_byte_identical(fib_setup, tmp_path):
    """A segmented prove persists its four compiled stage executables
    (swirl/prover/fused.py:_save_aot_segments); a FRESH PROCESS must load
    that bundle instead of re-tracing and produce byte-identical proof
    bytes. This is the warm path the bench driver relies on: load + run,
    no tracing/lowering/compiling. Save and load run in subprocesses over
    a fresh cache dir (XLA:CPU can only serialize freshly-compiled
    executables, see _aot_reload_worker.py); the load worker has
    _segmented_fn poisoned so a silent re-trace fails the test."""
    import glob
    import hashlib
    import os
    import subprocess
    import sys

    eng, vk, dpk, ctx, host_bytes = _host_bytes(fib_setup)
    want = "PROOF_SHA=" + hashlib.sha256(host_bytes).hexdigest()

    worker = os.path.join(os.path.dirname(__file__), "_aot_reload_worker.py")
    env = dict(os.environ)
    env["SWIRL_JAX_CACHE"] = str(tmp_path / "cache")

    def run(mode):
        res = subprocess.run(
            [sys.executable, worker, mode],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            timeout=900,
        )
        out = res.stdout.decode(errors="replace")
        assert res.returncode == 0, (
            mode,
            out,
            res.stderr.decode(errors="replace")[-2000:],
        )
        assert want in out, f"{mode}: proof bytes differ: {out}"

    run("save")
    bundles = glob.glob(str(tmp_path / "cache" / "*" / "aot" / "seg-*.pkl"))
    assert bundles, "segmented prove did not persist an AOT bundle"
    run("load")


@pytest.mark.slow
def test_fused_jit_byte_identical(fib_setup):
    eng, vk, dpk, ctx, host_bytes = _host_bytes(fib_setup)
    proof = prove_fused(eng.backend, dpk, ctx, mode="jit")
    assert encode_proof(proof) == host_bytes
    eng.verify(vk, proof)


@pytest.mark.slow
def test_fused_cache_not_stale_across_public_values(fib_setup):
    """Two proves with identical shapes but different public values must not
    reuse a stale traced closure (advisor round-1 medium finding)."""
    eng, vk, dpk, _, _ = fib_setup
    from swirl.prover.backend import ProvingContext
    from swirl.testing.fixtures import FibonacciAir

    air = FibonacciAir()
    for a, b in [(0, 1), (2, 5)]:
        ctx = ProvingContext(
            [eng.context_for(0, air.generate_trace(a, b, 64), air.pvs(a, b, 64))]
        )
        host_bytes = encode_proof(eng.prove(dpk, ctx))
        fused = prove_fused(eng.backend, dpk, ctx, mode="jit")
        assert encode_proof(fused) == host_bytes
        eng.verify(vk, fused)
