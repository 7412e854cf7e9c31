"""Subprocess worker for test_fused_segmented_aot_reload_byte_identical.

Two modes (argv[1]):
  save — prove the standard small Fibonacci workload in segmented mode,
         freshly compiling (the caller points SWIRL_JAX_CACHE at an empty
         dir) so the persisted AOT bundle is serialized from a REAL
         compile. (XLA:CPU cannot re-serialize an executable loaded from
         the persistent compile cache — such bundles fail at call time and
         take the traced fallback path instead.)
  load — _segmented_fn is poisoned: the prove can only succeed by loading
         the AOT stage-executable bundle the save-mode run persisted.

Both modes print the proof bytes' sha256 for the parent to compare.
"""

import hashlib
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swirl.codec import encode_proof
from swirl.engine import StarkEngine
from swirl.params import test_system_params_small
from swirl.prover.backend import ProvingContext
from swirl.testing.fixtures import FibonacciAir

import swirl.prover.fused as fused_mod


def _boom(*a, **k):
    raise AssertionError("AOT bundle missed: segmented prover re-traced")


def main() -> int:
    mode = sys.argv[1]
    if mode == "load":
        fused_mod._segmented_fn = _boom
    eng = StarkEngine(test_system_params_small(2, 6, 3))
    air = FibonacciAir()
    pk, vk = eng.keygen([air])
    dpk = eng.transport_pk(pk)
    ctx = ProvingContext(
        [eng.context_for(0, air.generate_trace(0, 1, 64), air.pvs(0, 1, 64))]
    )
    proof = fused_mod.prove_fused(eng.backend, dpk, ctx, mode="segmented")
    eng.verify(vk, proof)
    print("PROOF_SHA=" + hashlib.sha256(encode_proof(proof)).hexdigest())
    return 0


if __name__ == "__main__":
    sys.exit(main())
