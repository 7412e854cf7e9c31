"""Sanitizer (touchemall analog) tests: poisoned buffers are caught at the
prover's stage boundaries when SWIRL_SANITIZE=1; clean proves pass with the
sanitizer armed; the checks are free when disabled."""

import os
import unittest

import numpy as np

from swirl import sanitize
from swirl.engine import StarkEngine
from swirl.params import test_system_params_small as small_params
from swirl.prover.backend import ProvingContext
from swirl.testing.fixtures import FibonacciAir


class _Armed:
    def __enter__(self):
        self._old = os.environ.get("SWIRL_SANITIZE")
        os.environ["SWIRL_SANITIZE"] = "1"

    def __exit__(self, *exc):
        if self._old is None:
            del os.environ["SWIRL_SANITIZE"]
        else:
            os.environ["SWIRL_SANITIZE"] = self._old


class TestSanitize(unittest.TestCase):
    def test_poison_fill_is_out_of_domain(self):
        buf = sanitize.poison_fill((4, 8))
        self.assertTrue((buf == sanitize.POISON).all())
        with _Armed():
            with self.assertRaises(sanitize.SanitizerError):
                sanitize.check_canonical(buf, "buf")

    def test_disabled_is_noop(self):
        os.environ.pop("SWIRL_SANITIZE", None)
        sanitize.check_canonical(sanitize.poison_fill((2, 2)), "buf")  # no raise

    def test_clean_prove_passes_with_sanitizer_armed(self):
        eng = StarkEngine(small_params(2, 6, 3))
        air = FibonacciAir()
        trace = air.generate_trace(0, 1, 64)
        with _Armed():
            vk, proof = eng.run_test([air], [(trace, air.pvs(0, 1, 64), [])])
        eng.verify(vk, proof)

    def test_poisoned_device_buffer_is_caught(self):
        # emulate an uninitialized *device* buffer reaching the prover — the
        # exact class touchemall's 0xff memset exposes (host-side entry
        # points canonicalize, so poison there is indistinguishable from
        # data; a raw device matrix bypasses that conversion)
        import jax.numpy as jnp

        from swirl.prover.backend import AirContext

        eng = StarkEngine(small_params(2, 6, 3))
        air = FibonacciAir()
        trace = air.generate_trace(0, 1, 64)
        pk, vk = eng.keygen([air])
        dpk = eng.transport_pk(pk)
        _, good = eng.context_for(0, trace, air.pvs(0, 1, 64), [])
        poisoned = jnp.asarray(
            sanitize.poison_fill(np.asarray(good.common_main).shape)
        )
        ctx = ProvingContext(
            [
                (
                    0,
                    AirContext(
                        cached_mains=[],
                        common_main=poisoned,
                        public_values=good.public_values,
                    ),
                )
            ]
        )
        with _Armed():
            with self.assertRaises(sanitize.SanitizerError):
                eng.prove(dpk, ctx)


if __name__ == "__main__":
    unittest.main()
