"""Value-mode dispatch for the prover orchestration.

The prover's stage drivers interleave device array programs with
"protocol-small" scalar math and the Fiat-Shamir transcript. These small
values exist in one of two modes:

- **host mode** (default): canonical-u64 numpy, math from ``fields.ext`` /
  ``swirl.poly``, host duplex-sponge transcript. One device dispatch per
  array program — the readable reference flow.
- **trace mode**: the whole prove is traced into a single XLA program
  (``swirl/prover/fused.py``); small values are Monty-form jnp tracers,
  math from ``fields.text`` / ``swirl.tpoly``, and the transcript is the
  device sponge. Device<->"host" conversions become no-ops.

Stage drivers call ``vmode.vm()`` once and use its namespace; everything
static (layouts, selector tables, integer points) stays plain numpy in
both modes.
"""

from __future__ import annotations

import contextlib
import contextvars

import numpy as np
import jax.numpy as jnp

from .. import poly as hpoly
from .. import tpoly
from ..fields import ext as hext
from ..fields import text
from ..fields import jfield as jf
from ..fields.babybear import U64


class HostVM:
    is_trace = False
    ext = hext
    poly = hpoly

    @staticmethod
    def ef(x):
        """Device EF value -> host-mode value (canonical numpy)."""
        return jf.ext_to_host(x)

    @staticmethod
    def f(x):
        return jf.to_host(x)

    @staticmethod
    def ef_dev(v):
        """Host-mode EF value -> device Monty."""
        return jnp.asarray(jf.ext_const(v))

    @staticmethod
    def const_vec(v):
        """Host-mode EF array (k, 4) -> device Monty array."""
        return jnp.asarray(jf.const_arr(np.asarray(v, U64)))

    @staticmethod
    def stack(xs):
        return np.stack(xs) if xs else np.zeros((0, 4), dtype=U64)

    @staticmethod
    def assert_zero(v, msg: str):
        if not hext.is_zero(v):
            raise ValueError(msg)

    @staticmethod
    def pow_omega(log_size: int, index):
        """omega^index for the size-2^log_size two-adic subgroup; index is a
        host int here, a traced scalar in trace mode. Returns a base-field
        value in the current mode's representation (canonical int / Monty)."""
        from ..fields.babybear import P, two_adic_generator

        return pow(two_adic_generator(log_size), int(index), P)

    @staticmethod
    def pow_omega_batch(log_size: int, indices):
        """omega^i for a batch of indices: canonical (k,) numpy here, one
        shared table + one gather (k,) Monty in trace mode."""
        from ..fields.babybear import P, two_adic_generator

        g = two_adic_generator(log_size)
        return np.asarray(
            [pow(g, int(i), P) for i in indices], dtype=U64
        )


class TraceVM:
    is_trace = True
    ext = text
    poly = tpoly

    @staticmethod
    def ef(x):
        return x

    @staticmethod
    def f(x):
        return x

    @staticmethod
    def ef_dev(v):
        return jnp.asarray(v)

    @staticmethod
    def const_vec(v):
        return jnp.asarray(v)

    @staticmethod
    def stack(xs):
        return jnp.stack(xs) if xs else jnp.zeros((0, 4), jnp.uint32)

    @staticmethod
    def assert_zero(v, msg: str):
        # data-dependent control flow is impossible under trace; the claim
        # is enforced by the verifier (and by the host path in tests)
        del v, msg

    @staticmethod
    def pow_omega(log_size: int, index):
        # square-and-multiply over the index bits — no 2^log_size literal
        # roots table in the program (those tables dominated executable
        # size at production heights)
        from ..fields.babybear import two_adic_generator

        return jf.pow_bits_dev(
            two_adic_generator(log_size), jnp.asarray(index), log_size
        )

    @staticmethod
    def pow_omega_batch(log_size: int, indices):
        from ..fields.babybear import two_adic_generator

        if isinstance(indices, (list, tuple)):
            idx = jnp.stack([jnp.asarray(i) for i in indices])
        else:
            idx = jnp.asarray(indices)  # already batched (sample_bits_batch)
        return jf.pow_bits_dev(two_adic_generator(log_size), idx, log_size)


_mode = contextvars.ContextVar("swirl_vmode", default=HostVM)


def vm():
    return _mode.get()


@contextlib.contextmanager
def trace_mode():
    token = _mode.set(TraceVM)
    try:
        yield
    finally:
        _mode.reset(token)
