"""Flagship AIR workloads ("models") proved by the swirl engine.

The peer of the reference's example workloads: keccak-f (cf.
``crates/stark-sdk/examples/keccakf.rs``, which proves p3-keccak-air) and
the synthetic replay AIRs live in ``swirl.testing.synthetic``.
"""

from .keccak import KeccakAir, keccak_f  # noqa: F401
