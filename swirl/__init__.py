"""swirl: TPU-native SWIRL STARK prover/verifier framework.

A from-scratch JAX/XLA/Pallas implementation of the SWIRL multi-trace STARK
proof system (stacked PCS + LogUp GKR + batched zerocheck sumcheck with
univariate skip + stacked opening reduction + WHIR), with the same
capabilities as the reference ``openvm-org/stark-backend`` Rust workspace.
"""

__version__ = "0.1.0"
