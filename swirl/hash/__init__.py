from . import poseidon2

__all__ = ["poseidon2"]
