"""Multi-field hasher + transcript: BabyBear data, BN254 Poseidon2 sponge.

Peer of the reference's outer-recursion hashing tier: ``MultiFieldHasher``
(``crates/stark-backend/src/hasher.rs:87``, packing BabyBear felts into
BN254 scalars before hashing) and ``MultiFieldTranscript``
(``crates/stark-backend/src/transcript/multi_field.rs:25``, a BN254 duplex
sponge that absorbs packed BabyBear felts and unpacks samples back into
BabyBear challenges).

Packing: 8 BabyBear felts (31 bits each, 248 bits total) little-endian per
BN254 scalar. Sampling: one squeezed BN254 scalar yields four BabyBear
samples, each reduced from a disjoint 62-bit window (bias <= 2^-31, same
envelope as the reference's ``sample_bits`` bias analysis,
``transcript/traits.rs:33-52``).

Digests are a single BN254 scalar (vs ``[BabyBear; 8]`` in the inner
scheme), which is what makes the outer proof cheap to verify in a BN254
SNARK circuit.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..fields.babybear import P
from .bn254_poseidon2 import P_BN254, compress2, hash_scalars, permute

FELTS_PER_SCALAR = 8
FELT_BITS = 31
SAMPLES_PER_SCALAR = 4
SAMPLE_BITS = 62
EF_D = 4

RATE = 2
WIDTH = 3


def pack_felts(vals: Sequence[int]) -> List[int]:
    """BabyBear felts -> BN254 scalars, 8 felts little-endian per scalar."""
    out = []
    for i in range(0, len(vals), FELTS_PER_SCALAR):
        acc = 0
        for j, v in enumerate(vals[i : i + FELTS_PER_SCALAR]):
            acc |= (int(v) % P) << (FELT_BITS * j)
        out.append(acc)
    return out


class MultiFieldHasher:
    """Merkle hashing of BabyBear data with BN254 digests."""

    @staticmethod
    def hash_slice(vals) -> int:
        flat = [int(v) for v in np.asarray(vals, dtype=np.uint64).ravel()]
        return hash_scalars(pack_felts(flat))

    @staticmethod
    def compress(left: int, right: int) -> int:
        return compress2(left, right)

    @classmethod
    def merkle_root(cls, rows: Sequence[Sequence[int]]) -> int:
        """Root over leaf rows (power-of-two count)."""
        layer = [cls.hash_slice(r) for r in rows]
        assert layer and (len(layer) & (len(layer) - 1)) == 0
        while len(layer) > 1:
            layer = [
                cls.compress(layer[2 * i], layer[2 * i + 1])
                for i in range(len(layer) // 2)
            ]
        return layer[0]


class MultiFieldTranscript:
    """Duplex-sponge Fiat-Shamir over BN254 absorbing/squeezing BabyBear.

    Same observable API as :class:`swirl.transcript.Transcript` so the
    prover/verifier pipeline can run under the outer hash scheme unchanged:
    observe/observe_slice/observe_ext/observe_commit, sample/sample_ext/
    sample_bits, check_witness/grind.
    """

    __slots__ = ("state", "_obs_buf", "_samples", "log", "_record")

    def __init__(self, record: bool = False):
        self.state = [0] * WIDTH
        self._obs_buf: List[int] = []  # pending BabyBear felts (< 8)
        self._samples: List[int] = []  # unpacked BabyBear samples available
        self._record = record
        self.log = [] if record else None

    def clone(self) -> "MultiFieldTranscript":
        t = MultiFieldTranscript()
        t.state = list(self.state)
        t._obs_buf = list(self._obs_buf)
        t._samples = list(self._samples)
        return t

    # -- absorb ------------------------------------------------------------

    def _absorb_scalar(self, v: int) -> None:
        # overwrite-mode duplex at rate 2: buffer one scalar, permute on 2
        self.state[0] = self.state[1]
        self.state[1] = v % P_BN254
        self.state = permute(self.state, WIDTH)

    def observe(self, value) -> None:
        v = int(value) % P
        if self._record:
            self.log.append(("observe", v))
        self._samples.clear()
        self._obs_buf.append(v)
        if len(self._obs_buf) == FELTS_PER_SCALAR:
            self._absorb_scalar(pack_felts(self._obs_buf)[0])
            self._obs_buf.clear()

    def observe_slice(self, values) -> None:
        for v in np.asarray(values, dtype=np.uint64).ravel():
            self.observe(int(v))

    def observe_ext(self, value) -> None:
        v = np.asarray(value, dtype=np.uint64).ravel()
        assert v.shape[0] == EF_D
        self.observe_slice(v)

    def observe_commit(self, digest) -> None:
        """Observe a BN254 digest (int) or an inner [F;8] digest array."""
        if isinstance(digest, (int, np.integer)):
            self._flush()
            self._samples.clear()
            self._absorb_scalar(int(digest))
        else:
            self.observe_slice(digest)

    def _flush(self) -> None:
        if self._obs_buf:
            self._absorb_scalar(pack_felts(self._obs_buf)[0])
            self._obs_buf.clear()

    # -- squeeze -----------------------------------------------------------

    def sample(self) -> int:
        if self._obs_buf or not self._samples:
            self._flush()
            self.state = permute(self.state, WIDTH)
            out = self.state[0]
            self._samples = [
                (out >> (SAMPLE_BITS * i)) & ((1 << SAMPLE_BITS) - 1)
                for i in range(SAMPLES_PER_SCALAR)
            ]
        v = self._samples.pop() % P
        if self._record:
            self.log.append(("sample", v))
        return v

    def sample_ext(self) -> np.ndarray:
        return np.array([self.sample() for _ in range(EF_D)], dtype=np.uint64)

    def sample_bits(self, bits: int) -> int:
        assert 0 <= bits < 32 and (1 << bits) < P
        return self.sample() & ((1 << bits) - 1)

    # -- proof of work -----------------------------------------------------

    def check_witness(self, bits: int, witness) -> bool:
        if bits == 0:
            return True
        self.observe(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int) -> int:
        assert 0 <= bits < 32 and (1 << bits) < P
        if bits == 0:
            assert self.check_witness(bits, 0)
            return 0
        w = 0
        while True:
            probe = self.clone()
            if probe.check_witness(bits, w):
                ok = self.check_witness(bits, w)
                assert ok
                return w
            w += 1
