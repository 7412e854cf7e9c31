"""Duplex-sponge Fiat-Shamir transcript living on device, for the fused
single-program prover.

Mirrors :class:`swirl.transcript.Transcript` bit-for-bit: same overwrite
duplex semantics, same Poseidon2 permutation (the device permutation is
tested equal to the host one), same grind scan order — so a fused proof is
byte-identical to a host-path proof.

The state is a (16,) Monty-form traced array; absorb/sample cursors are
*Python* ints — the protocol's observe/sample sequence is static given the
proof shape, so cursor control flow happens at trace time. Every
permutation call goes through an inner ``jax.jit`` so the unrolled
transcript contributes one call HLO per permutation instead of inlining
~2k ops each time.

Value conventions (trace mode):
- ``observe(v)`` / ``check_witness`` / ``grind``: canonical scalars
  (Python ints or traced uint32).
- ``observe_ext`` / ``observe_commit`` with traced arrays: Monty form.
- ``sample`` / ``sample_ext``: return Monty form; ``sample_bits`` returns a
  canonical traced uint32 (for query indices).

This is the TPU-native extreme of the reference's device-resident sponge
(``cuda-backend/src/sponge.rs`` keeps a GPU mirror and syncs with the host;
here the *entire prove* is one XLA program, so there is nothing to sync).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import jfield as jf
from ..fields.babybear import P
from ..hash.poseidon2 import DIGEST, RATE, WIDTH

EF_D = 4


@lru_cache(maxsize=None)
def _permute_jit():
    from ..hash import jposeidon2 as jp2

    return jax.jit(jp2.permute)


@lru_cache(maxsize=None)
def _grind_batch_jit(absorb_idx: int, sample_idx: int, bits: int, batch: int):
    """One grind probe step: try `batch` candidate witnesses from `start`.

    Returns (found, witness): first (lowest) candidate in the batch whose
    post-observe sample has `bits` low zero bits, matching the host scan
    order exactly.
    """
    from ..hash import jposeidon2 as jp2

    mask = np.uint32((1 << bits) - 1)

    @jax.jit
    def step(state, start):
        cand = start + jax.lax.broadcasted_iota(jnp.uint32, (batch, 1), 0)[:, 0]
        states = jnp.broadcast_to(state, (batch, WIDTH))
        states = states.at[:, absorb_idx].set(jf.from_u32(cand))
        a_idx = absorb_idx + 1
        s_idx = sample_idx
        if a_idx == RATE:
            states = jp2.permute(states)
            a_idx, s_idx = 0, RATE
        if a_idx != 0 or s_idx == 0:
            states = jp2.permute(states)
            s_idx = RATE
        s_idx -= 1
        hits = (jf.to_u32(states[:, s_idx]) & mask) == 0
        found = jnp.any(hits)
        first = jnp.argmax(hits).astype(jnp.uint32)
        return found, start + first

    return step


@lru_cache(maxsize=None)
def _sample_bits_batch_jit(absorb_idx: int, sample_idx: int, bits: int, n: int):
    """n sequential duplex squeezes (static cursor schedule) + bit masks."""
    mask = np.uint32((1 << bits) - 1)

    @jax.jit
    def f(state):
        permute = _permute_jit()
        a, s = absorb_idx, sample_idx
        outs = []
        for _ in range(n):
            if a != 0 or s == 0:
                state = permute(state)
                a, s = 0, RATE
            s -= 1
            outs.append(jf.to_u32(state[s]) & mask)
        return state, jnp.stack(outs)

    return f


def duplex_absorb_sample_ext(state, flat):
    """Traced helper for scan-tier sumcheck bodies: from ``absorb_idx == 0``
    absorb `flat` (F,) Monty felts in overwrite-duplex chunks, then squeeze
    one EF challenge. Returns ``(state, r)``.

    Bit-identical to F sequential :meth:`DeviceTranscript.observe` calls
    followed by :meth:`DeviceTranscript.sample_ext`; the exit cursor state
    is uniformly ``absorb_idx=0, sample_idx=RATE-EF_D`` for any static F>0,
    which is what makes per-round sumcheck bodies scan-able."""
    permute = _permute_jit()  # pjit: ONE traced body shared by every call

    f_len = int(flat.shape[0])
    assert f_len > 0
    a = 0
    off = 0
    while off < f_len:
        c = min(RATE - a, f_len - off)
        state = jax.lax.dynamic_update_slice(state, flat[off : off + c], (a,))
        a += c
        off += c
        if a == RATE:
            state = permute(state)
            a = 0
    if a != 0:
        state = permute(state)
    r = state[RATE - EF_D : RATE][::-1]
    return state, r


class DeviceTranscript:
    """Traced duplex sponge (overwrite mode, WIDTH 16 / RATE 8)."""

    __slots__ = ("state", "absorb_idx", "sample_idx")

    def __init__(self):
        self.state = jnp.zeros(WIDTH, jnp.uint32)
        self.absorb_idx = 0
        self.sample_idx = 0

    def _permute(self):
        self.state = _permute_jit()(self.state)

    # -- core duplex ops ----------------------------------------------------

    def _observe_monty(self, v) -> None:
        self.state = self.state.at[self.absorb_idx].set(v)
        self.absorb_idx += 1
        if self.absorb_idx == RATE:
            self._permute()
            self.absorb_idx = 0
            self.sample_idx = RATE

    def _observe_monty_vec(self, flat) -> None:
        """Absorb a flat (k,) Monty vector in rate-sized chunks.

        Bit-identical to k sequential :meth:`_observe_monty` calls, but each
        chunk is ONE dynamic_update_slice (cursors are trace-time Python
        ints) — per-felt scatters were a dominant share of the fused
        prover's HLO op count. Long runs of FULL rate blocks additionally
        collapse into ONE ``lax.scan`` (overwrite + permute per block) — a
        2^10-coefficient WHIR final poly otherwise unrolls ~512 sequential
        permute calls into the program."""
        k = int(flat.shape[0])
        off = 0
        while off < k:
            # scan tier: whole rate blocks from a rate-aligned cursor
            n_blocks = (k - off) // RATE if self.absorb_idx == 0 else 0
            if n_blocks >= 8:
                blocks = flat[off : off + n_blocks * RATE].reshape(
                    n_blocks, RATE
                )

                def absorb_block(state, block):
                    st = jax.lax.dynamic_update_slice(state, block, (0,))
                    return _permute_jit()(st), None

                self.state, _ = jax.lax.scan(
                    absorb_block, self.state, blocks
                )
                self.sample_idx = RATE
                off += n_blocks * RATE
                continue
            c = min(RATE - self.absorb_idx, k - off)
            self.state = jax.lax.dynamic_update_slice(
                self.state, flat[off : off + c], (self.absorb_idx,)
            )
            self.absorb_idx += c
            off += c
            if self.absorb_idx == RATE:
                self._permute()
                self.absorb_idx = 0
                self.sample_idx = RATE

    def observe(self, value) -> None:
        if isinstance(value, (int, np.integer)):
            self._observe_monty(jnp.uint32(jf.const(int(value) % P)))
        else:
            self._observe_monty(jf.from_u32(jnp.asarray(value, jnp.uint32)))

    def sample(self):
        """One squeezed element, Monty form."""
        if self.absorb_idx != 0 or self.sample_idx == 0:
            self._permute()
            self.absorb_idx = 0
            self.sample_idx = RATE
        self.sample_idx -= 1
        return self.state[self.sample_idx]

    # -- derived ops ----------------------------------------------------------

    def observe_slice(self, values) -> None:
        if isinstance(values, (list, tuple)):
            for v in values:
                self.observe(v)
            return
        arr = values
        if isinstance(arr, np.ndarray):
            for v in np.asarray(arr, dtype=np.uint64).ravel():
                self.observe(int(v))
        else:
            self._observe_monty_vec(jnp.ravel(arr))  # traced arrays are Monty

    def observe_commit(self, digest) -> None:
        if isinstance(digest, np.ndarray) and digest.dtype == np.uint64:
            assert digest.ravel().shape[0] == DIGEST
            self.observe_slice(digest)
        else:  # device digests (jnp or numpy uint32) are Monty form
            d = jnp.ravel(jnp.asarray(digest))
            assert d.shape[0] == DIGEST
            self._observe_monty_vec(d)

    def observe_ext(self, value) -> None:
        if isinstance(value, np.ndarray) and value.dtype == np.uint64:
            for v in value.ravel():
                self.observe(int(v))
            return
        v = jnp.ravel(value)
        assert v.shape[0] == EF_D
        self._observe_monty_vec(v)

    def sample_ext(self):
        # fast path: 4 consecutive squeezes with no interleaved permute are
        # one reversed length-4 slice of the state
        if self.absorb_idx != 0 or self.sample_idx == 0:
            self._permute()
            self.absorb_idx = 0
            self.sample_idx = RATE
        if self.sample_idx >= EF_D:
            s = self.sample_idx
            self.sample_idx -= EF_D
            return jax.lax.slice(self.state, (s - EF_D,), (s,))[::-1]
        return jnp.stack([self.sample() for _ in range(EF_D)])

    def sample_bits(self, bits: int):
        assert 0 <= bits < 32 and (1 << bits) < P
        return jf.to_u32(self.sample()) & jnp.uint32((1 << bits) - 1)

    def sample_bits_batch(self, bits: int, n: int):
        """``n`` consecutive :meth:`sample_bits` as ONE jitted program.

        Bit-identical squeeze/permute schedule; returns an (n,) canonical
        uint32 array. The WHIR query phase samples ~100 indices per round —
        per-sample squeezes were ~2 relay dispatches each in the eager
        prover."""
        assert 0 <= bits < 32 and (1 << bits) < P
        if n == 0:
            return jnp.zeros((0,), jnp.uint32)
        fn = _sample_bits_batch_jit(self.absorb_idx, self.sample_idx, bits, n)
        self.state, out = fn(self.state)
        a, s = self.absorb_idx, self.sample_idx
        for _ in range(n):
            if a != 0 or s == 0:
                a, s = 0, RATE
            s -= 1
        self.absorb_idx, self.sample_idx = a, s
        return out

    # -- proof of work --------------------------------------------------------

    def check_witness(self, bits: int, witness) -> None:
        if bits == 0:
            return
        self.observe(witness)
        self.sample_bits(bits)  # state advance; validity enforced by verifier

    def grind(self, bits: int, batch: int = 65536):
        # batch 2^16: a ~20-bit PoW resolves in ~16 while iterations instead
        # of ~128; the wasted tail probes are free VPU lanes, the saved
        # iterations are real sequential launch latency (TPU profile: the
        # two grinds were 151ms of the WHIR stage at batch 8192).
        assert 0 <= bits < 32 and (1 << bits) < P
        if bits == 0:
            return jnp.uint32(0)
        step = _grind_batch_jit(self.absorb_idx, self.sample_idx, bits, batch)
        state = self.state

        def cond(carry):
            start, found, _ = carry
            return jnp.logical_not(found)

        def body(carry):
            start, _, _ = carry
            found, w = step(state, start)
            return (start + jnp.uint32(batch), found, w)

        _, _, w = jax.lax.while_loop(
            cond, body, (jnp.uint32(0), jnp.bool_(False), jnp.uint32(0))
        )
        self.check_witness(bits, w)
        return w
