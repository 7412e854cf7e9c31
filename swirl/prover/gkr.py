"""LogUp fractional sumcheck via a GKR layered circuit (device).

Proves sum over the hypercube of p(y)/q(y) (projective fraction addition) by
building the fraction segment tree on device and, per layer, running a
degree-3 batch sumcheck over
``eq(xi, Y) * (p0*q1 + p1*q0 + lambda * q0*q1)`` (cf. reference
``crates/stark-backend/src/prover/logup_zerocheck/fractional_sumcheck_gkr.rs``
and the CUDA strategy notes in ``docs/cuda-backend/gkr-prover.md``).

Device layout: each tree layer keeps separate p and q arrays in
COMPONENT-FIRST form (4, 2^t) — the EF component axis leads and the big data
axis is minormost, so XLA:TPU tiles every bulk intermediate (and every jit
argument) at full (8,128) lane utilization. The previous trailing-component
(2^t, 4) layout let layout assignment put the tiny axes on the lanes:
measured 63 ms per 16 MB reduce-fusion inside the layer scans (~0.3 GB/s)
and a 25.6x-padded 16 GB `cols` argument buffer (runtime HBM OOM). The
(2^t, 4) interface with the caller is preserved; the transpose happens once
at entry.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import ext as hext
from ..fields import jfield as jf
from ..proof import GkrLayerClaims, GkrProof
from ..transcript import Transcript
from .sumcheck import fold_mle_vec
from .vmode import vm


def _pair_split_cf(cols):
    """(5, 4, m) -> even/odd element pairs as two (5, 4, m/2) views."""
    pairs = cols.reshape(cols.shape[0], 4, -1, 2)
    return pairs[..., 0], pairs[..., 1]


@jax.jit
def _gkr_round_evals(cols, lam_cf):
    """Degree-3 round-poly evaluations at X in {1,2,3}.

    cols: (5, 4, m) component-first stacked [eq, p0, q0, p1, q1] MLEs;
    lam_cf: (4, 1). Returns (3, 4) — identical values (modular sums are
    order-independent) to the previous trailing-component form."""
    t0, t1 = _pair_split_cf(cols)
    d = jf.sub(t1, t0)
    out = []
    for x in (1, 2, 3):
        cx = t1 if x == 1 else jf.add(t0, jf.mul(d, jf.const(x)))
        e, a0, b0, a1, b1 = cx[0], cx[1], cx[2], cx[3], cx[4]
        p_prev = jf.add(jf.ext_mul_cf(a0, b1), jf.ext_mul_cf(a1, b0))
        q_prev = jf.ext_mul_cf(b0, b1)
        val = jf.ext_mul_cf(e, jf.add(p_prev, jf.ext_mul_cf(lam_cf, q_prev)))
        out.append(jf.base_sum(val, axis=-1))
    return jnp.stack(out)


@jax.jit
def _gkr_fold(cols, r_cf):
    """Fold every column MLE by r: (5, 4, m) -> (5, 4, m/2); r_cf (4, 1)."""
    t0, t1 = _pair_split_cf(cols)
    return jf.add(t0, jf.ext_mul_cf(jf.sub(t1, t0), r_cf))


# sample_idx value after any EF squeeze (RATE - EF_D)
_EF_SAMPLE_IDX = 4


def _scan_ok(transcript) -> bool:
    """The lax.scan tail path applies only to the fused (trace-mode) prover
    driving a DeviceTranscript; host transcripts replay events eagerly."""
    from .device_transcript import DeviceTranscript

    return isinstance(transcript, DeviceTranscript)


# Tail sub-rounds with at most this many ACTIVE PAIRS run inside one
# ``lax.scan`` body per layer (fixed-size buffer, masked) instead of being
# unrolled — the unrolled pyramid is O(total_rounds^2) traced bodies, which
# is what blew up trace+compile time of the fused prover at tall heights.
# A GKR pair-eval is ~17 EF ops, so even a 2^20-entry masked buffer adds
# only ~1e8 EF ops (~tens of ms on a TPU VPU) while removing every
# unrolled head body below 2^20 from the traced program; the MLE rounds
# use a smaller threshold (_MLE_TAIL_LOG) because their body is a full
# constraint-DAG evaluation, where masked-scan overhead is real compute.
_TAIL_LOG = 20
_MLE_TAIL_LOG = 14


# tier-padded scan buffers: layers with 2^rnd <= tier share ONE jitted scan
# body (one traced definition instead of one per distinct layer size). The
# masked sub-round cost of a padded layer is bounded by its tier.
_SCAN_TIERS = (12, 16, 20)


def _scan_tier_entries(size: int) -> int:
    for t in _SCAN_TIERS:
        if size <= (1 << t):
            return 1 << t
    return size


@lru_cache(maxsize=None)
def _layer_scan_step_jit(n_pairs: int):
    """One masked GKR sub-round (eval3 + duplex absorb/squeeze + fold) as a
    SHARED pjit — every layer scan whose buffer is this tier size calls the
    same traced body."""
    from .device_transcript import duplex_absorb_sample_ext

    @jax.jit
    def step(state, cols, active_pairs, lam_cf):
        mask = jax.lax.iota(jnp.uint32, n_pairs) < active_pairs  # bool
        t0, t1 = _pair_split_cf(cols)  # (5, 4, n_pairs)
        d = jf.sub(t1, t0)
        evs = []
        for x in (1, 2, 3):
            cx = t1 if x == 1 else jf.add(t0, jf.mul(d, jf.const(x)))
            e, a0, b0, a1, b1 = cx[0], cx[1], cx[2], cx[3], cx[4]
            p_prev = jf.add(jf.ext_mul_cf(a0, b1), jf.ext_mul_cf(a1, b0))
            q_prev = jf.ext_mul_cf(b0, b1)
            val = jf.ext_mul_cf(
                e, jf.add(p_prev, jf.ext_mul_cf(lam_cf, q_prev))
            )
            evs.append(
                jf.base_sum(jnp.where(mask, val, jnp.uint32(0)), axis=-1)
            )
        evals3 = jnp.stack(evs)  # (3, 4) Monty

        # duplex absorb of 12 felts from absorb_idx=0, then one EF squeeze —
        # the exact DeviceTranscript event sequence (observe_ext x3,
        # sample_ext), which is cursor-uniform per sub-round
        state, r = duplex_absorb_sample_ext(state, evals3.reshape(-1))

        folded = jf.add(t0, jf.ext_mul_cf(d, r[:, None]))  # (5, 4, n_pairs)
        cols = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=-1)
        return state, cols, evals3, r

    return step


def _layer_rounds_scan(state0, cols, lam_cf, num_subs: int):
    """All `num_subs` masked sub-rounds of one GKR layer as ONE lax.scan.

    state0: (16,) sponge state entering with absorb_idx == 0 (guaranteed:
    every entry point follows a ``sample_ext``). cols: (5, 4, B) Monty
    component-first with the ACTIVE entries (2^num_subs of them) contiguous
    at the front of the data axis; the buffer is zero-padded up to the tier
    size so layers share the traced step body.

    Each step is bit-identical to the unrolled path. Returns (final sponge
    state, final cols buffer, (num_subs, 3, 4) evals, (num_subs, 4)
    challenges).
    """
    active = int(cols.shape[-1])
    tier = _scan_tier_entries(active)
    if tier > active:
        cols = jnp.concatenate(
            [cols, jnp.zeros((5, 4, tier - active), jnp.uint32)], axis=-1
        )
    step = _layer_scan_step_jit(tier // 2)

    def body(carry, _):
        state, cols, active_pairs = carry
        state, cols, evals3, r = step(state, cols, active_pairs, lam_cf)
        return (state, cols, active_pairs >> 1), (evals3, r)

    (state, cols, _), (evals_all, r_all) = jax.lax.scan(
        body,
        (state0, cols, jnp.uint32(active // 2)),
        None,
        length=num_subs,
    )
    return state, cols, evals_all, r_all


@dataclass
class FracSumcheckResult:
    fractional_sum: Tuple[np.ndarray, np.ndarray]  # (p, q) EF host
    claims_per_layer: List[GkrLayerClaims]
    sumcheck_polys: List[List[List[np.ndarray]]]
    xi: List[np.ndarray]


def _combine_layer(p, q):
    """(4, 2^t) -> (4, 2^{t-1}): projective fraction addition of pairs
    (component-first)."""
    pv = p.reshape(4, -1, 2)
    qv = q.reshape(4, -1, 2)
    p0, p1 = pv[..., 0], pv[..., 1]
    q0, q1 = qv[..., 0], qv[..., 1]
    p_out = jf.add(jf.ext_mul_cf(p0, q1), jf.ext_mul_cf(p1, q0))
    q_out = jf.ext_mul_cf(q0, q1)
    return p_out, q_out


def _ef(x):
    return vm().ef(x)


def fractional_sumcheck(
    transcript: Transcript, p_evals, q_evals, assert_zero: bool = True
) -> FracSumcheckResult:
    """p_evals, q_evals: device (2^t, 4) EF arrays (may be empty lists)."""
    v = vm()
    if p_evals is None:
        return FracSumcheckResult(
            (v.ext.ezero(), v.ext.eone()), [], [], []
        )
    total_rounds = int(p_evals.shape[0]).bit_length() - 1
    assert p_evals.shape[0] == 1 << total_rounds

    # component-first from here on (see module docstring): (2^t, 4) -> (4, 2^t)
    p_cf = jnp.swapaxes(jnp.asarray(p_evals), 0, 1)
    q_cf = jnp.swapaxes(jnp.asarray(q_evals), 0, 1)

    # build the layer stack: layers[t] has 2^t fractions; layers[total]=input
    layers = [(p_cf, q_cf)]
    while layers[-1][0].shape[-1] > 1:
        layers.append(_combine_layer(*layers[-1]))
    layers.reverse()  # layers[t] now has 2^t entries

    root_p, root_q = _ef(layers[0][0][:, 0]), _ef(layers[0][1][:, 0])
    if assert_zero:
        v.assert_zero(root_p, "LogUp fractional sum is non-zero")
    else:
        transcript.observe_ext(root_p)
    transcript.observe_ext(root_q)

    claims: List[GkrLayerClaims] = []
    sumcheck_polys: List[List[List[np.ndarray]]] = []

    # layer 1 claims checked directly by the verifier
    p1, q1 = layers[1]
    cl = GkrLayerClaims(
        p_xi_0=_ef(p1[:, 0]),
        p_xi_1=_ef(p1[:, 1]),
        q_xi_0=_ef(q1[:, 0]),
        q_xi_1=_ef(q1[:, 1]),
    )
    claims.append(cl)
    for c in (cl.p_xi_0, cl.q_xi_0, cl.p_xi_1, cl.q_xi_1):
        transcript.observe_ext(c)
    mu_1 = transcript.sample_ext()
    xi_prev = [mu_1]

    from .sumcheck import eq_hypercube_dev

    for rnd in range(1, total_rounds):
        lam = transcript.sample_ext()
        lam_cf = jnp.asarray(v.ef_dev(lam)).reshape(4, 1)

        p_next, q_next = layers[rnd + 1]
        size = 1 << rnd
        # columns over y in H_rnd: p(0,y)=p_next[2y], p(1,y)=p_next[2y+1]
        pv = p_next.reshape(4, -1, 2)
        qv = q_next.reshape(4, -1, 2)
        p0, p1v = pv[..., 0], pv[..., 1]
        q0, q1v = qv[..., 0], qv[..., 1]
        eq_tab = jnp.swapaxes(
            jnp.asarray(eq_hypercube_dev(v.stack(xi_prev))), 0, 1
        )

        round_polys: List[List[np.ndarray]] = []
        rho: List[np.ndarray] = []
        # all five column MLEs share length 2^rnd: batch them into one
        # component-first (5, 4, m) array so each sub-round is TWO jitted
        # calls (eval+fold) instead of ~30 inlined slice/mul chains per
        # column
        cols = jnp.stack([jnp.asarray(c) for c in (eq_tab, p0, q0, p1v, q1v)])

        # head: unroll while the buffer is big (shapes shrink geometrically,
        # so these few big sub-rounds carry ~all the FLOPs at full rate)
        head = max(0, rnd - _TAIL_LOG) if _scan_ok(transcript) else rnd
        for sub in range(head):
            evals3 = _gkr_round_evals(cols, lam_cf)
            evals_at = [_ef(evals3[i]) for i in range(3)]
            for c in evals_at:
                transcript.observe_ext(c)
            round_polys.append(evals_at)
            r_sub = transcript.sample_ext()
            rho.append(r_sub)
            r_cf = jnp.asarray(v.ef_dev(r_sub)).reshape(4, 1)
            cols = _gkr_fold(cols, r_cf)

        # tail: one masked lax.scan body per layer (bit-identical events)
        if head < rnd:
            assert transcript.absorb_idx == 0
            state, cols, evals_all, r_all = _layer_rounds_scan(
                transcript.state, cols, lam_cf, rnd - head
            )
            transcript.state = state
            transcript.absorb_idx = 0
            transcript.sample_idx = _EF_SAMPLE_IDX
            for i in range(rnd - head):
                round_polys.append([_ef(evals_all[i, j]) for j in range(3)])
                rho.append(_ef(r_all[i]))

        cl = GkrLayerClaims(
            p_xi_0=_ef(cols[1, :, 0]),
            q_xi_0=_ef(cols[2, :, 0]),
            p_xi_1=_ef(cols[3, :, 0]),
            q_xi_1=_ef(cols[4, :, 0]),
        )
        claims.append(cl)
        for c in (cl.p_xi_0, cl.q_xi_0, cl.p_xi_1, cl.q_xi_1):
            transcript.observe_ext(c)
        mu = transcript.sample_ext()
        xi_prev = [mu] + rho
        sumcheck_polys.append(round_polys)

    return FracSumcheckResult(
        fractional_sum=(root_p, root_q),
        claims_per_layer=claims,
        sumcheck_polys=sumcheck_polys,
        xi=xi_prev,
    )
