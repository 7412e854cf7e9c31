"""LogUp fractional sumcheck via a GKR layered circuit (device).

Proves sum over the hypercube of p(y)/q(y) (projective fraction addition) by
building the fraction segment tree on device and, per layer, running a
degree-3 batch sumcheck over
``eq(xi, Y) * (p0*q1 + p1*q0 + lambda * q0*q1)`` (cf. reference
``crates/stark-backend/src/prover/logup_zerocheck/fractional_sumcheck_gkr.rs``
and the CUDA strategy notes in ``docs/cuda-backend/gkr-prover.md``).

Device layout: every bulk buffer is a SEPARATE (2^t, 4) EF array — the big
data axis is dim0 and the only other axis is the 4-component tail. XLA:TPU's
layout assignment on this chip consistently puts dim0 minormost: (m, 4) gets
{0,1} with m on the 128 lanes (full utilization), while ANY leading small
axis — a stacked (5, m, 4) or component-first (5, 4, m) column batch — gets
dim0=5 on the lanes: 25.6x tile padding (observed as a 16 GB remat copy of a
640 MB buffer -> HBM OOM) and 63 ms per 16 MB reduce-fusion inside the layer
scans. So the five layer MLEs [eq, p0, q0, p1, q1] are passed and carried as
five separate arrays, never stacked along a leading column axis.
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


def _pair_split(col):
    """(m, 4) -> logical pair halves as two (m/2, 4) CONTIGUOUS views.

    The GKR device path keeps every MLE in BIT-REVERSED index order (the
    input is permuted once at fractional_sumcheck entry, and the eq tables
    are built bit-reversed), so the logical pair (2i, 2i+1) lives at
    positions (i, i + m/2): both halves are contiguous slices. The
    previous natural-order layout needed stride-2 dim0 slices, which
    defeat the TPU's (8,128) lane tiling — A/B on the v5e at 2^23: 369.6
    ms/iter stride-2 vs 46.4 ms contiguous (8x). Folding halves keeps the
    result bit-reversed recursively (the same recursion the natural-order
    NTT in prover/ntt.py exploits), and index 0 — where the final claims
    live — is a fixed point of bit reversal, so transcripts and proof
    values are unchanged (CI byte-identity pins this)."""
    h = int(col.shape[0]) // 2
    return col[:h], col[h:]


@jax.jit
def _gkr_round_evals(cols, lam_dev):
    """Degree-3 round-poly evaluations at X in {1,2,3}.

    cols: tuple of five (m, 4) MLEs [eq, p0, q0, p1, q1]; lam_dev: (4,).
    Returns (3, 4)."""
    splits = [_pair_split(c) for c in cols]
    out = []
    for x in (1, 2, 3):
        if x == 1:
            e, a0, b0, a1, b1 = (t1 for _, t1 in splits)
        else:
            xs = jf.const(x)
            e, a0, b0, a1, b1 = (
                jf.ext_add(t0, jf.ext_scale(jf.ext_sub(t1, t0), xs))
                for t0, t1 in splits
            )
        p_prev = jf.ext_add(jf.ext_mul(a0, b1), jf.ext_mul(a1, b0))
        q_prev = jf.ext_mul(b0, b1)
        val = jf.ext_mul(e, jf.ext_add(p_prev, jf.ext_mul(lam_dev, q_prev)))
        out.append(jf.ext_sum(val, axis=0))
    return jnp.stack(out)


@jax.jit
def _gkr_fold(cols, r_dev):
    """Fold every column MLE by r: five (m, 4) -> five (m/2, 4)."""
    folded = []
    for c in cols:
        t0, t1 = _pair_split(c)
        folded.append(jf.ext_add(t0, jf.ext_mul(jf.ext_sub(t1, t0), r_dev)))
    return tuple(folded)


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
# A/B-measured on the chip in round 4: widening to 18 (scanning the two
# head MLE rounds at the bench shape) traded ~30 eager dispatches for 8x
# the masked DAG compute and measured ~9 s WORSE on the RAP stage; the
# unrolled head rounds carry ~half the true work at full rate.
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
    def step(state, cols, active_pairs, lam_dev):
        mask = jax.lax.iota(jnp.uint32, n_pairs) < active_pairs  # bool
        # bit-reversed halves with a DYNAMIC active size: t0 is the buffer
        # front (active evens live in rows < active_pairs), t1 starts at the
        # ACTIVE half (rows beyond the active region are zeros, so folded
        # tail rows stay zero without extra masking)
        splits = []
        for c in cols:
            t0 = c[:n_pairs]
            t1 = jax.lax.dynamic_slice(
                c, (active_pairs, jnp.uint32(0)), (n_pairs, 4)
            )
            splits.append((t0, t1))
        evs = []
        for x in (1, 2, 3):
            if x == 1:
                e, a0, b0, a1, b1 = (t1 for _, t1 in splits)
            else:
                xs = jf.const(x)
                e, a0, b0, a1, b1 = (
                    jf.ext_add(t0, jf.ext_scale(jf.ext_sub(t1, t0), xs))
                    for t0, t1 in splits
                )
            p_prev = jf.ext_add(jf.ext_mul(a0, b1), jf.ext_mul(a1, b0))
            q_prev = jf.ext_mul(b0, b1)
            val = jf.ext_mul(e, jf.ext_add(p_prev, jf.ext_mul(lam_dev, q_prev)))
            evs.append(
                jf.ext_sum(
                    jnp.where(mask[:, None], val, jnp.uint32(0)), axis=0
                )
            )
        evals3 = jnp.stack(evs)  # (3, 4) Monty

        # duplex absorb of 12 felts from absorb_idx=0, then one EF squeeze —
        # the exact DeviceTranscript event sequence (observe_ext x3,
        # sample_ext), which is cursor-uniform per sub-round
        state, r = duplex_absorb_sample_ext(state, evals3.reshape(-1))

        cols = tuple(
            jnp.concatenate(
                [
                    jf.ext_add(t0, jf.ext_mul(jf.ext_sub(t1, t0), r)),
                    jnp.zeros((n_pairs, 4), jnp.uint32),
                ],
                axis=0,
            )
            for t0, t1 in splits
        )
        return state, cols, evals3, r

    return step


EF_D_ = 4


@lru_cache(maxsize=None)
def _absorb16_sample_jit():
    from .device_transcript import duplex_absorb_sample_ext

    @jax.jit
    def f(state, claims4):
        return duplex_absorb_sample_ext(state, claims4.reshape(-1))

    return f


def _layer_big(transcript, rnd, head, p_next, q_next, xi_stack):
    """Per-op variant of :func:`_layer_full_jit` for layers above the scan
    threshold: head sub-rounds run as separate jitted eval/fold calls on
    the full-size buffers (per-op layouts are proven on this chip; one big
    program at these sizes has hit 32x tile padding), the tail as the
    masked scan. Identical duplex schedule and stacked outputs."""
    from .sumcheck import eq_hypercube_dev

    lam_dev = jnp.asarray(transcript.sample_ext())
    eq_tab = eq_hypercube_dev(xi_stack, bitrev=True)
    p0, p1v = _pair_split(p_next)
    q0, q1v = _pair_split(q_next)
    cols = (eq_tab, p0, q0, p1v, q1v)
    head_evals, head_r = [], []
    for _ in range(head):
        evals3 = _gkr_round_evals(cols, lam_dev)
        # same duplex events as observe_ext x3 + sample_ext
        transcript.observe_slice(jnp.ravel(evals3))
        r = jnp.asarray(transcript.sample_ext())
        head_evals.append(evals3)
        head_r.append(r)
        cols = _gkr_fold(cols, r)
    assert transcript.absorb_idx == 0
    state, cols, tail_evals, tail_r = _layer_rounds_scan(
        transcript.state, cols, lam_dev, rnd - head
    )
    evals_all = jnp.concatenate([jnp.stack(head_evals), tail_evals])
    r_all = jnp.concatenate([jnp.stack(head_r), tail_r])
    claims4 = jnp.stack([cols[1][0], cols[2][0], cols[3][0], cols[4][0]])
    state, mu = _absorb16_sample_jit()(state, claims4)
    xi_next = jnp.concatenate([mu[None], r_all])
    return state, evals_all, claims4, xi_next


def _check_entry_si(entry_si: int, who: str) -> None:
    # The inlined sample_ext permutes whenever entry_si < EF_D_, which
    # matches DeviceTranscript.sample_ext only for entry_si == 0 (the {1,2,3}
    # cursors squeeze remaining elements one at a time there). GKR layer
    # entry cursors are always 0/4/8 today; refuse to build a program for a
    # cursor the inline schedule would get wrong.
    if not (entry_si == 0 or entry_si >= EF_D_):
        raise AssertionError(
            f"{who}: unsupported entry sample_idx {entry_si}; the inlined "
            f"sample_ext only matches the host schedule for cursors 0 or "
            f">= {EF_D_}"
        )


def _layer_body(state, p_next, q_next, xi_stack, entry_si: int, rnd: int, head: int):
    """Traced body of one full GKR layer: sample lambda, build the eq
    table, run `head` unrolled full-rate sub-rounds, scan the masked tail,
    absorb the next layer's four claims, squeeze mu.

    Bit-identical to the per-op sequence (``sample_ext``, per-sub-round
    eval/observe_ext x3/sample_ext/fold, claims observe_ext x4,
    ``sample_ext``): the duplex events are cursor-uniform, so the whole
    layer's sponge schedule is static. Exit cursors are uniformly
    ``absorb_idx=0, sample_idx=RATE-EF_D`` (after the mu squeeze).

    entry_si: transcript.sample_idx at layer entry (absorb_idx must be 0,
    which every ``sample_ext`` guarantees).
    """
    from .device_transcript import _permute_jit, duplex_absorb_sample_ext
    from .sumcheck import eq_hypercube_dev

    # lam = sample_ext() at a static cursor
    si = entry_si
    if si < EF_D_:
        state = _permute_jit()(state)
        si = 8
    lam_dev = jax.lax.slice(state, (si - EF_D_,), (si,))[::-1]

    eq_tab = eq_hypercube_dev(xi_stack, bitrev=True)
    p0, p1v = _pair_split(p_next)
    q0, q1v = _pair_split(q_next)
    cols = (eq_tab, p0, q0, p1v, q1v)

    head_evals = []
    head_r = []
    for _ in range(head):
        evals3 = _gkr_round_evals(cols, lam_dev)
        state, r = duplex_absorb_sample_ext(state, evals3.reshape(-1))
        head_evals.append(evals3)
        head_r.append(r)
        cols = _gkr_fold(cols, r)
    if head < rnd:
        state, cols, tail_evals, tail_r = _layer_rounds_scan(
            state, cols, lam_dev, rnd - head
        )
        evals_all = (
            jnp.concatenate([jnp.stack(head_evals), tail_evals])
            if head
            else tail_evals
        )
        r_all = (
            jnp.concatenate([jnp.stack(head_r), tail_r])
            if head
            else tail_r
        )
    else:
        evals_all = jnp.stack(head_evals)
        r_all = jnp.stack(head_r)

    claims4 = jnp.stack(
        [cols[1][0], cols[2][0], cols[3][0], cols[4][0]]
    )
    state, mu = duplex_absorb_sample_ext(state, claims4.reshape(-1))
    xi_next = jnp.concatenate([mu[None], r_all])
    return state, evals_all, claims4, xi_next


@lru_cache(maxsize=None)
def _layer_full_jit(rnd: int, head: int, entry_si: int):
    """ONE jitted program for an entire GKR layer (see :func:`_layer_body`).

    The eager fused prover calls this once per layer — ~10 relay dispatches
    collapse into one — and the traced prover inlines the same body, so
    there is exactly one definition of the layer schedule."""
    _check_entry_si(entry_si, "_layer_full_jit")

    @jax.jit
    def layer(state, p_next, q_next, xi_stack):
        return _layer_body(state, p_next, q_next, xi_stack, entry_si, rnd, head)

    return layer


@lru_cache(maxsize=None)
def _layer_group_jit(rnd_lo: int, rnd_hi: int, entry_si: int):
    """Layers ``rnd_lo..rnd_hi`` (all fully inside the scan tail, head==0)
    chained as ONE jitted program — the eager prover pays one relay
    dispatch for the whole group instead of one per layer.

    Per-layer evals are zero-padded to ``rnd_hi`` sub-rounds so the group
    returns uniform stacked outputs ``(G, rnd_hi, 3, 4)`` / ``(G, 4, 4)``;
    the caller slices the true ``rnd`` prefix per layer (host-side numpy
    after the batched fetch, or free symbolic slices under an outer trace).
    Program size stays modest because every layer in a tier calls the SAME
    inner scan-step pjit (one lowered callee per tier), and the per-layer
    glue (eq table, pads, claims, two permutes) is small."""
    _check_entry_si(entry_si, "_layer_group_jit")

    @jax.jit
    def group(state, p_list, q_list, xi_stack):
        evals_out = []
        claims_out = []
        si = entry_si
        for i, rnd in enumerate(range(rnd_lo, rnd_hi + 1)):
            state, evals_all, claims4, xi_stack = _layer_body(
                state, p_list[i], q_list[i], xi_stack, si, rnd, 0
            )
            si = _EF_SAMPLE_IDX  # uniform exit cursor after the mu squeeze
            pad = rnd_hi - rnd
            if pad:
                evals_all = jnp.concatenate(
                    [evals_all, jnp.zeros((pad, 3, 4), jnp.uint32)]
                )
            evals_out.append(evals_all)
            claims_out.append(claims4)
        return state, jnp.stack(evals_out), jnp.stack(claims_out), xi_stack

    return group


def _layer_rounds_scan(state0, cols, lam_dev, num_subs: int):
    """All `num_subs` masked sub-rounds of one GKR layer as ONE lax.scan.

    state0: (16,) sponge state entering with absorb_idx == 0 (guaranteed:
    every entry point follows a ``sample_ext``). cols: tuple of five (B, 4)
    Monty arrays with the ACTIVE entries (2^num_subs of them) contiguous at
    the front; each buffer is zero-padded up to the tier size so layers
    share the traced step body.

    Each step is bit-identical to the unrolled path. Returns (final sponge
    state, final cols buffers, (num_subs, 3, 4) evals, (num_subs, 4)
    challenges).
    """
    active = int(cols[0].shape[0])
    tier = _scan_tier_entries(active)
    if tier > active:
        pad = jnp.zeros((tier - active, 4), jnp.uint32)
        cols = tuple(jnp.concatenate([c, pad], axis=0) for c in cols)
    step = _layer_scan_step_jit(tier // 2)

    def body(carry, _):
        state, cols, active_pairs = carry
        state, cols, evals3, r = step(state, cols, active_pairs, lam_dev)
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
    # challenge point: a list of (4,) values on the host path, ONE stacked
    # (n, 4) device array on the device (DeviceTranscript) path — exploding
    # the stack into per-element slices cost one relay dispatch each in the
    # eager prover
    xi: object


def _combine_layer_impl(p, q):
    """(2^t, 4) -> (2^{t-1}, 4): projective fraction addition of pairs."""
    p0, p1 = _pair_split(p)
    q0, q1 = _pair_split(q)
    p_out = jf.ext_add(jf.ext_mul(p0, q1), jf.ext_mul(p1, q0))
    q_out = jf.ext_mul(q0, q1)
    return p_out, q_out


# jitted: one eager dispatch per tree level instead of ~8. Levels above
# _COMBINE_JIT_MAX run as single-level jitted programs (the historical 32x
# tile padding at these sizes came from reshape(-1,2,4)-style pair splits
# inside LARGER fused programs; the stride-2 _pair_split keeps every
# intermediate (m, 4)); set SWIRL_GKR_COMBINE_PER_OP=1 to restore per-op
# dispatch for on-chip A/B.
_combine_layer = jax.jit(_combine_layer_impl)
_COMBINE_JIT_MAX = 1 << 21


@lru_cache(maxsize=None)
def _combine_chain_jit(levels: int):
    """The remaining `levels` of the fraction segment-tree build as ONE
    jitted program: (2^levels, 4) inputs down to the root. Total work is
    ~2x the input size, every intermediate stays (m, 4); one eager
    dispatch replaces one per level (~20 x relay RTT at bench shapes)."""

    @jax.jit
    def chain(p, q):
        outs = []
        for _ in range(levels):
            p, q = _combine_layer_impl(p, q)
            outs.append((p, q))
        return outs

    return chain


def _ef(x):
    return vm().ef(x)


def _sync_mark(label: str, arr) -> None:
    """SWIRL_GKR_SPANS=1: drain the device queue (tiny fetch) and print a
    timestamped mark — on-chip bisection of the eager GKR wall time, where
    async dispatch hides which phase the relay actually spends time in."""
    import os

    if os.environ.get("SWIRL_GKR_SPANS") != "1":
        return
    import sys
    import time

    import jax as _jax

    if isinstance(arr, _jax.core.Tracer):
        return
    np.asarray(_jax.device_get(jnp.ravel(arr)[:1]))
    print(
        f"gkr-span {label} +{time.perf_counter():.3f}", file=sys.stderr, flush=True
    )


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

    # build the layer stack: layers[t] has 2^t fractions; layers[total]=input.
    # The bulk MLEs live in BIT-REVERSED index order end to end (one gather
    # here; see _pair_split) — combines, layer folds and eq tables all pair
    # contiguous halves, and the outputs (pair sums, index-0 claims) are
    # unchanged.
    from .sumcheck import bitrev_permute

    layers = [
        (
            bitrev_permute(jnp.asarray(p_evals)),
            bitrev_permute(jnp.asarray(q_evals)),
        )
    ]
    # biggest levels per-op (proven layouts above _COMBINE_JIT_MAX), the
    # rest of the tree as one chained program
    import os

    _combine_big = (
        _combine_layer_impl
        if os.environ.get("SWIRL_GKR_COMBINE_PER_OP") == "1"
        else _combine_layer
    )
    _sync_mark("frac-entry", layers[0][0])
    while layers[-1][0].shape[0] > _COMBINE_JIT_MAX:
        layers.append(tuple(_combine_big(*layers[-1])))
    _sync_mark("combines", layers[-1][0])
    remaining = int(layers[-1][0].shape[0]).bit_length() - 1
    if remaining > 0:
        layers.extend(_combine_chain_jit(remaining)(*layers[-1]))
    _sync_mark("chain", layers[-1][0])
    assert layers[-1][0].shape[0] == 1
    layers.reverse()  # layers[t] now has 2^t entries

    claims: List[GkrLayerClaims] = []
    sumcheck_polys: List[List[List[np.ndarray]]] = []
    p1, q1 = layers[1]

    from .sumcheck import eq_hypercube_dev

    if _scan_ok(transcript):
        # device path: the tree-root observe, layer-1 claim observes and
        # the mu_1 squeeze run as ONE region program (7 per-op duplex
        # dispatches otherwise); the claim VALUES surface through the
        # batched assembly fetch below instead of eager slices.
        from .regions import run_region

        def root_factory():
            def body(tr, l0, l1):
                p0_, q0_ = l0
                p1_, q1_ = l1
                if not assert_zero:
                    tr.observe_ext(p0_[0])
                tr.observe_ext(q0_[0])
                for c in (p1_[0], q1_[0], p1_[1], q1_[1]):
                    tr.observe_ext(c)
                mu = tr.sample_ext()
                return (
                    mu,
                    jnp.stack([p0_[0], q0_[0]]),
                    jnp.stack([p1_[0], p1_[1], q1_[0], q1_[1]]),
                )

            return body

        mu_1, roots2, claims1 = run_region(
            transcript,
            ("gkr_root", bool(assert_zero)),
            root_factory,
            layers[0],
            layers[1],
        )
        _sync_mark("root-region", mu_1)
        xi_prev = [mu_1]
    else:
        root_p, root_q = _ef(layers[0][0][0]), _ef(layers[0][1][0])
        if assert_zero:
            v.assert_zero(root_p, "LogUp fractional sum is non-zero")
        else:
            transcript.observe_ext(root_p)
        transcript.observe_ext(root_q)

        # layer 1 claims checked directly by the verifier
        cl = GkrLayerClaims(
            p_xi_0=_ef(p1[0]),
            p_xi_1=_ef(p1[1]),
            q_xi_0=_ef(q1[0]),
            q_xi_1=_ef(q1[1]),
        )
        claims.append(cl)
        for c in (cl.p_xi_0, cl.q_xi_0, cl.p_xi_1, cl.q_xi_1):
            transcript.observe_ext(c)
        mu_1 = transcript.sample_ext()
        xi_prev = [mu_1]

    if _scan_ok(transcript):
        # device path: the scan-tail layers (head == 0) run as GROUPED
        # jitted programs — one relay dispatch per group instead of one per
        # layer — and the few layers ABOVE the scan tail threshold keep the
        # per-op head path: their (>= 2^_TAIL_LOG, 4) buffers are where
        # XLA's layout assignment has historically gone 32x-padded inside
        # larger fused programs. Group spans come from SWIRL_GKR_GROUPS
        # (comma-separated upper bounds, default one group for the whole
        # tail) so compile-size regressions can be bisected on-chip without
        # code changes.
        import os

        assert transcript.absorb_idx == 0
        xi_stack = v.stack(xi_prev)
        n_tail = min(total_rounds - 1, _TAIL_LOG)  # layers 1..n_tail
        bounds_env = os.environ.get("SWIRL_GKR_GROUPS", "")
        bounds = (
            [int(b) for b in bounds_env.split(",") if b.strip()]
            if bounds_env
            else []
        )
        spans = []
        lo = 1
        for b in bounds:
            if lo <= min(b, n_tail):
                spans.append((lo, min(b, n_tail)))
                lo = min(b, n_tail) + 1
        if lo <= n_tail:
            spans.append((lo, n_tail))

        group_blocks = []  # (rnd_lo, rnd_hi, evals (G, rnd_hi, 3, 4), claims (G, 4, 4))
        big_blocks = []  # (rnd, evals (rnd, 3, 4), claims (4, 4))
        for rnd_lo, rnd_hi in spans:
            fn = _layer_group_jit(rnd_lo, rnd_hi, transcript.sample_idx)
            state, evals_g, claims_g, xi_stack = fn(
                transcript.state,
                [layers[rnd + 1][0] for rnd in range(rnd_lo, rnd_hi + 1)],
                [layers[rnd + 1][1] for rnd in range(rnd_lo, rnd_hi + 1)],
                xi_stack,
            )
            transcript.state = state
            transcript.absorb_idx = 0
            transcript.sample_idx = _EF_SAMPLE_IDX
            group_blocks.append((rnd_lo, rnd_hi, evals_g, claims_g))
            _sync_mark(f"group-{rnd_lo}-{rnd_hi}", state)
        # layers above the scan tail: ONE program per layer by default —
        # A/B-measured on the chip in round 5 (2^20x64): 17.4 s e2e vs
        # 19.8 s with the per-op head path (the historical 32x tile padding
        # did not reproduce with stride-2 pair splits, though big-layer
        # execution remains well above the VPU bound — see STATUS).
        # SWIRL_GKR_BIG_LAYER_JIT=0 restores the per-op path.
        big_jit = os.environ.get("SWIRL_GKR_BIG_LAYER_JIT", "1") == "1"
        for rnd in range(n_tail + 1, total_rounds):
            head = rnd - _TAIL_LOG
            p_next, q_next = layers[rnd + 1]
            if big_jit:
                fn = _layer_full_jit(rnd, head, transcript.sample_idx)
                state, evals_all, claims4, xi_stack = fn(
                    transcript.state, p_next, q_next, xi_stack
                )
            else:
                state, evals_all, claims4, xi_stack = _layer_big(
                    transcript, rnd, head, p_next, q_next, xi_stack
                )
            transcript.state = state
            transcript.absorb_idx = 0
            transcript.sample_idx = _EF_SAMPLE_IDX
            big_blocks.append((rnd, evals_all, claims4))
            _sync_mark(f"big-{rnd}", state)

        # proof assembly: in the eager prover the stacked outputs are
        # concrete — fetch them in ONE device_get and slice with numpy
        # (per-element jnp slicing was ~1000 relay dispatches); under an
        # outer trace the slices are free symbolic ops
        concrete = not isinstance(transcript.state, jax.core.Tracer)
        if concrete:
            group_blocks, big_blocks, roots2, claims1 = jax.device_get(
                (group_blocks, big_blocks, roots2, claims1)
            )
            _sync_mark("assembly-fetch", transcript.state)
        root_p, root_q = _ef(roots2[0]), _ef(roots2[1])
        claims.append(
            GkrLayerClaims(
                p_xi_0=_ef(claims1[0]),
                p_xi_1=_ef(claims1[1]),
                q_xi_0=_ef(claims1[2]),
                q_xi_1=_ef(claims1[3]),
            )
        )

        def _emit_layer(rnd, evals_all, claims4):
            sumcheck_polys.append(
                [
                    [_ef(evals_all[i, j]) for j in range(3)]
                    for i in range(rnd)
                ]
            )
            claims.append(
                GkrLayerClaims(
                    p_xi_0=_ef(claims4[0]),
                    q_xi_0=_ef(claims4[1]),
                    p_xi_1=_ef(claims4[2]),
                    q_xi_1=_ef(claims4[3]),
                )
            )

        for rnd_lo, rnd_hi, evals_g, claims_g in group_blocks:
            for i, rnd in enumerate(range(rnd_lo, rnd_hi + 1)):
                _emit_layer(rnd, evals_g[i], claims_g[i])
        for rnd, evals_all, claims4 in big_blocks:
            _emit_layer(rnd, evals_all, claims4)
        return FracSumcheckResult(
            fractional_sum=(root_p, root_q),
            claims_per_layer=claims,
            sumcheck_polys=sumcheck_polys,
            xi=xi_stack,
        )

    for rnd in range(1, total_rounds):
        lam = transcript.sample_ext()
        lam_dev = v.ef_dev(lam)

        p_next, q_next = layers[rnd + 1]
        size = 1 << rnd
        # columns over y in H_rnd: p(0,y)=p_next[2y], p(1,y)=p_next[2y+1]
        p0, p1v = _pair_split(p_next)
        q0, q1v = _pair_split(q_next)
        eq_tab = eq_hypercube_dev(v.stack(xi_prev), bitrev=True)

        round_polys: List[List[np.ndarray]] = []
        rho: List[np.ndarray] = []
        cols = tuple(jnp.asarray(c) for c in (eq_tab, p0, q0, p1v, q1v))

        # host/spec path: fully unrolled eager numpy-backed replay
        for sub in range(rnd):
            evals3 = _gkr_round_evals(cols, jnp.asarray(lam_dev))
            evals_at = [_ef(evals3[i]) for i in range(3)]
            for c in evals_at:
                transcript.observe_ext(c)
            round_polys.append(evals_at)
            r_sub = transcript.sample_ext()
            rho.append(r_sub)
            r_dev = v.ef_dev(r_sub)
            cols = _gkr_fold(cols, jnp.asarray(r_dev))

        cl = GkrLayerClaims(
            p_xi_0=_ef(cols[1][0]),
            q_xi_0=_ef(cols[2][0]),
            p_xi_1=_ef(cols[3][0]),
            q_xi_1=_ef(cols[4][0]),
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
