"""Batched zerocheck + LogUp constraint prover (device compute, host
orchestration).

Implements the RAP constraint stage of SWIRL (cf. reference
``crates/stark-backend/src/prover/logup_zerocheck/``): GKR over the LogUp
fraction tree, then one univariate-skip round plus ``n_max`` multilinear
rounds of a front-loaded batch sumcheck over all traces' zerocheck and
LogUp-input polynomials, ending in per-column opening claims at the random
prism point.

Device/host split: all O(height) work (coset evaluation grids, DAG
constraint evaluation, folds, hypercube reductions) is batched JAX; all
O(degree) polynomial assembly (coset interpolation, eq-kernel algebra,
transcript) is host numpy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import ext as hext
from ..fields import jfield as jf
from ..fields.babybear import GENERATOR, P, U64, batch_inverse
from ..params import SystemParams, calculate_n_logup
from ..proof import BatchConstraintProof, GkrProof
from ..symbolic import ConstraintsDag
from ..transcript import Transcript
from .. import poly as hpoly
from .. import metrics
from .dag_eval import (
    DeviceEvaluator,
    HostEvaluator,
    acc_constraints_device,
    acc_constraints_host,
    acc_interactions_device,
    acc_interactions_host,
    interactions_pq_device,
)
from .errors import LogupZerocheckError
from .gkr import fractional_sumcheck
from .stacked_pcs import StackedLayout
from .sumcheck import (
    barycentric_weights_dev,
    coset_eval_chunks,
    eq_hypercube_dev,
    fold_mle,
    fold_ple,
    interp_mle_at_int,
    rot1,
    selectors_matrix,
)
from .vmode import vm


# zerocheck_save_memory engages chunked round-0 grids only for traces with
# at least this many hypercube chunks (8 segments need n_chunks % 8 == 0,
# and small grids are not worth the sequentialization)
_SAVE_MEMORY_MIN_CHUNKS_LOG = 13


def sumcheck_round0_deg(l_skip: int, d: int) -> int:
    return d * ((1 << l_skip) - 1)


def jnp_transpose(v, arr, w: int, l_skip: int):
    """(w * 2^l_skip, 4) coset-major evals -> (2^l_skip, w, 4) grid."""
    del v
    return arr.reshape(w, 1 << l_skip, 4).transpose(1, 0, 2)


@dataclass
class TraceProver:
    """Per-trace prover state."""

    air_id: int
    dag: ConstraintsDag
    needs_next: bool
    d_air: int
    public_values: List[int]
    height: int
    n: int  # log_height - l_skip (may be negative)
    # device base matrices (width, height)
    preprocessed: Optional[jnp.ndarray]
    cached: List[jnp.ndarray]
    common: jnp.ndarray
    # populated during proving: EF part pairs [(local, next|None)] with
    # parts ordered [cached..., common]; preprocessed separate
    prep_pair: Optional[Tuple] = None
    main_pairs: Optional[List[Tuple]] = None
    sels: Optional[jnp.ndarray] = None  # (3, cur_h, 4) EF
    zerocheck_tilde: Optional[np.ndarray] = None
    logup_tilde: Optional[List[np.ndarray]] = None

    @property
    def n_lift(self) -> int:
        return max(self.n, 0)

    def base_parts(self) -> List[jnp.ndarray]:
        return ([self.preprocessed] if self.preprocessed is not None else []) + list(
            self.cached
        ) + [self.common]

    def has_preprocessed(self) -> bool:
        return self.preprocessed is not None


class LogupZerocheckProver:
    def __init__(
        self,
        params: SystemParams,
        global_degree: int,
        traces: List[TraceProver],
    ):
        self.params = params
        self.l_skip = params.l_skip
        self.d = global_degree
        self.traces = traces
        self.n_max = max(max(t.n for t in traces), 0)
        self.xi: List[np.ndarray] = []
        self._eq_tables: Dict[Tuple[int, int], jnp.ndarray] = {}
        self.eq_ns: List[np.ndarray] = []
        self.eq_sharp_ns: List[np.ndarray] = []

    # -- eq tables ----------------------------------------------------------

    def eq_table(self, start: int, end: int) -> jnp.ndarray:
        """Device eq table over xi[start:end] (bit j <-> xi[start + j])."""
        key = (start, end)
        if key not in self._eq_tables:
            v = vm()
            vec = v.stack([self.xi[i] for i in range(start, end)])
            self._eq_tables[key] = eq_hypercube_dev(vec)
        return self._eq_tables[key]


def _validate_trace_dag(t: TraceProver) -> None:
    """Validate every DAG variable against the trace's actual widths before
    evaluation (the reference validates at ``LogupZerocheckCpu::new``:
    ``prover/error.rs`` PreprocessedIndexOutOfBounds /
    MainPartitionIndexOutOfBounds / PublicValueIndexOutOfBounds /
    ChallengeNotSupported)."""
    num_parts = len(t.cached) + 1
    part_widths = [int(m.shape[0]) for m in t.cached] + [int(t.common.shape[0])]
    prep_width = int(t.preprocessed.shape[0]) if t.preprocessed is not None else 0
    for node in t.dag.nodes:
        if node[0] != "var":
            continue
        _, entry, part, _offset, index = node
        if entry == "preprocessed":
            if index >= prep_width:
                raise LogupZerocheckError(
                    f"air {t.air_id}: preprocessed trace index {index} out of "
                    f"bounds for width {prep_width}"
                )
        elif entry == "main":
            if part >= num_parts or index >= part_widths[part]:
                raise LogupZerocheckError(
                    f"air {t.air_id}: main partition {part} col_index {index} "
                    f">= width {part_widths[part] if part < num_parts else 0}"
                )
        elif entry == "public":
            if index >= len(t.public_values):
                raise LogupZerocheckError(
                    f"air {t.air_id}: public value index {index} out of bounds "
                    f"for len {len(t.public_values)}"
                )
        elif entry == "challenge":
            raise LogupZerocheckError(f"air {t.air_id}: challenge not supported")


def _mle_rounds_scan(
    transcript,
    pv,
    traces,
    xi,
    l_skip,
    mu_pows,
    lambda_pows_dev,
    beta_pows_dev,
    bus_terms_host,
    eq_3b_per_trace,
    d_global,
    s_deg,
    rnd0,
    L,
    prev_s_eval,
    r_out,
    polys_out,
):
    """Rounds rnd0..rnd0+L-1 of the batch sumcheck as ONE ``lax.scan``.

    Preconditions (enforced by the caller): trace mode with a
    DeviceTranscript entering at absorb_idx == 0, every trace active
    (rnd <= t.n for all traces, so no tilde tails, sp_tail == 0 and
    norm == 1), and per-trace buffers front-aligned Monty arrays. Events
    and field values are bit-identical to ``_round_unrolled``.

    Appends the per-round challenges to `r_out`, the round polys to
    `polys_out`, and the eq accumulators to ``pv.eq_ns``/``pv.eq_sharp_ns``;
    writes folded buffers back onto the traces; returns the new
    prev_s_eval.
    """
    import jax

    from ..fields import text
    from .. import tpoly
    from .device_transcript import duplex_absorb_sample_ext
    from .vmode import vm as _vm

    v = _vm()
    num_traces = len(traces)

    # per-round constants, stacked over the scan axis
    xi_rounds = jnp.stack(
        [jnp.asarray(xi[l_skip + rnd0 - 1 + j]) for j in range(L)]
    )  # (L, 4)
    one = jnp.asarray(text.eone())
    b_c_rounds = jnp.stack(
        [text.esub(one, xi_rounds[j]) for j in range(L)]
    )  # 1 - xi
    inv_b_c_rounds = jnp.stack(
        [text.einv(b_c_rounds[j]) for j in range(L)]
    )
    a_c_rounds = jnp.stack(
        [text.esub(xi_rounds[j], b_c_rounds[j]) for j in range(L)]
    )

    # per-trace stacked eq tables, zero-padded to the fixed buffer width
    # (zero weights mask the garbage back-half of the folded buffers)
    eq_tabs = []
    for t in traces:
        n_lift = t.n_lift
        b_half = int(t.sels.shape[1]) // 2  # buffer pairs
        tabs = []
        for j in range(L):
            tab = pv.eq_table(l_skip + rnd0 + j, l_skip + n_lift)
            pad = b_half - int(tab.shape[0])
            if pad:
                tab = jnp.concatenate(
                    [tab, jnp.zeros((pad, 4), jnp.uint32)], axis=0
                )
            tabs.append(tab)
        eq_tabs.append(jnp.stack(tabs))  # (L, b_half, 4)

    bus_terms = [
        bus_terms_host(t) if t.dag.interactions else None for t in traces
    ]
    eq3b = [
        v.const_vec(eq_3b_per_trace[i]) if traces[i].dag.interactions else None
        for i in range(num_traces)
    ]

    def trace_bufs(t):
        return (
            t.sels,
            t.prep_pair,
            tuple(t.main_pairs),
        )

    def body(carry, js):
        state, bufs, eq_n, eq_sharp_n, prev_s = carry
        j = js

        sp_head_zc = [jnp.asarray(text.ezero()) for _ in range(d_global)]
        sp_head_logup = [jnp.asarray(text.ezero()) for _ in range(d_global)]
        new_bufs = []
        for t_idx, t in enumerate(traces):
            sels, prep_pair, main_pairs = bufs[t_idx]
            has_int = bool(t.dag.interactions)
            eq_tab = eq_tabs[t_idx][j]  # (b_half, 4), zero-padded
            zc_w = mu_pows[2 * num_traces + t_idx]
            nm_w = mu_pows[2 * t_idx]
            dn_w = mu_pows[2 * t_idx + 1]
            for xi_i, x in enumerate(range(1, d_global + 1)):
                sels_x = interp_mle_at_int(sels, x)
                all_pairs = ([prep_pair] if t.has_preprocessed() else []) + list(
                    main_pairs
                )
                pairs_x = [
                    (
                        interp_mle_at_int(local, x),
                        interp_mle_at_int(nxt, x) if nxt is not None else None,
                    )
                    for local, nxt in all_pairs
                ]
                prep_x = pairs_x[0] if t.has_preprocessed() else None
                main_x = pairs_x[1:] if t.has_preprocessed() else pairs_x
                ev = DeviceEvaluator(sels_x, prep_x, main_x, t.public_values, True)
                acc = acc_constraints_device(t.dag, ev, lambda_pows_dev)
                zc_val = jf.ext_sum(jf.ext_mul(acc, eq_tab), axis=0)
                sp_head_zc[xi_i] = text.eadd(
                    sp_head_zc[xi_i], text.emul(zc_w, zc_val)
                )
                if has_int:
                    numer, denom = acc_interactions_device(
                        t.dag, ev, beta_pows_dev, bus_terms[t_idx], eq3b[t_idx]
                    )
                    nm = jf.ext_sum(jf.ext_mul(numer, eq_tab), axis=0)
                    dn = jf.ext_sum(jf.ext_mul(denom, eq_tab), axis=0)
                    sp_head_logup[xi_i] = text.eadd(
                        sp_head_logup[xi_i],
                        text.eadd(text.emul(nm_w, nm), text.emul(dn_w, dn)),
                    )

        sp_head_evals = [jnp.asarray(text.ezero())] * s_deg
        for i in range(d_global):
            sp_head_evals[i + 1] = text.eadd(
                text.emul(eq_n, sp_head_zc[i]),
                text.emul(eq_sharp_n, sp_head_logup[i]),
            )
        xi_cur = xi_rounds[j]
        sp_head_evals[0] = text.emul(
            text.esub(prev_s, text.emul(xi_cur, sp_head_evals[1])),
            inv_b_c_rounds[j],
        )
        sp_head_coeffs = tpoly.lagrange_coeffs(
            list(range(s_deg)), jnp.stack(sp_head_evals)
        )
        coeffs = [sp_head_coeffs[i] for i in range(s_deg)] + [
            jnp.asarray(text.ezero())
        ]
        a_c, b_c = a_c_rounds[j], b_c_rounds[j]
        for i in range(s_deg - 1, -1, -1):
            coeffs[i + 1] = text.eadd(
                text.emul(a_c, coeffs[i]), text.emul(b_c, coeffs[i + 1])
            )
        coeffs[0] = text.emul(coeffs[0], b_c)
        coeffs_arr = jnp.stack(coeffs)
        batch_evals = jnp.stack(
            [
                tpoly.horner_eval(coeffs_arr, jnp.asarray(text.from_base(i)))
                for i in range(1, s_deg + 1)
            ]
        )  # (s_deg, 4)

        state, r_rnd = duplex_absorb_sample_ext(state, batch_evals.reshape(-1))
        prev_s = tpoly.horner_eval(coeffs_arr, r_rnd)

        def fold_buf(mat):
            folded = fold_mle(mat, r_rnd)
            return jnp.concatenate([folded, jnp.zeros_like(folded)], axis=1)

        for t_idx, t in enumerate(traces):
            sels, prep_pair, main_pairs = bufs[t_idx]
            sels = fold_buf(sels)
            if prep_pair is not None:
                prep_pair = (
                    fold_buf(prep_pair[0]),
                    fold_buf(prep_pair[1]) if prep_pair[1] is not None else None,
                )
            main_pairs = tuple(
                (
                    fold_buf(local),
                    fold_buf(nxt) if nxt is not None else None,
                )
                for local, nxt in main_pairs
            )
            new_bufs.append((sels, prep_pair, main_pairs))

        eq_mle = tpoly.eval_eq_mle(xi_cur.reshape(1, 4), r_rnd.reshape(1, 4))
        eq_n = text.emul(eq_n, eq_mle)
        eq_sharp_n = text.emul(eq_sharp_n, eq_mle)
        return (
            (state, tuple(new_bufs), eq_n, eq_sharp_n, prev_s),
            (batch_evals, r_rnd, eq_n, eq_sharp_n),
        )

    assert transcript.absorb_idx == 0
    init = (
        transcript.state,
        tuple(trace_bufs(t) for t in traces),
        jnp.asarray(pv.eq_ns[rnd0 - 1]),
        jnp.asarray(pv.eq_sharp_ns[rnd0 - 1]),
        jnp.asarray(prev_s_eval),
    )
    (state, bufs, _, _, prev_s), ys = jax.lax.scan(
        body, init, jnp.arange(L), length=L
    )
    evals_all, r_all, eq_n_all, eq_sharp_all = ys

    from .device_transcript import RATE, EF_D  # cursor constants

    transcript.state = state
    transcript.absorb_idx = 0
    transcript.sample_idx = RATE - EF_D

    if not isinstance(state, jax.core.Tracer):
        # eager fused prover: ONE fetch, then numpy slicing (the per-element
        # jnp slices below are ~8 relay dispatches per scanned round)
        evals_all, r_all, eq_n_all, eq_sharp_all = jax.device_get(
            (evals_all, r_all, eq_n_all, eq_sharp_all)
        )
    for j in range(L):
        polys_out.append([v.ef(evals_all[j, i]) for i in range(s_deg)])
        r_out.append(v.ef(r_all[j]))
        pv.eq_ns.append(v.ef(eq_n_all[j]))
        pv.eq_sharp_ns.append(v.ef(eq_sharp_all[j]))

    # crop the fixed-size buffers back to TRUE folded lengths so post-scan
    # unrolled rounds (ragged tails / host-tilde transitions) see the same
    # physical shapes as the fully-unrolled path
    scan_end = rnd0 + L - 1
    for t_idx, t in enumerate(traces):
        true_len = max(1 << max(t.n_lift - scan_end, 0), 1)

        def crop(m):
            return m[:, :true_len]

        sels, prep_pair, main_pairs = bufs[t_idx]
        t.sels = crop(sels)
        t.prep_pair = (
            None
            if prep_pair is None
            else (
                crop(prep_pair[0]),
                crop(prep_pair[1]) if prep_pair[1] is not None else None,
            )
        )
        t.main_pairs = [
            (crop(local), crop(nxt) if nxt is not None else None)
            for local, nxt in main_pairs
        ]
    return v.ef(prev_s)


def _phase_common(params, global_degree, traces):
    """Host-side prelude shared by both prover phases: validation, the
    round structure (n_max), and the interactions stacked layout. Cheap
    pure-host work, recomputed per phase so the GKR and batch phases can
    compile as SEPARATE device programs (the only device state crossing the
    boundary is the transcript state, xi, and beta)."""
    l_skip = params.l_skip
    if len(traces) == 0:
        raise LogupZerocheckError("prove_zerocheck_and_logup: no traces")
    for t in traces:
        _validate_trace_dag(t)
    pv = LogupZerocheckProver(params, global_degree, traces)

    # interactions stacked layout (striding threshold 0; widths are
    # interaction counts, heights are lifted trace heights)
    total_interactions = 0
    inter_dims = []
    for t in traces:
        num_int = len(t.dag.interactions)
        log_lifted = max(t.height.bit_length() - 1, l_skip)
        total_interactions += num_int << log_lifted
        inter_dims.append((num_int, log_lifted))
    n_logup = calculate_n_logup(l_skip, total_interactions)
    inter_layout = StackedLayout.new(0, l_skip + n_logup, inter_dims)
    max_msg_len = max(
        (len(it.message) for t in traces for it in t.dag.interactions), default=0
    )
    return pv, n_logup, inter_layout, max_msg_len


def prove_gkr_phase(
    transcript: Transcript,
    params: SystemParams,
    global_degree: int,
    traces: List[TraceProver],
):
    """Phase 1 of the RAP prover: LogUp grind, GKR input evaluation and the
    fractional sumcheck, plus the xi extension sampling.

    Returns ``(gkr_proof, xi, beta)``; ``xi`` and ``beta`` (with the
    transcript state) are the ONLY values phase 2 needs, so the two phases
    can run as separately-compiled device programs (reference precedent:
    the GKR pipeline is its own kernel family in
    ``cuda-backend/src/logup_zerocheck/fractional.rs``)."""
    v = vm()
    l_skip = params.l_skip
    num_traces = len(traces)
    pv, n_logup, inter_layout, max_msg_len = _phase_common(
        params, global_degree, traces
    )
    n_max = pv.n_max

    from .gkr import _scan_ok as _dev

    has_interactions = len(inter_layout.sorted_cols) > 0
    if _dev(transcript):
        # device path: grind + alpha/beta + the whole GKR input evaluation
        # (DAG interactions eval, tiling, alpha shift) as ONE region program
        from .regions import run_region

        if has_interactions:
            metrics.counter("gkr_interaction_cells", 1 << (l_skip + n_logup))

        def gkr_in_factory():
            def body(tr, parts_list):
                witness = tr.grind(params.logup.pow_bits)
                alpha = tr.sample_ext()
                beta = tr.sample_ext()
                if not has_interactions:
                    return witness, beta, None, None
                vv = vm()
                beta_pows = vv.ext.epowers(beta, max_msg_len + 1)
                beta_pows_dev = vv.const_vec(beta_pows)
                bus_terms_host = _bus_terms_fn(beta_pows)
                p_dev, q_dev = _gkr_input_pq(
                    traces,
                    parts_list,
                    inter_layout,
                    l_skip,
                    n_logup,
                    beta_pows_dev,
                    bus_terms_host,
                    alpha,
                )
                return witness, beta, p_dev, q_dev

            return body

        logup_pow_witness, beta, p_dev, q_dev = run_region(
            transcript,
            (
                "gkr_in",
                tuple(_trace_key(t) for t in traces),
                l_skip,
                n_logup,
                max_msg_len,
                params.logup.pow_bits,
            ),
            gkr_in_factory,
            [t.base_parts() for t in traces],
        )
        with metrics.span("fractional_sumcheck"):
            frac = fractional_sumcheck(
                transcript, p_dev, q_dev, assert_zero=True
            )
        n_global = max(n_max, n_logup)
        total_xi = l_skip + n_global
        xi_stack = (
            frac.xi
            if not isinstance(frac.xi, list)
            else jnp.zeros((0, 4), jnp.uint32)
        )
        have = int(xi_stack.shape[0])
        extra = total_xi - have
        if extra > 0:

            def xi_factory():
                def body(tr, xi_in):
                    outs = jnp.stack(
                        [tr.sample_ext() for _ in range(extra)]
                    )
                    return (
                        jnp.concatenate([xi_in, outs])
                        if int(xi_in.shape[0])
                        else outs
                    )

                return body

            xi_stack = run_region(
                transcript, ("gkr_xi_ext", extra, have), xi_factory, xi_stack
            )
        gkr_proof = GkrProof(
            logup_pow_witness=logup_pow_witness,
            q0_claim=frac.fractional_sum[1],
            claims_per_layer=frac.claims_per_layer,
            sumcheck_polys=frac.sumcheck_polys,
        )
        return gkr_proof, xi_stack, beta

    logup_pow_witness = transcript.grind(params.logup.pow_bits)
    alpha = transcript.sample_ext()
    beta = transcript.sample_ext()

    beta_pows = v.ext.epowers(beta, max_msg_len + 1)
    beta_pows_dev = v.const_vec(beta_pows)
    bus_terms_host = _bus_terms_fn(beta_pows)

    # ---- GKR input evaluation + fractional sumcheck -----------------------
    if has_interactions:
        metrics.counter("gkr_interaction_cells", 1 << (l_skip + n_logup))
        p_dev, q_dev = _gkr_input_pq(
            traces,
            [t.base_parts() for t in traces],
            inter_layout,
            l_skip,
            n_logup,
            beta_pows_dev,
            bus_terms_host,
            alpha,
        )
        with metrics.span("fractional_sumcheck"):
            frac = fractional_sumcheck(transcript, p_dev, q_dev, assert_zero=True)
    else:
        frac = fractional_sumcheck(transcript, None, None)

    n_global = max(n_max, n_logup)
    total_xi = l_skip + n_global
    xi = list(frac.xi)
    while len(xi) != total_xi:
        xi.append(transcript.sample_ext())

    gkr_proof = GkrProof(
        logup_pow_witness=logup_pow_witness,
        q0_claim=frac.fractional_sum[1],
        claims_per_layer=frac.claims_per_layer,
        sumcheck_polys=frac.sumcheck_polys,
    )
    return gkr_proof, xi, beta


def _gkr_input_pq(
    traces,
    parts_list,
    inter_layout,
    l_skip: int,
    n_logup: int,
    beta_pows_dev,
    bus_terms_host,
    alpha,
):
    """GKR input vector (p, q) from the per-trace interaction counts and
    denominators, laid out per the interactions stacked layout. Shared by
    the host path and the ``gkr_in`` region program.

    The interactions layout (threshold 0, height-desc dims) places the
    lifted interaction slices CONTIGUOUSLY in one stacked column, so the
    GKR input vector is just the in-order concatenation of each slice tiled
    to its lifted length (norm 1/reps), zero-padded at the tail — no
    index-map gather, no O(2^n_logup) trace-time literal."""
    v = vm()
    counts_flat = []  # base (h,) arrays
    denoms_flat = []  # EF (h, 4) arrays
    flat_offsets = {}
    offset = 0
    for t_idx, t in enumerate(traces):
        if not t.dag.interactions:
            continue
        h = t.height
        sels = selectors_matrix(h, 0)  # (3, h), device iota — no literal
        parts = parts_list[t_idx]
        pairs = [(m, rot1(m) if t.needs_next else None) for m in parts]
        prep_pair = pairs[0] if t.has_preprocessed() else None
        main_pairs = pairs[1:] if t.has_preprocessed() else pairs
        ev = DeviceEvaluator(sels, prep_pair, main_pairs, t.public_values, False)
        pq = interactions_pq_device(t.dag, ev, beta_pows_dev, bus_terms_host(t))
        for s_idx, (count, h_beta) in enumerate(pq):
            counts_flat.append(count)
            denoms_flat.append(h_beta)
            flat_offsets[(t_idx, s_idx)] = (offset, h)
            offset += h
    H_logup = 1 << (l_skip + n_logup)
    flat_by_key = {
        key: (counts_flat[i], denoms_flat[i])
        for i, key in enumerate(flat_offsets)
    }
    p_blocks = []
    q_blocks = []
    pos = 0
    for t_idx, s_idx, sl in inter_layout.sorted_cols:
        assert sl.col_idx == 0 and sl.row_idx == pos, "non-contiguous"
        count, h_beta = flat_by_key[(t_idx, s_idx)]
        _, h = flat_offsets[(t_idx, s_idx)]
        length = 1 << sl.log_height  # layout threshold 0: no striding
        reps = length // h
        block = count.reshape(-1)
        qblk = h_beta.reshape(-1, 4)
        if reps > 1:
            block = jnp.tile(block, reps)
            qblk = jnp.tile(qblk, (reps, 1))
            block = jf.mul(block, jf.const(pow(reps, P - 2, P)))
        p_blocks.append(block)
        q_blocks.append(qblk)
        pos += length
    if pos < H_logup:
        p_blocks.append(jnp.zeros((H_logup - pos,), jnp.uint32))
        q_blocks.append(jnp.zeros((H_logup - pos, 4), jnp.uint32))
    p_dev = jnp.concatenate(p_blocks)
    p_dev = jnp.stack(
        [p_dev] + [jnp.zeros_like(p_dev)] * 3, axis=-1
    )  # embed base -> EF
    q_dev = jnp.concatenate(q_blocks)
    q_dev = jf.ext_add(q_dev, v.ef_dev(alpha))
    return p_dev, q_dev


def _bus_terms_fn(beta_pows):
    """Per-interaction beta^len * (bus+1) terms as a DEVICE (k, 4) array."""
    v = vm()

    def bus_terms_host(t: TraceProver):
        return v.const_vec(
            v.stack(
                [
                    v.ext.escale(beta_pows[len(it.message)], (it.bus_index + 1) % P)
                    for it in t.dag.interactions
                ]
            )
        )

    return bus_terms_host


def prove_batch_phase(
    transcript: Transcript,
    params: SystemParams,
    global_degree: int,
    traces: List[TraceProver],
    xi: List,
    beta,
    save_memory: bool = False,
) -> Tuple[BatchConstraintProof, List[np.ndarray]]:
    """Phase 2 of the RAP prover: the batched zerocheck+LogUp constraint
    sumcheck (univariate-skip round 0 + MLE rounds) and column openings.

    Consumes only the transcript plus ``xi`` and ``beta`` from the GKR
    phase (alpha never appears after GKR input evaluation — denominators
    here exclude the alpha shift by construction)."""
    from .gkr import _scan_ok as _dev

    if _dev(transcript):
        # device transcript (eager or segmented fused prover): the
        # region-jit implementation with an identical event schedule
        return _batch_phase_device(
            transcript, params, global_degree, traces, xi, beta, save_memory
        )
    v = vm()
    l_skip = params.l_skip
    num_traces = len(traces)
    pv, n_logup, inter_layout, max_msg_len = _phase_common(
        params, global_degree, traces
    )
    d_global = global_degree
    ZERO = v.ext.ezero()
    n_max = pv.n_max
    if not isinstance(xi, list):
        # device path hands over ONE stacked (n, 4) array (see
        # FracSumcheckResult.xi); the legacy body below still indexes
        # per-element — exploded here until the region conversion lands
        xi = [xi[i] for i in range(int(xi.shape[0]))]
    pv.xi = xi
    beta_pows = v.ext.epowers(beta, max_msg_len + 1)
    beta_pows_dev = v.const_vec(beta_pows)
    bus_terms_host = _bus_terms_fn(beta_pows)

    # ---- batching challenge, eq_3b weights --------------------------------
    lam = transcript.sample_ext()
    max_num_constraints = max(len(t.dag.constraint_idx) for t in traces)
    lambda_pows = v.ext.epowers(lam, max(max_num_constraints, 1))
    lambda_pows_dev = v.const_vec(lambda_pows)

    eq_3b_per_trace: List = []
    for t_idx, t in enumerate(traces):
        if not t.dag.interactions:
            eq_3b_per_trace.append(v.stack([]))
            continue
        n_lift = t.n_lift
        rows = []
        for i in range(len(t.dag.interactions)):
            sl = inter_layout.get(t_idx, i)
            b_int = sl.row_idx >> (l_skip + n_lift)
            bits = v.stack(
                [
                    v.ext.from_base((b_int >> j) & 1)
                    for j in range(n_logup - n_lift)
                ]
            )
            xi_seg = v.stack(xi[l_skip + n_lift : l_skip + n_logup])
            rows.append(v.poly.eval_eq_mle(xi_seg, bits))
        eq_3b_per_trace.append(v.stack(rows))

    # ---- selectors + per-trace part pairs (base, unfolded) ----------------
    for t in traces:
        t.sels = None  # set after round 0 fold

    # ---- univariate round 0 ------------------------------------------------
    sp0_logup: List[Tuple[np.ndarray, np.ndarray]] = []  # (numer, denom) coeffs
    sp0_zc: List[np.ndarray] = []
    g = GENERATOR

    for t_idx, t in enumerate(traces):
        n_lift = t.n_lift
        eq_tab = pv.eq_table(l_skip, l_skip + n_lift)  # (2^n_lift, 4)
        d_air = t.d_air
        sels_base = selectors_matrix(t.height, l_skip)

        def coset_grids(num_cosets: int, row_lo: int = 0, rows: int = 0):
            """Coset-evaluation grids; with rows > 0, only the chunk range
            covering matrix rows [row_lo, row_lo + rows) is materialized
            (the zerocheck_save_memory policy — the full grid is the peak
            HBM buffer of the prove)."""
            shifts = [pow(g, c + 1, P) for c in range(num_cosets)]

            def seg(m, is_rot):
                if rows:
                    if is_rot:
                        # rot1 wraps at the FULL height; take rows
                        # [row_lo+1, row_lo+1+rows) of the cyclically
                        # extended matrix
                        ext_m = jnp.concatenate([m, m[:, :1]], axis=1)
                        m = jax.lax.dynamic_slice_in_dim(
                            ext_m, row_lo + 1, rows, axis=1
                        )
                        is_rot = False
                    else:
                        m = jax.lax.dynamic_slice_in_dim(m, row_lo, rows, axis=1)
                return coset_eval_chunks(m, l_skip, shifts, is_rot)

            sels_grid = seg(sels_base, False)
            pairs = []
            for m in t.base_parts():
                local = seg(m, False)
                nxt = seg(m, True) if t.needs_next else None
                pairs.append((local, nxt))
            prep_pair = pairs[0] if t.has_preprocessed() else None
            main_pairs = pairs[1:] if t.has_preprocessed() else pairs
            return shifts, sels_grid, prep_pair, main_pairs

        n_chunks = 1 << n_lift
        use_chunked = save_memory and t.height >= (
            1 << (l_skip + _SAVE_MEMORY_MIN_CHUNKS_LOG)
        )
        seg_chunks = n_chunks // 8 if use_chunked else n_chunks

        def chunked_sums(num_cosets: int, eval_fn, n_out: int):
            """Accumulate eq-weighted chunk sums over chunk segments.

            eval_fn(grids...) -> tuple of n_out (chunks, B_z, 4) arrays.
            Returns n_out (B_z, 4) sums. One-shot when not in save-memory
            mode; otherwise a python loop (host) / lax.scan (trace) over 8
            segments bounds the live grid to 1/8 of the full one. Exact
            same modular values (sum order is irrelevant mod P)."""
            if not use_chunked:
                _, sels_g, prep_g, main_g = coset_grids(num_cosets)
                parts = eval_fn(sels_g, prep_g, main_g)
                return tuple(
                    v.ef(
                        jf.ext_sum(jf.ext_mul(p, eq_tab[:, None, :]), axis=0)
                    )
                    for p in parts
                )

            seg_rows = seg_chunks << l_skip

            def segment(ci):
                row_lo = ci * seg_rows
                _, sels_g, prep_g, main_g = coset_grids(
                    num_cosets, row_lo=row_lo, rows=seg_rows
                )
                parts = eval_fn(sels_g, prep_g, main_g)
                eq_seg = jax.lax.dynamic_slice_in_dim(
                    eq_tab, ci * seg_chunks, seg_chunks, axis=0
                )
                return tuple(
                    jf.ext_sum(jf.ext_mul(p, eq_seg[:, None, :]), axis=0)
                    for p in parts
                )

            if v.is_trace:
                def body(carry, ci):
                    outs = segment(ci)
                    return (
                        tuple(jf.ext_add(c, o) for c, o in zip(carry, outs)),
                        None,
                    )

                init = tuple(
                    jnp.zeros((num_cosets << l_skip, 4), jnp.uint32)
                    for _ in range(n_out)
                )
                acc, _ = jax.lax.scan(
                    body, init, jnp.arange(8, dtype=jnp.uint32)
                )
                return tuple(v.ef(a) for a in acc)
            totals = None
            for ci in range(8):
                outs = [np.asarray(jf.to_host(o)) for o in segment(ci)]
                if totals is None:
                    totals = outs
                else:
                    totals = [hext.eadd(a, b) for a, b in zip(totals, outs)]
            return tuple(totals)

        # selectors are row-global: the save-memory path slices them, which
        # is only valid when the trace is NOT lifted (height >= 2^l_skip) —
        # guaranteed by the use_chunked height bound
        # zerocheck: (d_air - 1) cosets, divide by zerofier, interpolate q
        num_zc_cosets = d_air - 1
        sp0_deg_air = sumcheck_round0_deg(l_skip, d_air)
        if num_zc_cosets == 0:
            sp0_zc.append(v.stack([ZERO] * (sp0_deg_air + 1)))
        else:
            shifts = [pow(g, c + 1, P) for c in range(num_zc_cosets)]
            (sums,) = chunked_sums(
                num_zc_cosets,
                lambda sels_g, prep_g, main_g: (
                    acc_constraints_device(
                        t.dag,
                        DeviceEvaluator(
                            sels_g, prep_g, main_g, t.public_values, False
                        ),
                        lambda_pows_dev,
                    ),
                ),
                1,
            )
            # divide by zerofier (z^{2^l} - 1): depends only on the coset
            zf = []
            for c, sh in enumerate(shifts):
                zf_val = (pow(sh, 1 << l_skip, P) - 1) % P
                zf.extend([zf_val] * (1 << l_skip))
            zf_inv = batch_inverse(np.array(zf, dtype=np.uint64))
            q_evals = v.ext.escale(sums, zf_inv)
            grid = jnp_transpose(v, q_evals, num_zc_cosets, l_skip)
            q_coeffs = v.poly.from_geometric_cosets_evals(grid, g, g)
            coeffs = []
            nq = q_coeffs.shape[0]
            for i in range(sp0_deg_air + 1):
                c = v.ext.eneg(q_coeffs[i]) if i < nq else ZERO
                if i >= (1 << l_skip) and i - (1 << l_skip) < nq:
                    c = v.ext.eadd(c, q_coeffs[i - (1 << l_skip)])
                coeffs.append(c)
            sp0_zc.append(v.stack(coeffs))

        # logup: d_air cosets, interpolate numer/denom directly
        if not t.dag.interactions:
            sp0_logup.append((v.stack([]), v.stack([])))
        else:
            bus_terms_dev = bus_terms_host(t)
            eq_3b_dev = v.const_vec(eq_3b_per_trace[t_idx])
            n_sum, d_sum = chunked_sums(
                d_air,
                lambda sels_g, prep_g, main_g: acc_interactions_device(
                    t.dag,
                    DeviceEvaluator(
                        sels_g, prep_g, main_g, t.public_values, False
                    ),
                    beta_pows_dev,
                    bus_terms_dev,
                    eq_3b_dev,
                ),
                2,
            )
            grid_n = jnp_transpose(v, n_sum, d_air, l_skip)
            grid_d = jnp_transpose(v, d_sum, d_air, l_skip)
            numer_coeffs = v.poly.from_geometric_cosets_evals(grid_n, g, g)
            denom_coeffs = v.poly.from_geometric_cosets_evals(grid_d, g, g)
            norm = pow(1 << max(0, -t.n), P - 2, P)
            numer_coeffs = v.ext.escale(numer_coeffs, norm)
            sp0_logup.append((numer_coeffs, denom_coeffs))

    # ---- assemble s_0, observe sum claims ----------------------------------
    s_deg = d_global + 1
    sp0_deg = sumcheck_round0_deg(l_skip, d_global)
    s0_deg = sumcheck_round0_deg(l_skip, s_deg)
    big = 1 << (s0_deg + 1 - 1).bit_length() if s0_deg > 0 else 1

    def pad(coeffs, size: int):
        k = min(coeffs.shape[0], sp0_deg + 1, size)
        return v.stack([coeffs[i] for i in range(k)] + [ZERO] * (size - k))

    eq_sharp_coeffs = v.poly.eq_sharp_uni_poly(v.stack(xi[:l_skip]))
    eq_sharp_evals = v.poly.dft_ef(pad(eq_sharp_coeffs, big))

    s0_logup_polys: List = []  # 2*num_traces coeff arrays (big, 4)
    for t_idx in range(num_traces):
        for which in range(2):
            sp = pad(sp0_logup[t_idx][which], big)
            evals = v.poly.dft_ef(sp)
            prod = v.ext.emul(evals, eq_sharp_evals)
            s0_logup_polys.append(v.poly.idft_ef(prod))

    numerator_term_per_air = []
    denominator_term_per_air = []
    for t_idx in range(num_traces):
        for which in range(2):
            coeffs = s0_logup_polys[2 * t_idx + which]
            acc = ZERO
            for j in range(0, s0_deg + 1, 1 << l_skip):
                acc = v.ext.eadd(acc, coeffs[j])
            claim = v.ext.escale(acc, 1 << l_skip)
            if which == 0:
                numerator_term_per_air.append(claim)
            else:
                denominator_term_per_air.append(claim)
            transcript.observe_ext(claim)

    mu = transcript.sample_ext()
    mu_pows = v.ext.epowers(mu, 3 * num_traces)

    eq_uni_coeffs = v.poly.eq_uni_poly(l_skip, xi[0])
    eq_uni_evals = v.poly.dft_ef(pad(eq_uni_coeffs, big))
    zc_batch = None
    for t_idx in range(num_traces):
        sp = pad(sp0_zc[t_idx], big)
        term = v.ext.emul(sp, mu_pows[2 * num_traces + t_idx])
        zc_batch = term if zc_batch is None else v.ext.eadd(zc_batch, term)
    zc_evals = v.ext.emul(v.poly.dft_ef(zc_batch), eq_uni_evals)
    s0_zc_poly = v.poly.idft_ef(zc_evals)

    from .gkr import _scan_ok

    s0_coeffs = []
    for j in range(s0_deg + 1):
        c = s0_zc_poly[j]
        for t_idx in range(num_traces):
            c = v.ext.eadd(
                c, v.ext.emul(mu_pows[2 * t_idx], s0_logup_polys[2 * t_idx][j])
            )
            c = v.ext.eadd(
                c,
                v.ext.emul(mu_pows[2 * t_idx + 1], s0_logup_polys[2 * t_idx + 1][j]),
            )
        s0_coeffs.append(c)
        if not _scan_ok(transcript):
            transcript.observe_ext(c)
    s0_coeffs = v.stack(s0_coeffs)
    if _scan_ok(transcript):
        # one flat absorb == the per-coefficient observe_ext sequence
        transcript.observe_slice(jnp.ravel(jnp.asarray(s0_coeffs)))

    r: List = []
    r0 = transcript.sample_ext()
    r.append(r0)
    prev_s_eval = v.poly.horner_eval(s0_coeffs, r0)

    # ---- fold PLEs at r_0 ---------------------------------------------------
    weights = barycentric_weights_dev(l_skip, r0)
    for t in traces:
        pairs = []
        for m in t.base_parts():
            local = fold_ple(m, l_skip, False, weights)
            nxt = fold_ple(m, l_skip, True, weights) if t.needs_next else None
            pairs.append((local, nxt))
        t.prep_pair = pairs[0] if t.has_preprocessed() else None
        t.main_pairs = pairs[1:] if t.has_preprocessed() else pairs
        t.sels = fold_ple(selectors_matrix(t.height, l_skip), l_skip, False, weights)

    pv.eq_ns.append(v.poly.eval_eq_uni(l_skip, xi[0], r0))
    pv.eq_sharp_ns.append(
        v.poly.eval_eq_sharp_uni(l_skip, v.stack(xi[:l_skip]), r0)
    )

    # ---- multilinear rounds -------------------------------------------------
    sumcheck_round_polys: List[List[np.ndarray]] = []
    n_per_trace = [t.n for t in traces]

    def _round_unrolled(rnd: int):
        nonlocal prev_s_eval
        r_prev = r[rnd - 1]
        eq_r_acc = pv.eq_ns[rnd - 1]
        eq_sharp_r_acc = pv.eq_sharp_ns[rnd - 1]
        sp_zc_evals: List[List[np.ndarray]] = []
        sp_logup_evals: List[List[np.ndarray]] = []

        for t_idx, t in enumerate(traces):
            n_lift = t.n_lift
            has_int = bool(t.dag.interactions)
            if rnd > n_lift:
                if rnd == n_lift + 1:
                    # pull folded single-point values to host, evaluate tail
                    sels_h = v.ef(t.sels[:, 0])
                    parts_cols = []
                    all_pairs = ([t.prep_pair] if t.prep_pair else []) + t.main_pairs
                    for local, nxt in all_pairs:
                        lh = v.ef(local[:, 0])
                        nh = v.ef(nxt[:, 0]) if nxt is not None else None
                        parts_cols.append(
                            [
                                (lh[c], nh[c] if nh is not None else None)
                                for c in range(lh.shape[0])
                            ]
                        )
                    prep_cols = parts_cols[0] if t.has_preprocessed() else None
                    main_cols = (
                        parts_cols[1:] if t.has_preprocessed() else parts_cols
                    )
                    hev = HostEvaluator(
                        (sels_h[0], sels_h[1], sels_h[2]),
                        prep_cols,
                        main_cols,
                        t.public_values,
                    )
                    t.zerocheck_tilde = v.ext.emul(
                        eq_r_acc,
                        acc_constraints_host(t.dag, hev, lambda_pows),
                    )
                    if has_int:
                        numer, denom = acc_interactions_host(
                            t.dag, hev, beta_pows, eq_3b_per_trace[t_idx]
                        )
                        norm = pow(1 << max(0, -t.n), P - 2, P)
                        t.logup_tilde = [
                            v.ext.escale(v.ext.emul(eq_sharp_r_acc, numer), norm),
                            v.ext.emul(eq_sharp_r_acc, denom),
                        ]
                else:
                    t.zerocheck_tilde = v.ext.emul(t.zerocheck_tilde, r_prev)
                    if has_int:
                        t.logup_tilde = [
                            v.ext.emul(x, r_prev) for x in t.logup_tilde
                        ]
                sp_zc_evals.append([t.zerocheck_tilde])
                if has_int:
                    sp_logup_evals.append([t.logup_tilde[0]])
                    sp_logup_evals.append([t.logup_tilde[1]])
                else:
                    sp_logup_evals.append([ZERO] * d_global)
                    sp_logup_evals.append([ZERO] * d_global)
            else:
                eq_tab = pv.eq_table(l_skip + rnd, l_skip + n_lift)
                zc_at: List = []
                nm_at: List = []
                dn_at: List = []
                for x in range(1, d_global + 1):
                    sels_x = interp_mle_at_int(t.sels, x)
                    all_pairs = ([t.prep_pair] if t.prep_pair else []) + t.main_pairs
                    pairs_x = [
                        (
                            interp_mle_at_int(local, x),
                            interp_mle_at_int(nxt, x) if nxt is not None else None,
                        )
                        for local, nxt in all_pairs
                    ]
                    prep_x = pairs_x[0] if t.has_preprocessed() else None
                    main_x = pairs_x[1:] if t.has_preprocessed() else pairs_x
                    ev = DeviceEvaluator(sels_x, prep_x, main_x, t.public_values, True)
                    acc = acc_constraints_device(t.dag, ev, lambda_pows_dev)
                    zc_val = jf.ext_sum(jf.ext_mul(acc, eq_tab), axis=0)
                    zc_at.append(v.ef(zc_val))
                    if has_int:
                        numer, denom = acc_interactions_device(
                            t.dag,
                            ev,
                            beta_pows_dev,
                            bus_terms_host(t),
                            v.const_vec(eq_3b_per_trace[t_idx]),
                        )
                        nm_at.append(
                            v.ef(jf.ext_sum(jf.ext_mul(numer, eq_tab), axis=0))
                        )
                        dn_at.append(
                            v.ef(jf.ext_sum(jf.ext_mul(denom, eq_tab), axis=0))
                        )
                sp_zc_evals.append(zc_at)
                if has_int:
                    norm = pow(1 << max(0, -t.n), P - 2, P)
                    sp_logup_evals.append(
                        [v.ext.escale(x, norm) for x in nm_at]
                    )
                    sp_logup_evals.append(dn_at)
                else:
                    sp_logup_evals.append([ZERO] * d_global)
                    sp_logup_evals.append([ZERO] * d_global)

        # front-loaded batching: head traces still active, tail exhausted
        tail_start = num_traces
        for i, n_t in enumerate(n_per_trace):
            if rnd > n_t:
                tail_start = i
                break
        sp_head_zc = [ZERO] * d_global
        sp_head_logup = [ZERO] * d_global
        sp_tail = ZERO
        for t_idx in range(num_traces):
            zc_i = 2 * num_traces + t_idx
            nm_i = 2 * t_idx
            dn_i = nm_i + 1
            if t_idx < tail_start:
                for i in range(d_global):
                    sp_head_zc[i] = v.ext.eadd(
                        sp_head_zc[i],
                        v.ext.emul(mu_pows[zc_i], sp_zc_evals[t_idx][i]),
                    )
                    sp_head_logup[i] = v.ext.eadd(
                        sp_head_logup[i],
                        v.ext.eadd(
                            v.ext.emul(mu_pows[nm_i], sp_logup_evals[nm_i][i]),
                            v.ext.emul(mu_pows[dn_i], sp_logup_evals[dn_i][i]),
                        ),
                    )
            else:
                sp_tail = v.ext.eadd(
                    sp_tail,
                    v.ext.eadd(
                        v.ext.emul(mu_pows[zc_i], sp_zc_evals[t_idx][0]),
                        v.ext.eadd(
                            v.ext.emul(mu_pows[nm_i], sp_logup_evals[nm_i][0]),
                            v.ext.emul(mu_pows[dn_i], sp_logup_evals[dn_i][0]),
                        ),
                    ),
                )

        sp_head_evals = [ZERO] * s_deg
        for i in range(d_global):
            sp_head_evals[i + 1] = v.ext.eadd(
                v.ext.emul(pv.eq_ns[rnd - 1], sp_head_zc[i]),
                v.ext.emul(pv.eq_sharp_ns[rnd - 1], sp_head_logup[i]),
            )
        xi_cur = xi[l_skip + rnd - 1]
        eq_xi_0 = v.ext.esub(v.ext.eone(), xi_cur)
        eq_xi_1 = xi_cur
        sp_head_evals[0] = v.ext.emul(
            v.ext.esub(
                v.ext.esub(prev_s_eval, v.ext.emul(eq_xi_1, sp_head_evals[1])),
                sp_tail,
            ),
            v.ext.einv(eq_xi_0),
        )
        sp_head_coeffs = v.poly.lagrange_coeffs(
            list(range(s_deg)), v.stack(sp_head_evals)
        )
        # batch_s(X) = eq(xi, X) * sp_head(X) + sp_tail * X
        coeffs = [sp_head_coeffs[i] for i in range(s_deg)] + [ZERO]
        b_c = v.ext.esub(v.ext.eone(), xi_cur)
        a_c = v.ext.esub(xi_cur, b_c)
        for i in range(s_deg - 1, -1, -1):
            coeffs[i + 1] = v.ext.eadd(
                v.ext.emul(a_c, coeffs[i]), v.ext.emul(b_c, coeffs[i + 1])
            )
        coeffs[0] = v.ext.emul(coeffs[0], b_c)
        coeffs[1] = v.ext.eadd(coeffs[1], sp_tail)
        coeffs = v.stack(coeffs)
        batch_evals = [
            v.poly.horner_eval(coeffs, v.ext.from_base(i))
            for i in range(1, s_deg + 1)
        ]
        if _scan_ok(transcript):
            transcript.observe_slice(jnp.ravel(v.stack(batch_evals)))
        else:
            for e in batch_evals:
                transcript.observe_ext(e)
        sumcheck_round_polys.append(batch_evals)

        r_rnd = transcript.sample_ext()
        r.append(r_rnd)
        prev_s_eval = v.poly.horner_eval(coeffs, r_rnd)

        # fold device matrices and update eq accumulators
        r_dev = v.ef_dev(r_rnd)
        for t in traces:
            if t.sels.shape[1] > 1:
                t.sels = fold_mle(t.sels, r_dev)
                fold_pair = lambda p: (
                    fold_mle(p[0], r_dev),
                    fold_mle(p[1], r_dev) if p[1] is not None else None,
                )
                if t.prep_pair is not None:
                    t.prep_pair = fold_pair(t.prep_pair)
                t.main_pairs = [fold_pair(p) for p in t.main_pairs]
        eq_mle = v.poly.eval_eq_mle(
            xi_cur.reshape(1, 4), r_rnd.reshape(1, 4)
        )
        pv.eq_ns.append(v.ext.emul(pv.eq_ns[rnd - 1], eq_mle))
        pv.eq_sharp_ns.append(v.ext.emul(pv.eq_sharp_ns[rnd - 1], eq_mle))

    # Scan tier: rounds where EVERY trace is still active (rnd <= min n)
    # and the largest trace buffer fits the fixed scan width run as ONE
    # ``lax.scan`` body per block — the unrolled per-round bodies (d_global
    # DAG evaluations + folds each) made the fused program's trace+compile
    # cost quadratic in height. Bit-identical to the unrolled path
    # (CI: test_fused head/tail seam tests).
    from .gkr import _MLE_TAIL_LOG, _scan_ok

    scan_hi = min(n_per_trace) if _scan_ok(transcript) else 0
    scan_lo = max(1, n_max - _MLE_TAIL_LOG + 1)

    rnd = 1
    while rnd <= n_max:
        if scan_lo <= rnd <= scan_hi:
            L = scan_hi - rnd + 1
            prev_s_eval = _mle_rounds_scan(
                transcript, pv, traces, xi, l_skip, mu_pows,
                lambda_pows_dev, beta_pows_dev, bus_terms_host,
                eq_3b_per_trace, d_global, s_deg, rnd, L,
                prev_s_eval, r, sumcheck_round_polys,
            )
            rnd += L
        else:
            _round_unrolled(rnd)
            rnd += 1

    # ---- column openings ----------------------------------------------------
    column_openings: List[List[List[np.ndarray]]] = []
    if _scan_ok(transcript):
        # Device path: the absorb sequence is per column (claim, rot-claim
        # or zeros) — exactly one flat interleaved vector per part, so ONE
        # ``observe_slice`` absorbs everything through the rate-block
        # lax.scan instead of ~2 dispatches per column. Bit-identical felt
        # order; proof assembly slices a single fetched copy.
        parts_dev = []
        for t in traces:
            all_pairs = ([t.prep_pair] if t.prep_pair else []) + t.main_pairs
            parts_dev.append(
                [
                    (
                        local[:, 0],
                        nxt[:, 0] if t.needs_next else None,
                    )
                    for local, nxt in all_pairs
                ]
            )

        def interleave(lh, nh):
            if nh is None:
                nh = jnp.zeros_like(lh)
            return jnp.stack([lh, nh], axis=1).reshape(-1)

        flats = [interleave(*parts_dev[t_idx][-1]) for t_idx in range(num_traces)]
        for t_idx in range(num_traces):
            flats.extend(interleave(*p) for p in parts_dev[t_idx][:-1])
        if flats:
            transcript.observe_slice(jnp.concatenate(flats))

        concrete = not any(
            isinstance(x, jax.core.Tracer)
            for p in parts_dev
            for lh, _ in p
            for x in [lh]
        )
        parts_h = jax.device_get(parts_dev) if concrete else parts_dev
        for t_idx, t in enumerate(traces):
            part_openings = []
            for lh, nh in parts_h[t_idx]:
                if t.needs_next:
                    flat = []
                    for c in range(lh.shape[0]):
                        flat.extend([lh[c], nh[c]])
                else:
                    flat = [lh[c] for c in range(lh.shape[0])]
                part_openings.append(flat)
            # reorder: common main first, then preprocessed, then cached
            common = part_openings[-1]
            rest = part_openings[:-1]
            column_openings.append([common] + rest)
    else:
        for t in traces:
            all_pairs = ([t.prep_pair] if t.prep_pair else []) + t.main_pairs
            part_openings = []
            for local, nxt in all_pairs:
                lh = v.ef(local[:, 0])  # (w, 4)
                if t.needs_next:
                    nh = v.ef(nxt[:, 0])
                    flat = []
                    for c in range(lh.shape[0]):
                        flat.extend([lh[c], nh[c]])
                else:
                    flat = [lh[c] for c in range(lh.shape[0])]
                part_openings.append(flat)
            # reorder: common main first, then preprocessed, then cached
            common = part_openings[-1]
            rest = part_openings[:-1]
            column_openings.append([common] + rest)

        # observe: all common-main openings first, then other parts per trace
        for t_idx, t in enumerate(traces):
            from ..proof import column_openings_by_rot

            for claim, claim_rot in column_openings_by_rot(
                column_openings[t_idx][0], t.needs_next
            ):
                transcript.observe_ext(claim)
                transcript.observe_ext(claim_rot)
        for t_idx, t in enumerate(traces):
            from ..proof import column_openings_by_rot

            for part in column_openings[t_idx][1:]:
                for claim, claim_rot in column_openings_by_rot(
                    part, t.needs_next
                ):
                    transcript.observe_ext(claim)
                    transcript.observe_ext(claim_rot)

    batch_proof = BatchConstraintProof(
        numerator_term_per_air=numerator_term_per_air,
        denominator_term_per_air=denominator_term_per_air,
        univariate_round_coeffs=[s0_coeffs[j] for j in range(s0_deg + 1)],
        sumcheck_round_polys=sumcheck_round_polys,
        column_openings=column_openings,
    )
    return batch_proof, r


def _dag_fp(dag) -> str:
    """Stable structural fingerprint of a constraints DAG (region-program
    cache key component; id() would be reuse-unsafe across GC)."""
    fp = dag.__dict__.get("_swirl_fp")
    if fp is None:
        import hashlib

        fp = hashlib.sha1(repr(dag.canonical_tuple()).encode()).hexdigest()
        dag.__dict__["_swirl_fp"] = fp
    return fp


def _trace_key(t: TraceProver) -> tuple:
    return (
        _dag_fp(t.dag),
        t.height,
        t.n,
        t.d_air,
        t.needs_next,
        t.has_preprocessed(),
        tuple(int(m.shape[0]) for m in t.base_parts()),
        tuple(int(p) % P for p in t.public_values),
    )


def _batch_phase_device(
    transcript,
    params: SystemParams,
    global_degree: int,
    traces: List[TraceProver],
    xi,
    beta,
    save_memory: bool = False,
):
    """Device-transcript batch phase: the same protocol flow as the host
    body of :func:`prove_batch_phase`, restructured into a handful of
    region-jit programs (see :mod:`swirl.prover.regions`):

    - ``b0``: lambda sample, round-0 coset grids + DAG evals for every
      trace, sum-claim absorbs, mu squeeze, s_0 assembly + absorb, r_0
      squeeze, PLE folds at r_0;
    - ``b_rnd``: one program per unrolled multilinear round (head rounds at
      full rate plus ragged/tilde tails);
    - ``b_scan``: the mid rounds as ONE ``lax.scan`` program;
    - ``b_open``: the flat column-opening absorb.

    The eager fused prover pays one relay dispatch per region; the
    segmented prover inlines the identical bodies, so the duplex schedule
    has a single definition. Byte-identity with the host path is CI-pinned
    (tests/test_fused.py).

    ``xi`` is the stacked (l_skip + n_global, 4) device challenge array;
    the returned opening point ``r`` is likewise ONE stacked
    (n_max + 1, 4) device array (the host path returns lists).
    """
    from .regions import run_region

    v = vm()
    l_skip = params.l_skip
    num_traces = len(traces)
    pv, n_logup, inter_layout, max_msg_len = _phase_common(
        params, global_degree, traces
    )
    d_global = global_degree
    n_max = pv.n_max
    g = GENERATOR
    s_deg = d_global + 1
    sp0_deg = sumcheck_round0_deg(l_skip, d_global)
    s0_deg = sumcheck_round0_deg(l_skip, s_deg)
    big = 1 << (s0_deg + 1 - 1).bit_length() if s0_deg > 0 else 1
    max_num_constraints = max(len(t.dag.constraint_idx) for t in traces)
    n_per_trace = [t.n for t in traces]

    xi_s = (
        jnp.asarray(xi)
        if not isinstance(xi, list)
        else jnp.stack([jnp.asarray(x) for x in xi])
    )
    tkeys = tuple(_trace_key(t) for t in traces)
    base_key = (
        "batch",
        tkeys,
        l_skip,
        d_global,
        n_logup,
        max_msg_len,
        bool(save_memory),
        int(xi_s.shape[0]),
    )

    # ---- region b0: round 0 + s_0 + fold at r_0 ---------------------------
    def b0_factory():
        def body(tr, xi_a, beta_v, parts_list):
            v = vm()
            ZERO = v.ext.ezero()
            beta_pows = v.ext.epowers(beta_v, max_msg_len + 1)
            beta_pows_dev = v.const_vec(beta_pows)
            bus_terms_host = _bus_terms_fn(beta_pows)

            lam = tr.sample_ext()
            lambda_pows = v.ext.epowers(lam, max(max_num_constraints, 1))
            lambda_pows_dev = v.const_vec(lambda_pows)

            eq_3b_per_trace: List = []
            for t_idx, t in enumerate(traces):
                if not t.dag.interactions:
                    eq_3b_per_trace.append(None)
                    continue
                n_lift = t.n_lift
                rows = []
                for i in range(len(t.dag.interactions)):
                    sl = inter_layout.get(t_idx, i)
                    b_int = sl.row_idx >> (l_skip + n_lift)
                    bits = v.stack(
                        [
                            v.ext.from_base((b_int >> j) & 1)
                            for j in range(n_logup - n_lift)
                        ]
                    )
                    xi_seg = xi_a[l_skip + n_lift : l_skip + n_logup]
                    rows.append(v.poly.eval_eq_mle(xi_seg, bits))
                eq_3b_per_trace.append(v.stack(rows))

            # ---- univariate round 0 -----------------------------------
            sp0_logup: List = []
            sp0_zc: List = []
            for t_idx, t in enumerate(traces):
                n_lift = t.n_lift
                eq_tab = eq_hypercube_dev(xi_a[l_skip : l_skip + n_lift])
                d_air = t.d_air
                sels_base = selectors_matrix(t.height, l_skip)
                parts = parts_list[t_idx]

                def coset_grids(num_cosets: int, row_lo: int = 0, rows: int = 0):
                    shifts = [pow(g, c + 1, P) for c in range(num_cosets)]

                    def seg(m, is_rot):
                        if rows:
                            if is_rot:
                                ext_m = jnp.concatenate([m, m[:, :1]], axis=1)
                                m = jax.lax.dynamic_slice_in_dim(
                                    ext_m, row_lo + 1, rows, axis=1
                                )
                                is_rot = False
                            else:
                                m = jax.lax.dynamic_slice_in_dim(
                                    m, row_lo, rows, axis=1
                                )
                        return coset_eval_chunks(m, l_skip, shifts, is_rot)

                    sels_grid = seg(sels_base, False)
                    pairs = []
                    for m in parts:
                        local = seg(m, False)
                        nxt = seg(m, True) if t.needs_next else None
                        pairs.append((local, nxt))
                    prep_pair = pairs[0] if t.has_preprocessed() else None
                    main_pairs = pairs[1:] if t.has_preprocessed() else pairs
                    return shifts, sels_grid, prep_pair, main_pairs

                n_chunks = 1 << n_lift
                use_chunked = save_memory and t.height >= (
                    1 << (l_skip + _SAVE_MEMORY_MIN_CHUNKS_LOG)
                )
                seg_chunks = n_chunks // 8 if use_chunked else n_chunks

                def chunked_sums(num_cosets: int, eval_fn, n_out: int):
                    if not use_chunked:
                        _, sels_g, prep_g, main_g = coset_grids(num_cosets)
                        parts_out = eval_fn(sels_g, prep_g, main_g)
                        return tuple(
                            v.ef(
                                jf.ext_sum(
                                    jf.ext_mul(p, eq_tab[:, None, :]), axis=0
                                )
                            )
                            for p in parts_out
                        )

                    seg_rows = seg_chunks << l_skip

                    def segment(ci):
                        row_lo = ci * seg_rows
                        _, sels_g, prep_g, main_g = coset_grids(
                            num_cosets, row_lo=row_lo, rows=seg_rows
                        )
                        parts_out = eval_fn(sels_g, prep_g, main_g)
                        eq_seg = jax.lax.dynamic_slice_in_dim(
                            eq_tab, ci * seg_chunks, seg_chunks, axis=0
                        )
                        return tuple(
                            jf.ext_sum(
                                jf.ext_mul(p, eq_seg[:, None, :]), axis=0
                            )
                            for p in parts_out
                        )

                    def sbody(carry, ci):
                        outs = segment(ci)
                        return (
                            tuple(
                                jf.ext_add(c, o) for c, o in zip(carry, outs)
                            ),
                            None,
                        )

                    init = tuple(
                        jnp.zeros((num_cosets << l_skip, 4), jnp.uint32)
                        for _ in range(n_out)
                    )
                    acc, _ = jax.lax.scan(
                        sbody, init, jnp.arange(8, dtype=jnp.uint32)
                    )
                    return tuple(v.ef(a) for a in acc)

                num_zc_cosets = t.d_air - 1
                sp0_deg_air = sumcheck_round0_deg(l_skip, t.d_air)
                if num_zc_cosets == 0:
                    sp0_zc.append(v.stack([ZERO] * (sp0_deg_air + 1)))
                else:
                    shifts = [pow(g, c + 1, P) for c in range(num_zc_cosets)]
                    (sums,) = chunked_sums(
                        num_zc_cosets,
                        lambda sels_g, prep_g, main_g: (
                            acc_constraints_device(
                                t.dag,
                                DeviceEvaluator(
                                    sels_g,
                                    prep_g,
                                    main_g,
                                    t.public_values,
                                    False,
                                ),
                                lambda_pows_dev,
                            ),
                        ),
                        1,
                    )
                    zf = []
                    for c, sh in enumerate(shifts):
                        zf_val = (pow(sh, 1 << l_skip, P) - 1) % P
                        zf.extend([zf_val] * (1 << l_skip))
                    zf_inv = batch_inverse(np.array(zf, dtype=np.uint64))
                    q_evals = v.ext.escale(sums, zf_inv)
                    grid = jnp_transpose(v, q_evals, num_zc_cosets, l_skip)
                    q_coeffs = v.poly.from_geometric_cosets_evals(grid, g, g)
                    coeffs = []
                    nq = q_coeffs.shape[0]
                    for i in range(sp0_deg_air + 1):
                        c = v.ext.eneg(q_coeffs[i]) if i < nq else ZERO
                        if i >= (1 << l_skip) and i - (1 << l_skip) < nq:
                            c = v.ext.eadd(c, q_coeffs[i - (1 << l_skip)])
                        coeffs.append(c)
                    sp0_zc.append(v.stack(coeffs))

                if not t.dag.interactions:
                    sp0_logup.append((v.stack([]), v.stack([])))
                else:
                    bus_terms_dev = bus_terms_host(t)
                    eq_3b_dev = v.const_vec(eq_3b_per_trace[t_idx])
                    n_sum, d_sum = chunked_sums(
                        t.d_air,
                        lambda sels_g, prep_g, main_g: acc_interactions_device(
                            t.dag,
                            DeviceEvaluator(
                                sels_g, prep_g, main_g, t.public_values, False
                            ),
                            beta_pows_dev,
                            bus_terms_dev,
                            eq_3b_dev,
                        ),
                        2,
                    )
                    grid_n = jnp_transpose(v, n_sum, t.d_air, l_skip)
                    grid_d = jnp_transpose(v, d_sum, t.d_air, l_skip)
                    numer_coeffs = v.poly.from_geometric_cosets_evals(
                        grid_n, g, g
                    )
                    denom_coeffs = v.poly.from_geometric_cosets_evals(
                        grid_d, g, g
                    )
                    norm = pow(1 << max(0, -t.n), P - 2, P)
                    numer_coeffs = v.ext.escale(numer_coeffs, norm)
                    sp0_logup.append((numer_coeffs, denom_coeffs))

            # ---- assemble s_0, observe sum claims ---------------------
            def pad(coeffs, size: int):
                k = min(coeffs.shape[0], sp0_deg + 1, size)
                return v.stack(
                    [coeffs[i] for i in range(k)] + [ZERO] * (size - k)
                )

            eq_sharp_coeffs = v.poly.eq_sharp_uni_poly(xi_a[:l_skip])
            eq_sharp_evals = v.poly.dft_ef(pad(eq_sharp_coeffs, big))

            s0_logup_polys: List = []
            for t_idx in range(num_traces):
                for which in range(2):
                    sp = pad(sp0_logup[t_idx][which], big)
                    evals = v.poly.dft_ef(sp)
                    prod = v.ext.emul(evals, eq_sharp_evals)
                    s0_logup_polys.append(v.poly.idft_ef(prod))

            claims_nd = []
            for t_idx in range(num_traces):
                pair = []
                for which in range(2):
                    coeffs = s0_logup_polys[2 * t_idx + which]
                    acc = ZERO
                    for j in range(0, s0_deg + 1, 1 << l_skip):
                        acc = v.ext.eadd(acc, coeffs[j])
                    claim = v.ext.escale(acc, 1 << l_skip)
                    pair.append(claim)
                    tr.observe_ext(claim)
                claims_nd.append(v.stack(pair))

            mu = tr.sample_ext()
            mu_pows = v.const_vec(v.ext.epowers(mu, 3 * num_traces))

            eq_uni_coeffs = v.poly.eq_uni_poly(l_skip, xi_a[0])
            eq_uni_evals = v.poly.dft_ef(pad(eq_uni_coeffs, big))
            zc_batch = None
            for t_idx in range(num_traces):
                sp = pad(sp0_zc[t_idx], big)
                term = v.ext.emul(sp, mu_pows[2 * num_traces + t_idx])
                zc_batch = (
                    term if zc_batch is None else v.ext.eadd(zc_batch, term)
                )
            zc_evals = v.ext.emul(v.poly.dft_ef(zc_batch), eq_uni_evals)
            s0_zc_poly = v.poly.idft_ef(zc_evals)

            s0_coeffs = []
            for j in range(s0_deg + 1):
                c = s0_zc_poly[j]
                for t_idx in range(num_traces):
                    c = v.ext.eadd(
                        c,
                        v.ext.emul(
                            mu_pows[2 * t_idx], s0_logup_polys[2 * t_idx][j]
                        ),
                    )
                    c = v.ext.eadd(
                        c,
                        v.ext.emul(
                            mu_pows[2 * t_idx + 1],
                            s0_logup_polys[2 * t_idx + 1][j],
                        ),
                    )
                s0_coeffs.append(c)
            s0_coeffs = v.stack(s0_coeffs)
            # one flat absorb == the per-coefficient observe_ext sequence
            tr.observe_slice(jnp.ravel(jnp.asarray(s0_coeffs)))

            r0 = tr.sample_ext()
            prev_s_eval = v.poly.horner_eval(s0_coeffs, r0)

            # ---- fold PLEs at r_0 -------------------------------------
            weights = barycentric_weights_dev(l_skip, r0)
            bufs = []
            for t_idx, t in enumerate(traces):
                pairs = []
                for m in parts_list[t_idx]:
                    local = fold_ple(m, l_skip, False, weights)
                    nxt = (
                        fold_ple(m, l_skip, True, weights)
                        if t.needs_next
                        else None
                    )
                    pairs.append((local, nxt))
                prep_pair = pairs[0] if t.has_preprocessed() else None
                main_pairs = pairs[1:] if t.has_preprocessed() else pairs
                sels = fold_ple(
                    selectors_matrix(t.height, l_skip), l_skip, False, weights
                )
                bufs.append((sels, prep_pair, tuple(main_pairs)))

            eq_n0 = v.poly.eval_eq_uni(l_skip, xi_a[0], r0)
            eq_sharp_n0 = v.poly.eval_eq_sharp_uni(l_skip, xi_a[:l_skip], r0)
            return (
                jnp.stack(claims_nd),  # (T, 2, 4)
                jnp.asarray(s0_coeffs),  # (s0_deg+1, 4)
                mu_pows,  # (3T, 4)
                lambda_pows_dev,  # (Lc, 4)
                beta_pows_dev,  # (Lb, 4)
                eq_3b_per_trace,  # per-trace (k, 4) | None
                tuple(bufs),
                r0,
                eq_n0,
                eq_sharp_n0,
                prev_s_eval,
            )

        return body

    (
        claims_nd,
        s0_coeffs,
        mu_pows,
        lambda_pows_dev,
        beta_pows_dev,
        eq3b,
        bufs,
        r0,
        eq_n,
        eq_sharp_n,
        prev_s_eval,
    ) = run_region(
        transcript,
        base_key + ("b0",),
        b0_factory,
        xi_s,
        jnp.asarray(beta),
        [t.base_parts() for t in traces],
    )

    # tilde carries (None until a trace is exhausted)
    tilde = [(None, None) for _ in traces]

    # ---- multilinear rounds ----------------------------------------------
    from .gkr import _MLE_TAIL_LOG

    scan_hi = min(n_per_trace)
    scan_lo = max(1, n_max - _MLE_TAIL_LOG + 1)

    round_blocks = []  # ("u", evals (s_deg,4), r) | ("s", evals (L,s_deg,4), r_all)

    def round_factory(rnd):
        def factory():
            def body(
                tr,
                xi_a,
                bufs,
                tilde_in,
                mu_pows,
                lambda_pows_dev,
                beta_pows_dev,
                eq3b,
                r_prev,
                eq_r_acc,
                eq_sharp_r_acc,
                prev_s,
            ):
                v = vm()
                ZERO = v.ext.ezero()
                bus_terms_host = _bus_terms_fn(beta_pows_dev)
                sp_zc_evals: List = []
                sp_logup_evals: List = []
                new_bufs = list(bufs)
                new_tilde = list(tilde_in)

                for t_idx, t in enumerate(traces):
                    n_lift = t.n_lift
                    has_int = bool(t.dag.interactions)
                    sels, prep_pair, main_pairs = bufs[t_idx]
                    zc_tilde, logup_tilde = tilde_in[t_idx]
                    if rnd > n_lift:
                        if rnd == n_lift + 1:
                            sels_h = v.ef(sels[:, 0])
                            parts_cols = []
                            all_pairs = (
                                [prep_pair] if prep_pair is not None else []
                            ) + list(main_pairs)
                            for local, nxt in all_pairs:
                                lh = v.ef(local[:, 0])
                                nh = v.ef(nxt[:, 0]) if nxt is not None else None
                                parts_cols.append(
                                    [
                                        (
                                            lh[c],
                                            nh[c] if nh is not None else None,
                                        )
                                        for c in range(lh.shape[0])
                                    ]
                                )
                            prep_cols = (
                                parts_cols[0] if t.has_preprocessed() else None
                            )
                            main_cols = (
                                parts_cols[1:]
                                if t.has_preprocessed()
                                else parts_cols
                            )
                            hev = HostEvaluator(
                                (sels_h[0], sels_h[1], sels_h[2]),
                                prep_cols,
                                main_cols,
                                t.public_values,
                            )
                            zc_tilde = v.ext.emul(
                                eq_r_acc,
                                acc_constraints_host(
                                    t.dag, hev, lambda_pows_dev
                                ),
                            )
                            if has_int:
                                numer, denom = acc_interactions_host(
                                    t.dag, hev, beta_pows_dev, eq3b[t_idx]
                                )
                                norm = pow(1 << max(0, -t.n), P - 2, P)
                                logup_tilde = [
                                    v.ext.escale(
                                        v.ext.emul(eq_sharp_r_acc, numer), norm
                                    ),
                                    v.ext.emul(eq_sharp_r_acc, denom),
                                ]
                        else:
                            zc_tilde = v.ext.emul(zc_tilde, r_prev)
                            if has_int:
                                logup_tilde = [
                                    v.ext.emul(x, r_prev) for x in logup_tilde
                                ]
                        new_tilde[t_idx] = (zc_tilde, logup_tilde)
                        sp_zc_evals.append([zc_tilde])
                        if has_int:
                            sp_logup_evals.append([logup_tilde[0]])
                            sp_logup_evals.append([logup_tilde[1]])
                        else:
                            sp_logup_evals.append([ZERO] * d_global)
                            sp_logup_evals.append([ZERO] * d_global)
                    else:
                        eq_tab = eq_hypercube_dev(
                            xi_a[l_skip + rnd : l_skip + n_lift]
                        )
                        zc_at: List = []
                        nm_at: List = []
                        dn_at: List = []
                        for x in range(1, d_global + 1):
                            sels_x = interp_mle_at_int(sels, x)
                            all_pairs = (
                                [prep_pair] if prep_pair is not None else []
                            ) + list(main_pairs)
                            pairs_x = [
                                (
                                    interp_mle_at_int(local, x),
                                    interp_mle_at_int(nxt, x)
                                    if nxt is not None
                                    else None,
                                )
                                for local, nxt in all_pairs
                            ]
                            prep_x = (
                                pairs_x[0] if t.has_preprocessed() else None
                            )
                            main_x = (
                                pairs_x[1:]
                                if t.has_preprocessed()
                                else pairs_x
                            )
                            ev = DeviceEvaluator(
                                sels_x, prep_x, main_x, t.public_values, True
                            )
                            acc = acc_constraints_device(
                                t.dag, ev, lambda_pows_dev
                            )
                            zc_val = jf.ext_sum(
                                jf.ext_mul(acc, eq_tab), axis=0
                            )
                            zc_at.append(v.ef(zc_val))
                            if has_int:
                                numer, denom = acc_interactions_device(
                                    t.dag,
                                    ev,
                                    beta_pows_dev,
                                    bus_terms_host(t),
                                    eq3b[t_idx],
                                )
                                nm_at.append(
                                    v.ef(
                                        jf.ext_sum(
                                            jf.ext_mul(numer, eq_tab), axis=0
                                        )
                                    )
                                )
                                dn_at.append(
                                    v.ef(
                                        jf.ext_sum(
                                            jf.ext_mul(denom, eq_tab), axis=0
                                        )
                                    )
                                )
                        sp_zc_evals.append(zc_at)
                        if has_int:
                            norm = pow(1 << max(0, -t.n), P - 2, P)
                            sp_logup_evals.append(
                                [v.ext.escale(x, norm) for x in nm_at]
                            )
                            sp_logup_evals.append(dn_at)
                        else:
                            sp_logup_evals.append([ZERO] * d_global)
                            sp_logup_evals.append([ZERO] * d_global)

                # front-loaded batching: head traces active, tail exhausted
                tail_start = num_traces
                for i, n_t in enumerate(n_per_trace):
                    if rnd > n_t:
                        tail_start = i
                        break
                sp_head_zc = [ZERO] * d_global
                sp_head_logup = [ZERO] * d_global
                sp_tail = ZERO
                for t_idx in range(num_traces):
                    zc_i = 2 * num_traces + t_idx
                    nm_i = 2 * t_idx
                    dn_i = nm_i + 1
                    if t_idx < tail_start:
                        for i in range(d_global):
                            sp_head_zc[i] = v.ext.eadd(
                                sp_head_zc[i],
                                v.ext.emul(
                                    mu_pows[zc_i], sp_zc_evals[t_idx][i]
                                ),
                            )
                            sp_head_logup[i] = v.ext.eadd(
                                sp_head_logup[i],
                                v.ext.eadd(
                                    v.ext.emul(
                                        mu_pows[nm_i],
                                        sp_logup_evals[nm_i][i],
                                    ),
                                    v.ext.emul(
                                        mu_pows[dn_i],
                                        sp_logup_evals[dn_i][i],
                                    ),
                                ),
                            )
                    else:
                        sp_tail = v.ext.eadd(
                            sp_tail,
                            v.ext.eadd(
                                v.ext.emul(
                                    mu_pows[zc_i], sp_zc_evals[t_idx][0]
                                ),
                                v.ext.eadd(
                                    v.ext.emul(
                                        mu_pows[nm_i],
                                        sp_logup_evals[nm_i][0],
                                    ),
                                    v.ext.emul(
                                        mu_pows[dn_i],
                                        sp_logup_evals[dn_i][0],
                                    ),
                                ),
                            ),
                        )

                sp_head_evals = [ZERO] * s_deg
                for i in range(d_global):
                    sp_head_evals[i + 1] = v.ext.eadd(
                        v.ext.emul(eq_r_acc, sp_head_zc[i]),
                        v.ext.emul(eq_sharp_r_acc, sp_head_logup[i]),
                    )
                xi_cur = xi_a[l_skip + rnd - 1]
                eq_xi_0 = v.ext.esub(v.ext.eone(), xi_cur)
                eq_xi_1 = xi_cur
                sp_head_evals[0] = v.ext.emul(
                    v.ext.esub(
                        v.ext.esub(
                            prev_s, v.ext.emul(eq_xi_1, sp_head_evals[1])
                        ),
                        sp_tail,
                    ),
                    v.ext.einv(eq_xi_0),
                )
                sp_head_coeffs = v.poly.lagrange_coeffs(
                    list(range(s_deg)), v.stack(sp_head_evals)
                )
                coeffs = [sp_head_coeffs[i] for i in range(s_deg)] + [ZERO]
                b_c = v.ext.esub(v.ext.eone(), xi_cur)
                a_c = v.ext.esub(xi_cur, b_c)
                for i in range(s_deg - 1, -1, -1):
                    coeffs[i + 1] = v.ext.eadd(
                        v.ext.emul(a_c, coeffs[i]),
                        v.ext.emul(b_c, coeffs[i + 1]),
                    )
                coeffs[0] = v.ext.emul(coeffs[0], b_c)
                coeffs[1] = v.ext.eadd(coeffs[1], sp_tail)
                coeffs = v.stack(coeffs)
                batch_evals = v.stack(
                    [
                        v.poly.horner_eval(coeffs, v.ext.from_base(i))
                        for i in range(1, s_deg + 1)
                    ]
                )
                tr.observe_slice(jnp.ravel(jnp.asarray(batch_evals)))

                r_rnd = tr.sample_ext()
                prev_s = v.poly.horner_eval(coeffs, r_rnd)

                # fold device matrices and update eq accumulators
                for t_idx, t in enumerate(traces):
                    sels, prep_pair, main_pairs = new_bufs[t_idx]
                    if sels.shape[1] > 1:
                        sels = fold_mle(sels, r_rnd)
                        fold_pair = lambda p: (
                            fold_mle(p[0], r_rnd),
                            fold_mle(p[1], r_rnd)
                            if p[1] is not None
                            else None,
                        )
                        if prep_pair is not None:
                            prep_pair = fold_pair(prep_pair)
                        main_pairs = tuple(
                            fold_pair(p) for p in main_pairs
                        )
                        new_bufs[t_idx] = (sels, prep_pair, main_pairs)
                eq_mle = v.poly.eval_eq_mle(
                    xi_cur.reshape(1, 4), r_rnd.reshape(1, 4)
                )
                eq_n_new = v.ext.emul(eq_r_acc, eq_mle)
                eq_sharp_new = v.ext.emul(eq_sharp_r_acc, eq_mle)
                return (
                    jnp.asarray(batch_evals),
                    r_rnd,
                    tuple(new_bufs),
                    tuple(new_tilde),
                    eq_n_new,
                    eq_sharp_new,
                    prev_s,
                )

            return body

        return factory

    def scan_factory(rnd0, L):
        def factory():
            def body(
                tr,
                xi_a,
                bufs,
                mu_pows,
                lambda_pows_dev,
                beta_pows_dev,
                eq3b,
                eq_n_in,
                eq_sharp_in,
                prev_s_in,
            ):
                from ..fields import text
                from .. import tpoly
                from .device_transcript import duplex_absorb_sample_ext

                v = vm()
                bus_terms_host = _bus_terms_fn(beta_pows_dev)

                xi_rounds = xi_a[
                    l_skip + rnd0 - 1 : l_skip + rnd0 - 1 + L
                ]  # (L, 4)
                one = jnp.asarray(text.eone())
                b_c_rounds = jnp.stack(
                    [text.esub(one, xi_rounds[j]) for j in range(L)]
                )
                inv_b_c_rounds = jnp.stack(
                    [text.einv(b_c_rounds[j]) for j in range(L)]
                )
                a_c_rounds = jnp.stack(
                    [text.esub(xi_rounds[j], b_c_rounds[j]) for j in range(L)]
                )

                eq_tabs = []
                for t_idx, t in enumerate(traces):
                    n_lift = t.n_lift
                    b_half = int(bufs[t_idx][0].shape[1]) // 2
                    tabs = []
                    for j in range(L):
                        tab = eq_hypercube_dev(
                            xi_a[l_skip + rnd0 + j : l_skip + n_lift]
                        )
                        pad = b_half - int(tab.shape[0])
                        if pad:
                            tab = jnp.concatenate(
                                [tab, jnp.zeros((pad, 4), jnp.uint32)],
                                axis=0,
                            )
                        tabs.append(tab)
                    eq_tabs.append(jnp.stack(tabs))

                bus_terms = [
                    bus_terms_host(t) if t.dag.interactions else None
                    for t in traces
                ]

                def sbody(carry, js):
                    state, c_bufs, eq_n, eq_sharp_n, prev_s = carry
                    j = js

                    sp_head_zc = [
                        jnp.asarray(text.ezero()) for _ in range(d_global)
                    ]
                    sp_head_logup = [
                        jnp.asarray(text.ezero()) for _ in range(d_global)
                    ]
                    new_bufs = []
                    for t_idx, t in enumerate(traces):
                        sels, prep_pair, main_pairs = c_bufs[t_idx]
                        has_int = bool(t.dag.interactions)
                        eq_tab = eq_tabs[t_idx][j]
                        zc_w = mu_pows[2 * num_traces + t_idx]
                        nm_w = mu_pows[2 * t_idx]
                        dn_w = mu_pows[2 * t_idx + 1]
                        for xi_i, x in enumerate(range(1, d_global + 1)):
                            sels_x = interp_mle_at_int(sels, x)
                            all_pairs = (
                                [prep_pair] if t.has_preprocessed() else []
                            ) + list(main_pairs)
                            pairs_x = [
                                (
                                    interp_mle_at_int(local, x),
                                    interp_mle_at_int(nxt, x)
                                    if nxt is not None
                                    else None,
                                )
                                for local, nxt in all_pairs
                            ]
                            prep_x = (
                                pairs_x[0] if t.has_preprocessed() else None
                            )
                            main_x = (
                                pairs_x[1:]
                                if t.has_preprocessed()
                                else pairs_x
                            )
                            ev = DeviceEvaluator(
                                sels_x, prep_x, main_x, t.public_values, True
                            )
                            acc = acc_constraints_device(
                                t.dag, ev, lambda_pows_dev
                            )
                            zc_val = jf.ext_sum(
                                jf.ext_mul(acc, eq_tab), axis=0
                            )
                            sp_head_zc[xi_i] = text.eadd(
                                sp_head_zc[xi_i], text.emul(zc_w, zc_val)
                            )
                            if has_int:
                                numer, denom = acc_interactions_device(
                                    t.dag,
                                    ev,
                                    beta_pows_dev,
                                    bus_terms[t_idx],
                                    eq3b[t_idx],
                                )
                                nm = jf.ext_sum(
                                    jf.ext_mul(numer, eq_tab), axis=0
                                )
                                dn = jf.ext_sum(
                                    jf.ext_mul(denom, eq_tab), axis=0
                                )
                                sp_head_logup[xi_i] = text.eadd(
                                    sp_head_logup[xi_i],
                                    text.eadd(
                                        text.emul(nm_w, nm),
                                        text.emul(dn_w, dn),
                                    ),
                                )

                    sp_head_evals = [jnp.asarray(text.ezero())] * s_deg
                    for i in range(d_global):
                        sp_head_evals[i + 1] = text.eadd(
                            text.emul(eq_n, sp_head_zc[i]),
                            text.emul(eq_sharp_n, sp_head_logup[i]),
                        )
                    xi_cur = xi_rounds[j]
                    sp_head_evals[0] = text.emul(
                        text.esub(
                            prev_s, text.emul(xi_cur, sp_head_evals[1])
                        ),
                        inv_b_c_rounds[j],
                    )
                    sp_head_coeffs = tpoly.lagrange_coeffs(
                        list(range(s_deg)), jnp.stack(sp_head_evals)
                    )
                    coeffs = [sp_head_coeffs[i] for i in range(s_deg)] + [
                        jnp.asarray(text.ezero())
                    ]
                    a_c, b_c = a_c_rounds[j], b_c_rounds[j]
                    for i in range(s_deg - 1, -1, -1):
                        coeffs[i + 1] = text.eadd(
                            text.emul(a_c, coeffs[i]),
                            text.emul(b_c, coeffs[i + 1]),
                        )
                    coeffs[0] = text.emul(coeffs[0], b_c)
                    coeffs_arr = jnp.stack(coeffs)
                    batch_evals = jnp.stack(
                        [
                            tpoly.horner_eval(
                                coeffs_arr, jnp.asarray(text.from_base(i))
                            )
                            for i in range(1, s_deg + 1)
                        ]
                    )

                    state, r_rnd = duplex_absorb_sample_ext(
                        state, batch_evals.reshape(-1)
                    )
                    prev_s = tpoly.horner_eval(coeffs_arr, r_rnd)

                    def fold_buf(mat):
                        folded = fold_mle(mat, r_rnd)
                        return jnp.concatenate(
                            [folded, jnp.zeros_like(folded)], axis=1
                        )

                    for t_idx, t in enumerate(traces):
                        sels, prep_pair, main_pairs = c_bufs[t_idx]
                        sels = fold_buf(sels)
                        if prep_pair is not None:
                            prep_pair = (
                                fold_buf(prep_pair[0]),
                                fold_buf(prep_pair[1])
                                if prep_pair[1] is not None
                                else None,
                            )
                        main_pairs = tuple(
                            (
                                fold_buf(local),
                                fold_buf(nxt) if nxt is not None else None,
                            )
                            for local, nxt in main_pairs
                        )
                        new_bufs.append((sels, prep_pair, main_pairs))

                    eq_mle = tpoly.eval_eq_mle(
                        xi_cur.reshape(1, 4), r_rnd.reshape(1, 4)
                    )
                    eq_n = text.emul(eq_n, eq_mle)
                    eq_sharp_n = text.emul(eq_sharp_n, eq_mle)
                    return (
                        (state, tuple(new_bufs), eq_n, eq_sharp_n, prev_s),
                        (batch_evals, r_rnd, eq_n, eq_sharp_n),
                    )

                assert tr.absorb_idx == 0
                init = (
                    tr.state,
                    tuple(bufs),
                    jnp.asarray(eq_n_in),
                    jnp.asarray(eq_sharp_in),
                    jnp.asarray(prev_s_in),
                )
                (state, out_bufs, eq_n_f, eq_sharp_f, prev_s), ys = (
                    jax.lax.scan(sbody, init, jnp.arange(L), length=L)
                )
                evals_all, r_all, eq_n_all, eq_sharp_all = ys
                from .device_transcript import EF_D, RATE

                tr.state = state
                tr.absorb_idx = 0
                tr.sample_idx = RATE - EF_D

                # crop the fixed-size buffers back to TRUE folded lengths
                scan_end = rnd0 + L - 1
                cropped = []
                for t_idx, t in enumerate(traces):
                    true_len = max(1 << max(t.n_lift - scan_end, 0), 1)
                    sels, prep_pair, main_pairs = out_bufs[t_idx]

                    def crop(m):
                        return m[:, :true_len]

                    cropped.append(
                        (
                            crop(sels),
                            None
                            if prep_pair is None
                            else (
                                crop(prep_pair[0]),
                                crop(prep_pair[1])
                                if prep_pair[1] is not None
                                else None,
                            ),
                            tuple(
                                (
                                    crop(local),
                                    crop(nxt) if nxt is not None else None,
                                )
                                for local, nxt in main_pairs
                            ),
                        )
                    )
                return (
                    evals_all,
                    r_all,
                    eq_n_f,
                    eq_sharp_f,
                    prev_s,
                    tuple(cropped),
                )

            return body

        return factory

    rnd = 1
    while rnd <= n_max:
        if scan_lo <= rnd <= scan_hi:
            L = scan_hi - rnd + 1
            (
                evals_all,
                r_all,
                eq_n,
                eq_sharp_n,
                prev_s_eval,
                bufs,
            ) = run_region(
                transcript,
                base_key + ("b_scan", rnd, L),
                scan_factory(rnd, L),
                xi_s,
                bufs,
                mu_pows,
                lambda_pows_dev,
                beta_pows_dev,
                eq3b,
                eq_n,
                eq_sharp_n,
                prev_s_eval,
            )
            round_blocks.append(("s", evals_all, r_all))
            rnd += L
        else:
            (
                batch_evals,
                r_rnd,
                bufs,
                tilde,
                eq_n,
                eq_sharp_n,
                prev_s_eval,
            ) = run_region(
                transcript,
                base_key + ("b_rnd", rnd),
                round_factory(rnd),
                xi_s,
                bufs,
                tuple(tilde),
                mu_pows,
                lambda_pows_dev,
                beta_pows_dev,
                eq3b,
                # r_prev: r0 for round 1, else the previous round's sample
                r0 if rnd == 1 else r_prev_dev,
                eq_n,
                eq_sharp_n,
                prev_s_eval,
            )
            round_blocks.append(("u", batch_evals, r_rnd))
            r_prev_dev = r_rnd
            rnd += 1

    # ---- column openings --------------------------------------------------
    def open_factory():
        def body(tr, bufs):
            parts_dev = []
            for t_idx, t in enumerate(traces):
                sels, prep_pair, main_pairs = bufs[t_idx]
                all_pairs = (
                    [prep_pair] if prep_pair is not None else []
                ) + list(main_pairs)
                parts_dev.append(
                    [
                        (
                            local[:, 0],
                            nxt[:, 0] if t.needs_next else None,
                        )
                        for local, nxt in all_pairs
                    ]
                )

            def interleave(lh, nh):
                if nh is None:
                    nh = jnp.zeros_like(lh)
                return jnp.stack([lh, nh], axis=1).reshape(-1)

            flats = [
                interleave(*parts_dev[t_idx][-1])
                for t_idx in range(num_traces)
            ]
            for t_idx in range(num_traces):
                flats.extend(
                    interleave(*p) for p in parts_dev[t_idx][:-1]
                )
            if flats:
                tr.observe_slice(jnp.concatenate(flats))
            return tuple(
                tuple(
                    (lh, nh) if nh is not None else (lh, None)
                    for lh, nh in pd
                )
                for pd in parts_dev
            )

        return body

    parts_dev = run_region(
        transcript, base_key + ("b_open",), open_factory, bufs
    )

    # ---- proof assembly ---------------------------------------------------
    # ONE batched fetch when concrete (eager prover); free symbolic slices
    # under the segmented prover's outer trace
    concrete = not isinstance(transcript.state, jax.core.Tracer)
    r_parts = [r0[None]]
    for kind, evals, r_blk in round_blocks:
        r_parts.append(r_blk[None] if kind == "u" else r_blk)
    r_stack = jnp.concatenate(r_parts, axis=0)  # (n_max + 1, 4)

    payload = (claims_nd, s0_coeffs, round_blocks, parts_dev)
    if concrete:
        payload = jax.device_get(payload)
    claims_h, s0_h, blocks_h, parts_h = payload

    numerator_term_per_air = [claims_h[t][0] for t in range(num_traces)]
    denominator_term_per_air = [claims_h[t][1] for t in range(num_traces)]

    sumcheck_round_polys: List[List] = []
    for kind, evals, r_blk in blocks_h:
        if kind == "u":
            sumcheck_round_polys.append(
                [evals[i] for i in range(s_deg)]
            )
        else:
            for j in range(evals.shape[0]):
                sumcheck_round_polys.append(
                    [evals[j, i] for i in range(s_deg)]
                )

    column_openings: List[List[List[np.ndarray]]] = []
    for t_idx, t in enumerate(traces):
        part_openings = []
        for lh, nh in parts_h[t_idx]:
            if t.needs_next:
                flat = []
                for c in range(lh.shape[0]):
                    flat.extend([lh[c], nh[c]])
            else:
                flat = [lh[c] for c in range(lh.shape[0])]
            part_openings.append(flat)
        common = part_openings[-1]
        rest = part_openings[:-1]
        column_openings.append([common] + rest)

    batch_proof = BatchConstraintProof(
        numerator_term_per_air=numerator_term_per_air,
        denominator_term_per_air=denominator_term_per_air,
        univariate_round_coeffs=[s0_h[j] for j in range(s0_deg + 1)],
        sumcheck_round_polys=sumcheck_round_polys,
        column_openings=column_openings,
    )
    return batch_proof, r_stack


def prove_zerocheck_and_logup(
    transcript: Transcript,
    params: SystemParams,
    global_degree: int,
    traces: List[TraceProver],
    save_memory: bool = False,
) -> Tuple[GkrProof, BatchConstraintProof, List[np.ndarray]]:
    """Full RAP prover: GKR phase then batch-constraint phase (see the
    phase functions; reference ``prove_zerocheck_and_logup``
    ``src/prover/logup_zerocheck/mod.rs:40``)."""
    gkr_proof, xi, beta = prove_gkr_phase(
        transcript, params, global_degree, traces
    )
    batch_proof, r = prove_batch_phase(
        transcript, params, global_degree, traces, xi, beta, save_memory
    )
    return gkr_proof, batch_proof, r


def pad_to(coeffs: np.ndarray, size: int) -> np.ndarray:
    out = np.zeros((size, 4), dtype=np.uint64)
    k = min(coeffs.shape[0], size)
    out[:k] = coeffs[:k]
    return out
