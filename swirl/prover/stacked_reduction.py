"""Stacked opening reduction: batch sumcheck reducing per-trace column (and
rotated-column) opening claims at the prism point r to openings of the
stacked matrix columns at a fresh prism point u.

Cf. reference ``crates/stark-backend/src/prover/stacked_reduction.rs``. The
device computes the per-group (same trace log-height) reduction grids and
folds; the host combines the z-dependent univariate kernels and runs the
transcript.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import ext as hext
from ..fields import jfield as jf
from ..fields.babybear import GENERATOR, P, U64, roots_of_unity, two_adic_generator
from ..params import SystemParams
from ..proof import StackingProof
from .errors import StackedReductionError
from ..transcript import Transcript
from .. import poly as hpoly
from .stacked_pcs import StackedPcsData, StackedSlice
from .sumcheck import (
    barycentric_weights_dev,
    coset_eval_chunks,
    eq_hypercube_dev,
    fold_mle,
    fold_mle_vec,
)
from .vmode import vm


@dataclass
class TraceView:
    com_idx: int
    slice: StackedSlice
    lambda_eq_idx: int
    lambda_rot_idx: Optional[int]


def prove_stacked_opening_reduction(
    transcript: Transcript,
    params: SystemParams,
    stacked_per_commit: List[StackedPcsData],
    need_rot_per_commit: List[List[bool]],
    r: List[np.ndarray],
) -> Tuple[StackingProof, List[np.ndarray]]:
    from .gkr import _scan_ok as _dev

    if _dev(transcript):
        # device transcript (eager or segmented fused prover): the
        # region-jit implementation with an identical event schedule
        return _reduction_device(
            transcript, params, stacked_per_commit, need_rot_per_commit, r
        )
    v = vm()
    l_skip = params.l_skip
    n_stack = params.n_stack
    omega_skip = two_adic_generator(l_skip)
    if not isinstance(r, list):
        # the device batch phase hands the opening point over as ONE
        # stacked (n+1, 4) array; the host path indexes per element
        r = [r[i] for i in range(int(r.shape[0]))]
    lam = transcript.sample_ext()

    # trace views with lambda slot assignment (eq at 2i, rot at 2i+1)
    trace_views: List[TraceView] = []
    lam_idx = 0
    for com_idx, d in enumerate(stacked_per_commit):
        need_rot = need_rot_per_commit[com_idx]
        for mat_idx, _col, sl in d.layout.sorted_cols:
            rot_idx = lam_idx + 1 if need_rot[mat_idx] else None
            trace_views.append(TraceView(com_idx, sl, lam_idx, rot_idx))
            lam_idx += 2
    lambda_pows = v.ext.epowers(lam, lam_idx if lam_idx else 1)

    # group consecutive views by log_height
    groups: List[Tuple[int, int]] = []
    start = 0
    for i in range(1, len(trace_views) + 1):
        if (
            i == len(trace_views)
            or trace_views[i].slice.log_height != trace_views[start].slice.log_height
        ):
            groups.append((start, i))
            start = i

    r0 = r[0]
    eq_const = v.poly.eval_eq_uni_at_one(
        l_skip, v.ext.escale(r0, omega_skip)
    )

    # eq(r[1..1+n_lift], -) tables per log-height (device)
    eq_r_per_lht: Dict[int, jnp.ndarray] = {}
    for tv in trace_views:
        lht = tv.slice.log_height
        if lht not in eq_r_per_lht:
            n_lift = max(lht - l_skip, 0)
            if len(r) < 1 + n_lift:
                # reference: StackedReductionError::EqRMissing (error.rs)
                raise StackedReductionError(
                    f"eq_r missing entry for log_height={lht}: need "
                    f"{1 + n_lift} opening-point coords, got {len(r)}"
                )
            vec = v.stack(r[1 : 1 + n_lift])
            eq_r_per_lht[lht] = eq_hypercube_dev(vec)

    # lambda weight arrays per group (device)
    def group_weights(s: int, e: int):
        lam_eq = v.stack([lambda_pows[trace_views[i].lambda_eq_idx] for i in range(s, e)])
        lam_rot = v.stack(
            [
                lambda_pows[trace_views[i].lambda_rot_idx]
                if trace_views[i].lambda_rot_idx is not None
                else v.ext.ezero()
                for i in range(s, e)
            ]
        )
        return v.const_vec(lam_eq), v.const_vec(lam_rot)

    # ---- univariate round 0 -------------------------------------------------
    g = GENERATOR
    shifts = [pow(g, c + 1, P) for c in range(2)]
    B_z = 2 << l_skip
    z_points = []
    w_pows = roots_of_unity(l_skip)
    for sh in shifts:
        for i in range(1 << l_skip):
            z_points.append(sh * int(w_pows[i]) % P)

    stacked_mats = [d.get_matrix() for d in stacked_per_commit]
    total_evals = v.ext.ezero((B_z,))
    for s, e in groups:
        lht = trace_views[s].slice.log_height
        n = lht - l_skip
        n_lift = max(n, 0)
        lam_eq_dev, lam_rot_dev = group_weights(s, e)
        eq_tab = eq_r_per_lht[lht]  # (2^n_lift, 4)
        krot_tab = jnp.roll(eq_tab, 1, axis=0)
        # q column slices (full, non-strided): (G, slice_len)
        cols = []
        for i in range(s, e):
            tv = trace_views[i]
            mat = stacked_mats[tv.com_idx]
            sl = tv.slice
            cols.append(
                jax_slice(mat, sl.col_idx, sl.row_idx, sl.length(l_skip))
            )
        q_grid = coset_eval_chunks(jnp.stack(cols), l_skip, shifts, False)
        # (G, 2^n_lift, B_z); reduce with lambda/eq weights
        a_vec = reduce_zx(q_grid, lam_eq_dev, eq_tab)  # sum lam_eq * eq_x * q
        b_vec = reduce_zx(q_grid, lam_rot_dev, eq_tab)
        c_vec = reduce_zx(
            q_grid, lam_rot_dev, jf.ext_sub(krot_tab, eq_tab)
        )
        a_h, b_h, c_h = (v.ef(x) for x in (a_vec, b_vec, c_vec))
        # z-dependent univariate kernels, BATCHED over all B_z z-points:
        # the eq-kernel formulas are elementwise in z, so one (B_z, 4)
        # ladder replaces B_z scalar ladders (the per-z loop dominated the
        # fused seg3 program's op count). Identical field values.
        if n < 0:
            l_eff = l_skip + n
            omega_eff = pow(omega_skip, 1 << (-n), P)
            r_eff = v.ext.epow(r0, 1 << (-n))
        else:
            l_eff, omega_eff, r_eff = l_skip, omega_skip, r0
        z_vec = v.stack([v.ext.from_base(z) for z in z_points])  # (B_z, 4)
        ind_b = v.poly.eval_in_uni(l_skip, n, z_vec)
        eq_uni_r0_b = v.poly.eval_eq_uni(l_eff, z_vec, r_eff)
        eq_uni_r0_rot_b = v.poly.eval_eq_uni(
            l_eff, z_vec, v.ext.escale(r_eff, omega_eff)
        )
        eq_uni_1_b = v.poly.eval_eq_uni_at_one(l_skip, z_vec)
        term = v.ext.emul(eq_uni_r0_b, a_h)
        term = v.ext.eadd(term, v.ext.emul(eq_uni_r0_rot_b, b_h))
        term = v.ext.eadd(
            term, v.ext.emul(v.ext.emul(eq_const, eq_uni_1_b), c_h)
        )
        total_evals = v.ext.eadd(total_evals, v.ext.emul(term, ind_b))

    grid = total_evals.reshape(2, 1 << l_skip, 4).transpose(1, 0, 2)
    s0_coeffs_full = v.poly.from_geometric_cosets_evals(grid, g, g)
    s0_deg = 2 * ((1 << l_skip) - 1)
    s0_coeffs = s0_coeffs_full[: s0_deg + 1]
    from .gkr import _scan_ok

    if _scan_ok(transcript):
        # one flat absorb == the per-coefficient observe_ext sequence
        # (the eager prover paid ~2 relay dispatches per coefficient)
        transcript.observe_slice(jnp.ravel(jnp.asarray(s0_coeffs)))
    else:
        for c in s0_coeffs:
            transcript.observe_ext(c)

    u: List[np.ndarray] = []
    u0 = transcript.sample_ext()
    u.append(u0)

    # ---- fold at u_0 ----------------------------------------------------------
    from .sumcheck import fold_ple

    weights = barycentric_weights_dev(l_skip, u0)
    q_evals = [
        fold_ple(m, l_skip, False, weights) for m in stacked_mats
    ]

    eq_uni_u0r0 = v.poly.eval_eq_uni(l_skip, u0, r0)
    eq_uni_u0r0_rot = v.poly.eval_eq_uni(
        l_skip, u0, v.ext.escale(r0, omega_skip)
    )
    eq_uni_u01 = v.poly.eval_eq_uni_at_one(l_skip, u0)

    k_rot_per_lht: Dict[int, jnp.ndarray] = {}
    for lht, tab in list(eq_r_per_lht.items()):
        n = lht - l_skip
        n_lift = max(n, 0)
        ind = v.poly.eval_in_uni(l_skip, n, u0)
        if n < 0:
            omega_eff = pow(omega_skip, 1 << (-n), P)
            r_eff = v.ext.epow(r0, 1 << (-n))
            l_eff = l_skip + n
            eq_uni = v.poly.eval_eq_uni(l_eff, u0, r_eff)
            eq_uni_rot = v.poly.eval_eq_uni(
                l_eff, u0, v.ext.escale(r_eff, omega_eff)
            )
        else:
            eq_uni, eq_uni_rot = eq_uni_u0r0, eq_uni_u0r0_rot
        krot_gather = jnp.roll(tab, 1, axis=0)
        c1 = v.ef_dev(v.ext.emul(ind, eq_uni_rot))
        c2 = v.ef_dev(v.ext.emul(ind, v.ext.emul(eq_const, eq_uni_u01)))
        k_rot_per_lht[lht] = jf.ext_add(
            jf.ext_mul(c1, tab),
            jf.ext_mul(c2, jf.ext_sub(krot_gather, tab)),
        )
        eq_r_per_lht[lht] = jf.ext_mul(
            v.ef_dev(v.ext.emul(ind, eq_uni)), tab
        )

    # per-group eq(u, b) accumulators for the tilde regime, as (G, 4) vmode
    # vectors keyed by group start (lazily created on first tilde round)
    eq_ub_g: Dict[int, object] = {}

    def _tilde_eq_ub(s: int):
        if s not in eq_ub_g:
            e = next(e2 for (s2, e2) in groups if s2 == s)
            eq_ub_g[s] = v.stack([v.ext.eone()] * (e - s))
        return eq_ub_g[s]

    # ---- rounds 1..n_stack ----------------------------------------------------
    sumcheck_round_polys: List[List[np.ndarray]] = []

    def _round_unrolled(rnd: int):
        nonlocal q_evals, eq_r_per_lht, k_rot_per_lht
        s_evals = [v.ext.ezero(), v.ext.ezero()]
        for s, e in groups:
            lht = trace_views[s].slice.log_height
            n_lift = max(lht - l_skip, 0)
            hd = max(n_lift - rnd, 0)
            eq_tab = eq_r_per_lht[lht]
            krot_tab = k_rot_per_lht[lht]
            if rnd <= n_lift:
                lam_eq_dev, lam_rot_dev = group_weights(s, e)
                cols = []
                for i in range(s, e):
                    tv = trace_views[i]
                    sl = tv.slice
                    row_start = (sl.row_idx >> lht) << (hd + 1)
                    cols.append(
                        jax_slice_ext(
                            q_evals[tv.com_idx], sl.col_idx, row_start, 2 << hd
                        )
                    )
                q_grid = jnp.stack(cols)  # (G, 2<<hd, 4)
                for xi, x in enumerate((1, 2)):
                    q_x = interp_pairs(q_grid, x)  # (G, 2^hd, 4)
                    eq_x = interp_pairs(eq_tab[None], x)[0]  # (2^hd, 4)
                    krot_x = interp_pairs(krot_tab[None], x)[0]
                    w = jf.ext_add(
                        jf.ext_mul(lam_eq_dev[:, None, :], eq_x[None]),
                        jf.ext_mul(lam_rot_dev[:, None, :], krot_x[None]),
                    )
                    val = jf.ext_sum(
                        jf.ext_sum(jf.ext_mul(q_x, w), axis=1), axis=0
                    )
                    s_evals[xi] = v.ext.eadd(s_evals[xi], v.ef(val))
            else:
                # tilde regime, vectorized over the whole group: one batched
                # pair gather + (G, 4) kernel algebra instead of a per-view
                # scalar chain (the per-view loop dominated the fused seg3
                # program at production widths). Same modular values.
                eq0 = v.ef(eq_tab[0])
                krot0 = v.ef(krot_tab[0])
                g_size = e - s
                cols_i = np.asarray(
                    [trace_views[i].slice.col_idx for i in range(s, e)]
                )
                starts = np.asarray(
                    [
                        (trace_views[i].slice.row_idx >> (l_skip + rnd)) << 1
                        for i in range(s, e)
                    ]
                )
                b_bits = [
                    (trace_views[i].slice.row_idx >> (l_skip + rnd - 1)) & 1
                    for i in range(s, e)
                ]
                # one batched gather per commitment run (a group can span
                # commitments: e.g. a preprocessed commit at the same height)
                rows = starts[:, None] + np.arange(2)[None, :]
                pieces = []
                run_start = 0
                for i in range(1, g_size + 1):
                    if (
                        i == g_size
                        or trace_views[s + i].com_idx
                        != trace_views[s + run_start].com_idx
                    ):
                        com = trace_views[s + run_start].com_idx
                        pieces.append(
                            q_evals[com][
                                jnp.asarray(cols_i[run_start:i])[:, None],
                                jnp.asarray(rows[run_start:i]),
                            ]
                        )
                        run_start = i
                q_pairs = v.ef(
                    pieces[0]
                    if len(pieces) == 1
                    else jnp.concatenate(pieces, axis=0)
                )  # (G, 2, 4)
                lam_eq_vals = v.stack(
                    [lambda_pows[trace_views[i].lambda_eq_idx] for i in range(s, e)]
                )
                lam_rot_vals = v.stack(
                    [
                        lambda_pows[trace_views[i].lambda_rot_idx]
                        if trace_views[i].lambda_rot_idx is not None
                        else v.ext.ezero()
                        for i in range(s, e)
                    ]
                )
                ub_base = _tilde_eq_ub(s)
                for xi, x in enumerate((1, 2)):
                    q_x = v.ext.eadd(
                        q_pairs[:, 0],
                        v.ext.escale(
                            v.ext.esub(q_pairs[:, 1], q_pairs[:, 0]), x
                        ),
                    )
                    # eq(x, b) = 1 + 2xb - x - b: a static per-view constant
                    eqb_vec = v.stack(
                        [
                            v.ext.from_base((1 + 2 * x * b - x - b) % P)
                            for b in b_bits
                        ]
                    )
                    ub = v.ext.emul(ub_base, eqb_vec)
                    acc = v.ext.emul(
                        lam_eq_vals, v.ext.emul(q_x, v.ext.emul(eq0, ub))
                    )
                    acc = v.ext.eadd(
                        acc,
                        v.ext.emul(
                            lam_rot_vals,
                            v.ext.emul(q_x, v.ext.emul(krot0, ub)),
                        ),
                    )
                    s_evals[xi] = v.ext.eadd(
                        s_evals[xi], v.ext.esum(acc, axis=0)
                    )

        for ev in s_evals:
            transcript.observe_ext(ev)
        sumcheck_round_polys.append(list(s_evals))
        u_rnd = transcript.sample_ext()
        u.append(u_rnd)
        u_dev = v.ef_dev(u_rnd)
        q_evals = [fold_mle(q, u_dev) for q in q_evals]
        eq_r_per_lht = {
            lht: fold_mle_vec(tab, u_dev) if tab.shape[0] > 1 else tab
            for lht, tab in eq_r_per_lht.items()
        }
        k_rot_per_lht = {
            lht: fold_mle_vec(tab, u_dev) if tab.shape[0] > 1 else tab
            for lht, tab in k_rot_per_lht.items()
        }
        for s, e in groups:
            n_lift = max(trace_views[s].slice.log_height - l_skip, 0)
            if rnd > n_lift:
                # eq(u, b) = u if b else (1 - u), vectorized with the static
                # 0/1 bit vector: factor = b*u + (1-b)*(1-u)
                b_vec = v.stack(
                    [
                        v.ext.from_base(
                            (trace_views[i].slice.row_idx >> (l_skip + rnd - 1))
                            & 1
                        )
                        for i in range(s, e)
                    ]
                )
                one = v.ext.eone()
                factor = v.ext.eadd(
                    v.ext.emul(b_vec, u_rnd),
                    v.ext.emul(
                        v.ext.esub(one, b_vec), v.ext.esub(one, u_rnd)
                    ),
                )
                eq_ub_g[s] = v.ext.emul(_tilde_eq_ub(s), factor)

    def _rounds_scan(rnd0: int, L: int):
        """Rounds rnd0..rnd0+L-1 as ONE lax.scan (trace mode, every view
        active: rnd <= n_lift for all groups, so no eq_ub updates). Events
        and values bit-identical to ``_round_unrolled``."""
        import jax

        nonlocal q_evals, eq_r_per_lht, k_rot_per_lht

        from ..fields import text
        from .device_transcript import EF_D, RATE, duplex_absorb_sample_ext

        lhts = sorted(eq_r_per_lht)
        group_meta = []
        for s, e in groups:
            lht = trace_views[s].slice.log_height
            n_lift = lht - l_skip
            hd0 = n_lift - rnd0
            lam_eq_dev, lam_rot_dev = group_weights(s, e)
            bases = [
                (trace_views[i].slice.row_idx >> lht) << (hd0 + 1)
                for i in range(s, e)
            ]
            cols = [trace_views[i].slice.col_idx for i in range(s, e)]
            coms = [trace_views[i].com_idx for i in range(s, e)]
            group_meta.append(
                (lht, hd0, lam_eq_dev, lam_rot_dev, bases, cols, coms)
            )

        def body(carry, j):
            state, q_bufs, eq_tabs, krot_tabs = carry
            s_evals = [jnp.asarray(text.ezero()), jnp.asarray(text.ezero())]
            for lht, hd0, lam_eq_dev, lam_rot_dev, bases, cols, coms in group_meta:
                eq_tab = eq_tabs[lhts.index(lht)]
                krot_tab = krot_tabs[lhts.index(lht)]
                length = 2 << hd0
                grid_cols = []
                for base, col, com in zip(bases, cols, coms):
                    start = jnp.uint32(base) >> j
                    grid_cols.append(
                        jax.lax.dynamic_slice(
                            q_bufs[com],
                            (jnp.uint32(col), start, jnp.uint32(0)),
                            (1, length, 4),
                        )[0]
                    )
                q_grid = jnp.stack(grid_cols)  # (G, 2<<hd0, 4)
                pair_mask = (
                    jax.lax.iota(jnp.uint32, 1 << hd0) < (jnp.uint32(1 << hd0) >> j)
                )
                for xi, x in enumerate((1, 2)):
                    q_x = interp_pairs(q_grid, x)  # (G, 2^hd0, 4)
                    eq_x = interp_pairs(eq_tab[None], x)[0]
                    krot_x = interp_pairs(krot_tab[None], x)[0]
                    w = jf.ext_add(
                        jf.ext_mul(lam_eq_dev[:, None, :], eq_x[None]),
                        jf.ext_mul(lam_rot_dev[:, None, :], krot_x[None]),
                    )
                    val = jnp.where(
                        pair_mask[None, :, None],
                        jf.ext_mul(q_x, w),
                        jnp.uint32(0),
                    )
                    s_evals[xi] = text.eadd(
                        s_evals[xi],
                        jf.ext_sum(jf.ext_sum(val, axis=1), axis=0),
                    )

            evals2 = jnp.stack(s_evals)  # (2, 4)
            state, u_rnd = duplex_absorb_sample_ext(state, evals2.reshape(-1))

            def fold_front(mat):
                folded = fold_mle(mat, u_rnd)
                return jnp.concatenate(
                    [folded, jnp.zeros_like(folded)], axis=1
                )

            def fold_front_vec(tab):
                folded = fold_mle_vec(tab, u_rnd)
                return jnp.concatenate(
                    [folded, jnp.zeros_like(folded)], axis=0
                )

            q_bufs = tuple(fold_front(q) for q in q_bufs)
            eq_tabs = tuple(fold_front_vec(t) for t in eq_tabs)
            krot_tabs = tuple(fold_front_vec(t) for t in krot_tabs)
            return (state, q_bufs, eq_tabs, krot_tabs), (evals2, u_rnd)

        assert transcript.absorb_idx == 0
        init = (
            transcript.state,
            tuple(jnp.asarray(q) for q in q_evals),
            tuple(jnp.asarray(eq_r_per_lht[lht]) for lht in lhts),
            tuple(jnp.asarray(k_rot_per_lht[lht]) for lht in lhts),
        )
        (state, q_bufs, eq_tabs, krot_tabs), (evals_all, u_all) = jax.lax.scan(
            body, init, jnp.arange(L, dtype=jnp.uint32), length=L
        )
        transcript.state = state
        transcript.absorb_idx = 0
        transcript.sample_idx = RATE - EF_D
        for j in range(L):
            sumcheck_round_polys.append(
                [v.ef(evals_all[j, 0]), v.ef(evals_all[j, 1])]
            )
            u.append(v.ef(u_all[j]))
        # crop the fixed-size buffers back to TRUE folded lengths so the
        # post-scan unrolled rounds (tilde regime, openings) see the same
        # physical shapes as the fully-unrolled path
        scan_end = rnd0 + L - 1
        q_true = 1 << (n_stack - scan_end)
        q_evals = [q[:, :q_true] for q in q_bufs]
        eq_r_per_lht = {}
        k_rot_per_lht = {}
        for i, lht in enumerate(lhts):
            n_lift = max(lht - l_skip, 0)
            t_true = max(1 << max(n_lift - scan_end, 0), 1)
            eq_r_per_lht[lht] = eq_tabs[i][:t_true]
            k_rot_per_lht[lht] = krot_tabs[i][:t_true]

    from .gkr import _MLE_TAIL_LOG, _scan_ok

    min_n_lift = min(
        max(trace_views[s].slice.log_height - l_skip, 0) for s, e in groups
    )
    scan_hi = min_n_lift if _scan_ok(transcript) else 0
    scan_lo = max(1, n_stack - _MLE_TAIL_LOG + 1)

    rnd = 1
    while rnd <= n_stack:
        if scan_lo <= rnd <= scan_hi:
            L = scan_hi - rnd + 1
            _rounds_scan(rnd, L)
            rnd += L
        else:
            _round_unrolled(rnd)
            rnd += 1

    stacking_openings = []
    if _scan_ok(transcript):
        # absorb every opening as one flat vector (identical felt order to
        # the per-column observe_ext loop), then assemble the proof lists
        # from ONE batched fetch when concrete
        import jax

        cols_dev = [q[:, 0] for q in q_evals]  # (W_c, 4) each
        if cols_dev:
            transcript.observe_slice(
                jnp.concatenate([jnp.ravel(c) for c in cols_dev])
            )
        concrete = not any(
            isinstance(c, jax.core.Tracer) for c in cols_dev
        )
        cols_h = jax.device_get(cols_dev) if concrete else cols_dev
        for host in cols_h:
            stacking_openings.append(
                [host[c] for c in range(host.shape[0])]
            )
        s0_list = (
            [c for c in jax.device_get(jnp.asarray(s0_coeffs))]
            if concrete
            else [c for c in s0_coeffs]
        )
    else:
        for q in q_evals:
            host = v.ef(q[:, 0])  # (W, 4)
            opens = [host[c] for c in range(host.shape[0])]
            for c in opens:
                transcript.observe_ext(c)
            stacking_openings.append(opens)
        s0_list = [c for c in s0_coeffs]

    proof = StackingProof(
        univariate_round_coeffs=s0_list,
        sumcheck_round_polys=sumcheck_round_polys,
        stacking_openings=stacking_openings,
    )
    return proof, u


def _reduction_device(
    transcript,
    params: SystemParams,
    stacked_per_commit: List[StackedPcsData],
    need_rot_per_commit: List[List[bool]],
    r,
) -> Tuple[StackingProof, object]:
    """Device-transcript stacked reduction: the same protocol flow as the
    host body of :func:`prove_stacked_opening_reduction`, restructured into
    region-jit programs (:mod:`swirl.prover.regions`):

    - ``rd0``: lambda sample, round-0 grids + z kernels, s_0 absorb, u_0
      squeeze, PLE folds + eq/k_rot table updates;
    - ``rd_blk``: every contiguous run of unrolled rounds as ONE program;
    - ``rd_scan``: the mid rounds as one ``lax.scan`` program;
    - ``rd_open``: the flat stacking-opening absorb.

    ``r`` is the stacked (n+1, 4) opening point from the device batch
    phase (a list is also accepted); the returned ``u`` is likewise ONE
    stacked (n_stack + 1, 4) device array. Byte-identity with the host
    path is CI-pinned (tests/test_fused.py)."""
    from .regions import run_region

    v = vm()
    l_skip = params.l_skip
    n_stack = params.n_stack
    omega_skip = two_adic_generator(l_skip)
    g = GENERATOR

    r_stack = (
        jnp.asarray(r)
        if not isinstance(r, list)
        else jnp.stack([jnp.asarray(x) for x in r])
    )
    num_r = int(r_stack.shape[0])

    # static trace views / groups (identical to the host body)
    trace_views: List[TraceView] = []
    lam_idx = 0
    for com_idx, d in enumerate(stacked_per_commit):
        need_rot = need_rot_per_commit[com_idx]
        for mat_idx, _col, sl in d.layout.sorted_cols:
            rot_idx = lam_idx + 1 if need_rot[mat_idx] else None
            trace_views.append(TraceView(com_idx, sl, lam_idx, rot_idx))
            lam_idx += 2
    groups: List[Tuple[int, int]] = []
    start = 0
    for i in range(1, len(trace_views) + 1):
        if (
            i == len(trace_views)
            or trace_views[i].slice.log_height
            != trace_views[start].slice.log_height
        ):
            groups.append((start, i))
            start = i
    lhts = sorted({tv.slice.log_height for tv in trace_views})
    for lht in lhts:
        n_lift = max(lht - l_skip, 0)
        if num_r < 1 + n_lift:
            # reference: StackedReductionError::EqRMissing (error.rs)
            raise StackedReductionError(
                f"eq_r missing entry for log_height={lht}: need "
                f"{1 + n_lift} opening-point coords, got {num_r}"
            )

    stacked_mats = [d.get_matrix() for d in stacked_per_commit]
    base_key = (
        "reduction",
        l_skip,
        n_stack,
        num_r,
        tuple(
            (
                tv.com_idx,
                tv.slice.col_idx,
                tv.slice.row_idx,
                tv.slice.log_height,
                tv.lambda_eq_idx,
                tv.lambda_rot_idx,
            )
            for tv in trace_views
        ),
        tuple(int(m.shape[0]) for m in stacked_mats),
        tuple(int(m.shape[1]) for m in stacked_mats),
    )

    def group_weights_from(lambda_pows, s: int, e: int):
        lam_eq = jnp.stack(
            [lambda_pows[trace_views[i].lambda_eq_idx] for i in range(s, e)]
        )
        lam_rot = jnp.stack(
            [
                lambda_pows[trace_views[i].lambda_rot_idx]
                if trace_views[i].lambda_rot_idx is not None
                else jnp.zeros((4,), jnp.uint32)
                for i in range(s, e)
            ]
        )
        return lam_eq, lam_rot

    # ---- region rd0: round 0 + s_0 + fold at u_0 --------------------------
    s0_deg = 2 * ((1 << l_skip) - 1)

    def rd0_factory():
        def body(tr, r_s, mats):
            v = vm()
            lam = tr.sample_ext()
            lambda_pows = v.const_vec(
                v.ext.epowers(lam, lam_idx if lam_idx else 1)
            )
            r0 = r_s[0]
            eq_const = v.poly.eval_eq_uni_at_one(
                l_skip, v.ext.escale(r0, omega_skip)
            )
            eq_r_per_lht = {}
            for lht in lhts:
                n_lift = max(lht - l_skip, 0)
                eq_r_per_lht[lht] = eq_hypercube_dev(r_s[1 : 1 + n_lift])

            shifts = [pow(g, c + 1, P) for c in range(2)]
            B_z = 2 << l_skip
            w_pows = roots_of_unity(l_skip)
            z_points = []
            for sh in shifts:
                for i in range(1 << l_skip):
                    z_points.append(sh * int(w_pows[i]) % P)

            total_evals = v.ext.ezero((B_z,))
            for s, e in groups:
                lht = trace_views[s].slice.log_height
                n = lht - l_skip
                n_lift = max(n, 0)
                lam_eq_dev, lam_rot_dev = group_weights_from(
                    lambda_pows, s, e
                )
                eq_tab = eq_r_per_lht[lht]
                krot_tab = jnp.roll(eq_tab, 1, axis=0)
                cols = []
                for i in range(s, e):
                    tv = trace_views[i]
                    mat = mats[tv.com_idx]
                    sl = tv.slice
                    cols.append(
                        jax_slice(
                            mat, sl.col_idx, sl.row_idx, sl.length(l_skip)
                        )
                    )
                q_grid = coset_eval_chunks(
                    jnp.stack(cols), l_skip, shifts, False
                )
                a_vec = reduce_zx(q_grid, lam_eq_dev, eq_tab)
                b_vec = reduce_zx(q_grid, lam_rot_dev, eq_tab)
                c_vec = reduce_zx(
                    q_grid, lam_rot_dev, jf.ext_sub(krot_tab, eq_tab)
                )
                a_h, b_h, c_h = (v.ef(x) for x in (a_vec, b_vec, c_vec))
                if n < 0:
                    l_eff = l_skip + n
                    omega_eff = pow(omega_skip, 1 << (-n), P)
                    r_eff = v.ext.epow(r0, 1 << (-n))
                else:
                    l_eff, omega_eff, r_eff = l_skip, omega_skip, r0
                z_vec = v.stack([v.ext.from_base(z) for z in z_points])
                ind_b = v.poly.eval_in_uni(l_skip, n, z_vec)
                eq_uni_r0_b = v.poly.eval_eq_uni(l_eff, z_vec, r_eff)
                eq_uni_r0_rot_b = v.poly.eval_eq_uni(
                    l_eff, z_vec, v.ext.escale(r_eff, omega_eff)
                )
                eq_uni_1_b = v.poly.eval_eq_uni_at_one(l_skip, z_vec)
                term = v.ext.emul(eq_uni_r0_b, a_h)
                term = v.ext.eadd(term, v.ext.emul(eq_uni_r0_rot_b, b_h))
                term = v.ext.eadd(
                    term, v.ext.emul(v.ext.emul(eq_const, eq_uni_1_b), c_h)
                )
                total_evals = v.ext.eadd(
                    total_evals, v.ext.emul(term, ind_b)
                )

            grid = total_evals.reshape(2, 1 << l_skip, 4).transpose(1, 0, 2)
            s0_coeffs_full = v.poly.from_geometric_cosets_evals(grid, g, g)
            s0_coeffs = s0_coeffs_full[: s0_deg + 1]
            tr.observe_slice(jnp.ravel(jnp.asarray(s0_coeffs)))
            u0 = tr.sample_ext()

            # ---- fold at u_0 ------------------------------------------
            from .sumcheck import fold_ple

            weights = barycentric_weights_dev(l_skip, u0)
            q_evals = [fold_ple(m, l_skip, False, weights) for m in mats]

            eq_uni_u0r0 = v.poly.eval_eq_uni(l_skip, u0, r0)
            eq_uni_u0r0_rot = v.poly.eval_eq_uni(
                l_skip, u0, v.ext.escale(r0, omega_skip)
            )
            eq_uni_u01 = v.poly.eval_eq_uni_at_one(l_skip, u0)

            eq_list = []
            krot_list = []
            for lht in lhts:
                tab = eq_r_per_lht[lht]
                n = lht - l_skip
                ind = v.poly.eval_in_uni(l_skip, n, u0)
                if n < 0:
                    omega_eff = pow(omega_skip, 1 << (-n), P)
                    r_eff = v.ext.epow(r0, 1 << (-n))
                    l_eff = l_skip + n
                    eq_uni = v.poly.eval_eq_uni(l_eff, u0, r_eff)
                    eq_uni_rot = v.poly.eval_eq_uni(
                        l_eff, u0, v.ext.escale(r_eff, omega_eff)
                    )
                else:
                    eq_uni, eq_uni_rot = eq_uni_u0r0, eq_uni_u0r0_rot
                krot_gather = jnp.roll(tab, 1, axis=0)
                c1 = v.ef_dev(v.ext.emul(ind, eq_uni_rot))
                c2 = v.ef_dev(
                    v.ext.emul(ind, v.ext.emul(eq_const, eq_uni_u01))
                )
                krot_list.append(
                    jf.ext_add(
                        jf.ext_mul(c1, tab),
                        jf.ext_mul(c2, jf.ext_sub(krot_gather, tab)),
                    )
                )
                eq_list.append(
                    jf.ext_mul(v.ef_dev(v.ext.emul(ind, eq_uni)), tab)
                )
            return (
                jnp.asarray(s0_coeffs),
                u0,
                tuple(q_evals),
                tuple(eq_list),
                tuple(krot_list),
                lambda_pows,
            )

        return body

    s0_coeffs, u0, q_evals, eq_list, krot_list, lambda_pows = run_region(
        transcript, base_key + ("rd0",), rd0_factory, r_stack, stacked_mats
    )

    # eq(u, b) tilde accumulators per group, carried as (G, 4) arrays
    eq_ub = tuple(
        jnp.broadcast_to(
            jnp.asarray(vm().ext.eone()), (e - s, 4)
        ).astype(jnp.uint32)
        for s, e in groups
    )

    from .gkr import _MLE_TAIL_LOG

    min_n_lift = min(
        max(trace_views[s].slice.log_height - l_skip, 0) for s, e in groups
    )
    scan_hi = min_n_lift
    scan_lo = max(1, n_stack - _MLE_TAIL_LOG + 1)

    # ---- unrolled-round blocks as single programs -------------------------
    def blk_factory(rnd_lo, rnd_hi):
        def factory():
            def body(tr, q_evals, eq_tabs, krot_tabs, eq_ub, lambda_pows):
                v = vm()
                q_evals = list(q_evals)
                eq_tabs = list(eq_tabs)
                krot_tabs = list(krot_tabs)
                eq_ub = list(eq_ub)
                evals_out = []
                u_out = []
                for rnd in range(rnd_lo, rnd_hi + 1):
                    s_evals = [v.ext.ezero(), v.ext.ezero()]
                    for gi, (s, e) in enumerate(groups):
                        lht = trace_views[s].slice.log_height
                        n_lift = max(lht - l_skip, 0)
                        hd = max(n_lift - rnd, 0)
                        eq_tab = eq_tabs[lhts.index(lht)]
                        krot_tab = krot_tabs[lhts.index(lht)]
                        if rnd <= n_lift:
                            lam_eq_dev, lam_rot_dev = group_weights_from(
                                lambda_pows, s, e
                            )
                            cols = []
                            for i in range(s, e):
                                tv = trace_views[i]
                                sl = tv.slice
                                row_start = (sl.row_idx >> lht) << (hd + 1)
                                cols.append(
                                    jax_slice_ext(
                                        q_evals[tv.com_idx],
                                        sl.col_idx,
                                        row_start,
                                        2 << hd,
                                    )
                                )
                            q_grid = jnp.stack(cols)
                            for xi, x in enumerate((1, 2)):
                                q_x = interp_pairs(q_grid, x)
                                eq_x = interp_pairs(eq_tab[None], x)[0]
                                krot_x = interp_pairs(krot_tab[None], x)[0]
                                w = jf.ext_add(
                                    jf.ext_mul(
                                        lam_eq_dev[:, None, :], eq_x[None]
                                    ),
                                    jf.ext_mul(
                                        lam_rot_dev[:, None, :],
                                        krot_x[None],
                                    ),
                                )
                                val = jf.ext_sum(
                                    jf.ext_sum(jf.ext_mul(q_x, w), axis=1),
                                    axis=0,
                                )
                                s_evals[xi] = v.ext.eadd(
                                    s_evals[xi], v.ef(val)
                                )
                        else:
                            eq0 = v.ef(eq_tab[0])
                            krot0 = v.ef(krot_tab[0])
                            g_size = e - s
                            cols_i = np.asarray(
                                [
                                    trace_views[i].slice.col_idx
                                    for i in range(s, e)
                                ]
                            )
                            starts = np.asarray(
                                [
                                    (
                                        trace_views[i].slice.row_idx
                                        >> (l_skip + rnd)
                                    )
                                    << 1
                                    for i in range(s, e)
                                ]
                            )
                            b_bits = [
                                (
                                    trace_views[i].slice.row_idx
                                    >> (l_skip + rnd - 1)
                                )
                                & 1
                                for i in range(s, e)
                            ]
                            rows = starts[:, None] + np.arange(2)[None, :]
                            pieces = []
                            run_start = 0
                            for i in range(1, g_size + 1):
                                if (
                                    i == g_size
                                    or trace_views[s + i].com_idx
                                    != trace_views[s + run_start].com_idx
                                ):
                                    com = trace_views[s + run_start].com_idx
                                    pieces.append(
                                        q_evals[com][
                                            jnp.asarray(
                                                cols_i[run_start:i]
                                            )[:, None],
                                            jnp.asarray(rows[run_start:i]),
                                        ]
                                    )
                                    run_start = i
                            q_pairs = v.ef(
                                pieces[0]
                                if len(pieces) == 1
                                else jnp.concatenate(pieces, axis=0)
                            )
                            lam_eq_vals, lam_rot_vals = group_weights_from(
                                lambda_pows, s, e
                            )
                            ub_base = eq_ub[gi]
                            for xi, x in enumerate((1, 2)):
                                q_x = v.ext.eadd(
                                    q_pairs[:, 0],
                                    v.ext.escale(
                                        v.ext.esub(
                                            q_pairs[:, 1], q_pairs[:, 0]
                                        ),
                                        x,
                                    ),
                                )
                                eqb_vec = v.stack(
                                    [
                                        v.ext.from_base(
                                            (1 + 2 * x * b - x - b) % P
                                        )
                                        for b in b_bits
                                    ]
                                )
                                ub = v.ext.emul(ub_base, eqb_vec)
                                acc = v.ext.emul(
                                    lam_eq_vals,
                                    v.ext.emul(q_x, v.ext.emul(eq0, ub)),
                                )
                                acc = v.ext.eadd(
                                    acc,
                                    v.ext.emul(
                                        lam_rot_vals,
                                        v.ext.emul(
                                            q_x, v.ext.emul(krot0, ub)
                                        ),
                                    ),
                                )
                                s_evals[xi] = v.ext.eadd(
                                    s_evals[xi], v.ext.esum(acc, axis=0)
                                )

                    for ev in s_evals:
                        tr.observe_ext(ev)
                    evals_out.append(v.stack(s_evals))
                    u_rnd = tr.sample_ext()
                    u_out.append(u_rnd)
                    u_dev = v.ef_dev(u_rnd)
                    q_evals = [fold_mle(q, u_dev) for q in q_evals]
                    eq_tabs = [
                        fold_mle_vec(tab, u_dev) if tab.shape[0] > 1 else tab
                        for tab in eq_tabs
                    ]
                    krot_tabs = [
                        fold_mle_vec(tab, u_dev) if tab.shape[0] > 1 else tab
                        for tab in krot_tabs
                    ]
                    for gi, (s, e) in enumerate(groups):
                        n_lift = max(
                            trace_views[s].slice.log_height - l_skip, 0
                        )
                        if rnd > n_lift:
                            b_vec = v.stack(
                                [
                                    v.ext.from_base(
                                        (
                                            trace_views[i].slice.row_idx
                                            >> (l_skip + rnd - 1)
                                        )
                                        & 1
                                    )
                                    for i in range(s, e)
                                ]
                            )
                            one = v.ext.eone()
                            factor = v.ext.eadd(
                                v.ext.emul(b_vec, u_rnd),
                                v.ext.emul(
                                    v.ext.esub(one, b_vec),
                                    v.ext.esub(one, u_rnd),
                                ),
                            )
                            eq_ub[gi] = v.ext.emul(eq_ub[gi], factor)
                return (
                    jnp.stack(evals_out),  # (R, 2, 4)
                    jnp.stack(u_out),  # (R, 4)
                    tuple(q_evals),
                    tuple(eq_tabs),
                    tuple(krot_tabs),
                    tuple(eq_ub),
                )

            return body

        return factory

    def scan_factory(rnd0, L):
        def factory():
            def body(tr, q_evals, eq_tabs, krot_tabs, lambda_pows):
                from ..fields import text
                from .device_transcript import (
                    EF_D,
                    RATE,
                    duplex_absorb_sample_ext,
                )

                group_meta = []
                for s, e in groups:
                    lht = trace_views[s].slice.log_height
                    n_lift = lht - l_skip
                    hd0 = n_lift - rnd0
                    lam_eq_dev, lam_rot_dev = group_weights_from(
                        lambda_pows, s, e
                    )
                    bases = [
                        (trace_views[i].slice.row_idx >> lht) << (hd0 + 1)
                        for i in range(s, e)
                    ]
                    cols = [
                        trace_views[i].slice.col_idx for i in range(s, e)
                    ]
                    coms = [trace_views[i].com_idx for i in range(s, e)]
                    group_meta.append(
                        (lht, hd0, lam_eq_dev, lam_rot_dev, bases, cols, coms)
                    )

                def sbody(carry, j):
                    state, q_bufs, eq_bufs, krot_bufs = carry
                    s_evals = [
                        jnp.asarray(text.ezero()),
                        jnp.asarray(text.ezero()),
                    ]
                    for (
                        lht,
                        hd0,
                        lam_eq_dev,
                        lam_rot_dev,
                        bases,
                        cols,
                        coms,
                    ) in group_meta:
                        eq_tab = eq_bufs[lhts.index(lht)]
                        krot_tab = krot_bufs[lhts.index(lht)]
                        length = 2 << hd0
                        grid_cols = []
                        for base, col, com in zip(bases, cols, coms):
                            start = jnp.uint32(base) >> j
                            grid_cols.append(
                                jax.lax.dynamic_slice(
                                    q_bufs[com],
                                    (
                                        jnp.uint32(col),
                                        start,
                                        jnp.uint32(0),
                                    ),
                                    (1, length, 4),
                                )[0]
                            )
                        q_grid = jnp.stack(grid_cols)
                        pair_mask = (
                            jax.lax.iota(jnp.uint32, 1 << hd0)
                            < (jnp.uint32(1 << hd0) >> j)
                        )
                        for xi, x in enumerate((1, 2)):
                            q_x = interp_pairs(q_grid, x)
                            eq_x = interp_pairs(eq_tab[None], x)[0]
                            krot_x = interp_pairs(krot_tab[None], x)[0]
                            w = jf.ext_add(
                                jf.ext_mul(
                                    lam_eq_dev[:, None, :], eq_x[None]
                                ),
                                jf.ext_mul(
                                    lam_rot_dev[:, None, :], krot_x[None]
                                ),
                            )
                            val = jnp.where(
                                pair_mask[None, :, None],
                                jf.ext_mul(q_x, w),
                                jnp.uint32(0),
                            )
                            s_evals[xi] = text.eadd(
                                s_evals[xi],
                                jf.ext_sum(
                                    jf.ext_sum(val, axis=1), axis=0
                                ),
                            )

                    evals2 = jnp.stack(s_evals)
                    state, u_rnd = duplex_absorb_sample_ext(
                        state, evals2.reshape(-1)
                    )

                    def fold_front(mat):
                        folded = fold_mle(mat, u_rnd)
                        return jnp.concatenate(
                            [folded, jnp.zeros_like(folded)], axis=1
                        )

                    def fold_front_vec(tab):
                        folded = fold_mle_vec(tab, u_rnd)
                        return jnp.concatenate(
                            [folded, jnp.zeros_like(folded)], axis=0
                        )

                    q_bufs = tuple(fold_front(q) for q in q_bufs)
                    eq_bufs = tuple(fold_front_vec(t) for t in eq_bufs)
                    krot_bufs = tuple(fold_front_vec(t) for t in krot_bufs)
                    return (state, q_bufs, eq_bufs, krot_bufs), (
                        evals2,
                        u_rnd,
                    )

                assert tr.absorb_idx == 0
                init = (
                    tr.state,
                    tuple(jnp.asarray(q) for q in q_evals),
                    tuple(jnp.asarray(t_) for t_ in eq_tabs),
                    tuple(jnp.asarray(t_) for t_ in krot_tabs),
                )
                (state, q_bufs, eq_bufs, krot_bufs), (evals_all, u_all) = (
                    jax.lax.scan(
                        sbody, init, jnp.arange(L, dtype=jnp.uint32), length=L
                    )
                )
                from .device_transcript import EF_D, RATE

                tr.state = state
                tr.absorb_idx = 0
                tr.sample_idx = RATE - EF_D

                scan_end = rnd0 + L - 1
                q_true = 1 << (n_stack - scan_end)
                q_out = tuple(q[:, :q_true] for q in q_bufs)
                eq_out = []
                krot_out = []
                for i, lht in enumerate(lhts):
                    n_lift = max(lht - l_skip, 0)
                    t_true = max(1 << max(n_lift - scan_end, 0), 1)
                    eq_out.append(eq_bufs[i][:t_true])
                    krot_out.append(krot_bufs[i][:t_true])
                return (
                    evals_all,
                    u_all,
                    q_out,
                    tuple(eq_out),
                    tuple(krot_out),
                )

            return body

        return factory

    round_blocks = []  # ("u", evals (R,2,4), u (R,4)) | ("s", ...)
    rnd = 1
    while rnd <= n_stack:
        if scan_lo <= rnd <= scan_hi:
            L = scan_hi - rnd + 1
            evals_all, u_all, q_evals, eq_list, krot_list = run_region(
                transcript,
                base_key + ("rd_scan", rnd, L),
                scan_factory(rnd, L),
                q_evals,
                eq_list,
                krot_list,
                lambda_pows,
            )
            round_blocks.append(("s", evals_all, u_all))
            rnd += L
        else:
            hi = rnd
            while hi + 1 <= n_stack and not (
                scan_lo <= hi + 1 <= scan_hi
            ):
                hi += 1
            (
                evals_all,
                u_all,
                q_evals,
                eq_list,
                krot_list,
                eq_ub,
            ) = run_region(
                transcript,
                base_key + ("rd_blk", rnd, hi),
                blk_factory(rnd, hi),
                q_evals,
                eq_list,
                krot_list,
                eq_ub,
                lambda_pows,
            )
            round_blocks.append(("u", evals_all, u_all))
            rnd = hi + 1

    # ---- stacking openings ------------------------------------------------
    def open_factory():
        def body(tr, q_evals):
            cols_dev = [q[:, 0] for q in q_evals]
            if cols_dev:
                tr.observe_slice(
                    jnp.concatenate([jnp.ravel(c) for c in cols_dev])
                )
            return tuple(cols_dev)

        return body

    cols_dev = run_region(
        transcript, base_key + ("rd_open",), open_factory, q_evals
    )

    # ---- proof assembly ---------------------------------------------------
    concrete = not isinstance(transcript.state, jax.core.Tracer)
    u_stack = jnp.concatenate(
        [u0[None]] + [blk[2] for blk in round_blocks], axis=0
    )  # (n_stack + 1, 4)

    payload = (s0_coeffs, round_blocks, cols_dev)
    if concrete:
        payload = jax.device_get(payload)
    s0_h, blocks_h, cols_h = payload

    sumcheck_round_polys: List[List[np.ndarray]] = []
    for kind, evals_all, _u in blocks_h:
        for j in range(evals_all.shape[0]):
            sumcheck_round_polys.append(
                [evals_all[j, 0], evals_all[j, 1]]
            )

    stacking_openings = []
    for host in cols_h:
        stacking_openings.append([host[c] for c in range(host.shape[0])])

    proof = StackingProof(
        univariate_round_coeffs=[s0_h[j] for j in range(s0_deg + 1)],
        sumcheck_round_polys=sumcheck_round_polys,
        stacking_openings=stacking_openings,
    )
    return proof, u_stack


from functools import lru_cache


@lru_cache(maxsize=None)
def _u_cube_jit(l_skip: int):
    """(n+1, 4) stacked u -> (l_skip + n, 4) u_cube: u0's bit powers then
    the tail (one program; see Coordinator)."""
    import jax as _jax

    @_jax.jit
    def f(u):
        parts = []
        cur = u[0]
        for _ in range(l_skip):
            parts.append(cur)
            cur = jf.ext_mul(cur, cur)
        return jnp.concatenate([jnp.stack(parts), u[1:]], axis=0)

    return f


def jax_slice(mat, col: int, row: int, length: int):
    return jax_dynamic(mat[col], row, length)


def jax_slice_ext(mat, col: int, row: int, length: int):
    return jax_dynamic(mat[col], row, length)


def jax_dynamic(vec, start: int, length: int):
    return vec[start : start + length]


def reduce_zx(q_grid, lam_dev, x_tab):
    """sum over (group, x) of lam[g] * x_tab[x] * q[g, x, z] -> (B_z, 4)."""
    w = jf.ext_mul(lam_dev[:, None, :], x_tab[None, :, :])  # (G, 2^n, 4)
    prod = jf.mul(q_grid[..., None], w[:, :, None, :])  # q base * EF
    return jf.ext_sum(jf.ext_sum(prod, axis=0), axis=0)


def interp_pairs(tab, x: int):
    """(..., 2m, 4) -> (..., m, 4) evaluated at integer X via pair interp."""
    shape = tab.shape
    pairs = tab.reshape(shape[:-2] + (shape[-2] // 2, 2, 4))
    t0, t1 = pairs[..., 0, :], pairs[..., 1, :]
    if x == 1:
        return t1
    return jf.ext_add(t0, jf.ext_scale(jf.ext_sub(t1, t0), jf.const(x)))
