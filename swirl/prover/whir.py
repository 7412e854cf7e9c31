"""WHIR opening proof (device compute, host transcript).

Batches all committed stacked columns into one MLE with mu powers, then per
WHIR round: k sumcheck folds of sum_x f(x) * w(x), commit RS(g) (NTT +
Merkle over EF), out-of-domain evaluation, PoW + in-domain queries with
Merkle openings, and the gamma update of the weight polynomial. Cf.
reference ``crates/stark-backend/src/prover/whir.rs``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..fields import ext as hext
from ..fields import jfield as jf
from ..fields.babybear import P, U64, two_adic_generator
from ..params import SystemParams
from ..proof import WhirProof
from ..transcript import Transcript
from .errors import WhirProverError
from .merkle import build_merkle_tree, get_opened_rows, get_opened_rows_batch
from .ntt import mobius_transform, ntt, zeta_transform
from .stacked_pcs import StackedPcsData, rs_message
from .sumcheck import (
    eq_pows_base_batch_dev,
    eq_pows_hypercube_dev,
    fold_mle_vec,
    mobius_eq_hypercube_dev,
)
from .vmode import vm


@lru_cache(maxsize=None)
def _fold_round_jit(pow_bits: int):
    """ONE jitted program for a WHIR fold round: the two degree-2 round
    evaluations, their duplex absorb (== observe_ext x2), the folding PoW
    grind, the alpha squeeze, and both MLE folds. Bit-identical event
    schedule; the eager prover pays one relay dispatch per fold round
    instead of ~8. Entry cursor is always (absorb_idx=0) — every fold
    round follows a ``sample_ext``."""
    import jax

    from .device_transcript import (
        RATE,
        _grind_batch_jit,
        _permute_jit,
    )

    batch = 65536

    @jax.jit
    def f(state, f_evals, w_evals):
        evals = []
        for x in (1, 2):
            fx = _interp_vec(f_evals, x)
            wx = _interp_vec(w_evals, x)
            evals.append(jf.ext_sum(jf.ext_mul(fx, wx), axis=0))
        evals2 = jnp.stack(evals)  # (2, 4) Monty
        # absorb 8 felts from absorb_idx=0: one overwrite block + permute
        state = jax.lax.dynamic_update_slice(state, evals2.reshape(-1), (0,))
        state = _permute_jit()(state)
        # cursor: absorb_idx=0, sample_idx=RATE
        if pow_bits == 0:
            witness = jnp.uint32(0)
            si = RATE
        else:
            step = _grind_batch_jit(0, RATE, pow_bits, batch)

            def cond(c):
                return jnp.logical_not(c[1])

            def body(c):
                start, _, _ = c
                found, w = step(state, start)
                return (start + jnp.uint32(batch), found, w)

            _, _, witness = jax.lax.while_loop(
                cond, body, (jnp.uint32(0), jnp.bool_(False), jnp.uint32(0))
            )
            # check_witness: observe(witness) then one discarded sample_bits
            state = state.at[0].set(jf.from_u32(witness))
            state = _permute_jit()(state)
            si = RATE - 1
        alpha = jax.lax.slice(state, (si - 4,), (si,))[::-1]
        f_next = fold_mle_vec(f_evals, alpha)
        w_next = fold_mle_vec(w_evals, alpha)
        return state, f_next, w_next, evals2, witness

    return f


# sample_idx after a fold round: alpha consumed 4 of si (see above)
def _fold_round_exit_si(pow_bits: int) -> int:
    return (8 - 1 - 4) if pow_bits else (8 - 4)


def _pow_table(z, m: int, base_field: bool):
    """Device table T[S] = z^S for S < 2^m (via the eq-table doubling with
    factors (1, z^{2^i}))."""
    v = vm()
    out = v.ef_dev(v.ext.eone()).reshape(1, 4)
    cur = v.ext.from_base(z) if base_field else z
    for _ in range(m):
        c = v.ef_dev(cur)
        hi = jf.ext_mul(out, c)
        out = jnp.concatenate([out, hi], axis=0)
        cur = v.ext.emul(cur, cur)
    return out


def prove_whir_opening(
    transcript: Transcript,
    params: SystemParams,
    committed: Sequence[StackedPcsData],
    u: List[np.ndarray],
    tree_builder=None,
) -> WhirProof:
    """``tree_builder`` (hash-scheme hook): when set, ``(matrix_dev,
    rows_per_query, ext) -> (root, tree)`` replaces the device Poseidon2
    Merkle build for codeword commits (outer BN254 scheme)."""
    v = vm()
    whir = params.whir
    l_skip = params.l_skip
    log_blowup = params.log_blowup
    k = whir.k
    num_rounds = whir.num_whir_rounds()
    if not committed:
        raise WhirProverError("prove_whir_opening: no committed data")
    expected_h = int(committed[0].get_matrix().shape[1])
    for d in committed:
        h = int(d.get_matrix().shape[1])
        if h != expected_h:
            # reference: WhirProverError::TreeHeightMismatch (error.rs)
            raise WhirProverError(
                f"prove_whir_opening: tree height {h} != expected {expected_h}"
            )

    from .gkr import _scan_ok as _dev

    if _dev(transcript) and tree_builder is None:
        # device transcript (eager or segmented fused prover): region-jit
        # implementation with an identical event schedule. The BN254 outer
        # scheme's host tree_builder callback cannot live inside a traced
        # region, so it keeps the per-op path below.
        return _whir_device(transcript, params, committed, u)

    mu_pow_witness = transcript.grind(whir.mu_pow_bits)
    mu = transcript.sample_ext()
    total_width = sum(int(d.get_matrix().shape[0]) for d in committed)
    mu_pows = v.ext.epowers(mu, total_width)

    m = int(committed[0].get_matrix().shape[1]).bit_length() - 1
    log_rs = m + log_blowup

    # f = sum_j mu^j * hatF_j, hatF_j = zeta-transform of the RS message
    f_evals = None
    off = 0
    for d in committed:
        mat = d.get_matrix()
        w = int(mat.shape[0])
        msg = rs_message(l_skip, mat)
        hatf = zeta_transform(msg, m)  # (w, 2^m) base
        mu_dev = v.const_vec(mu_pows[off : off + w])  # (w, 4)
        contrib = jf.ext_sum(jf.mul(hatf[:, :, None], mu_dev[:, None, :]), axis=0)
        f_evals = contrib if f_evals is None else jf.ext_add(f_evals, contrib)
        off += w
    u_arr = u if not isinstance(u, list) else v.stack(u)
    w_evals = mobius_eq_hypercube_dev(u_arr)  # (2^m, 4)

    whir_sumcheck_polys: List[List[np.ndarray]] = []
    codeword_commits: List[np.ndarray] = []
    ood_values: List[np.ndarray] = []
    folding_pow_witnesses: List[int] = []
    query_phase_pow_witnesses: List[int] = []
    initial_opened_rows: List[List[np.ndarray]] = [[] for _ in committed]
    initial_merkle_proofs: List[List[List[np.ndarray]]] = [[] for _ in committed]
    codeword_opened_values: List[List[np.ndarray]] = []
    codeword_merkle_proofs: List[List[List[np.ndarray]]] = []
    final_poly = None
    rs_tree = None
    rs_codeword = None  # device (1, H, 4)

    cur_m = m
    for whir_round in range(num_rounds):
        is_last = whir_round == num_rounds - 1
        num_queries = whir.rounds[whir_round].num_queries

        for _ in range(k):
            if v.is_trace:
                fn = _fold_round_jit(whir.folding_pow_bits)
                state, f_evals, w_evals, evals2, wit = fn(
                    transcript.state, f_evals, w_evals
                )
                transcript.state = state
                transcript.absorb_idx = 0
                transcript.sample_idx = _fold_round_exit_si(
                    whir.folding_pow_bits
                )
                whir_sumcheck_polys.append(evals2)  # expanded at return
                folding_pow_witnesses.append(wit)
                continue
            # degree-2 sumcheck round over f*w
            evals = []
            for x in (1, 2):
                fx = _interp_vec(f_evals, x)
                wx = _interp_vec(w_evals, x)
                evals.append(
                    v.ef(jf.ext_sum(jf.ext_mul(fx, wx), axis=0))
                )
            for e in evals:
                transcript.observe_ext(e)
            whir_sumcheck_polys.append(evals)
            folding_pow_witnesses.append(transcript.grind(whir.folding_pow_bits))
            alpha = transcript.sample_ext()
            a_dev = v.ef_dev(alpha)
            f_evals = fold_mle_vec(f_evals, a_dev)
            w_evals = fold_mle_vec(w_evals, a_dev)
        cur_m -= k

        # g = current f; commit RS(g) unless final round
        g_coeffs = mobius_transform(f_evals[None], cur_m, ext=True)[0]  # (2^cur_m, 4)
        z0 = None
        if not is_last:
            padded = jnp.concatenate(
                [
                    g_coeffs,
                    jnp.zeros(((1 << (log_rs - 1)) - (1 << cur_m), 4), jnp.uint32),
                ],
                axis=0,
            )
            g_rs = ntt(padded[None], ext=True)  # (1, H, 4)
            if tree_builder is None:
                g_tree = build_merkle_tree(g_rs, 1 << k, ext=True)
                g_commit = v.f(g_tree.layers[-1][:, 0])
            else:
                g_commit, g_tree = tree_builder(g_rs, 1 << k, True)
            transcript.observe_commit(g_commit)
            codeword_commits.append(g_commit)

            z0 = transcript.sample_ext()
            # OOD value: MLE at (z0, z0^2, ...) == univariate eval at z0
            pow_tab = _pow_table(z0, cur_m, base_field=False)
            y0 = v.ef(
                jf.ext_sum(jf.ext_mul(g_coeffs, pow_tab), axis=0)
            )
            transcript.observe_ext(y0)
            ood_values.append(y0)
        else:
            fp = v.ef(g_coeffs)
            final_poly = [fp[i] for i in range(fp.shape[0])]
            if v.is_trace:
                # one flat absorb == the per-coefficient observe_ext
                # sequence bit-for-bit, but the full rate blocks collapse
                # into one lax.scan instead of ~2^(final_len-1) unrolled
                # permutes
                transcript.observe_slice(jnp.ravel(g_coeffs))
            else:
                for c in final_poly:
                    transcript.observe_ext(c)

        query_phase_pow_witnesses.append(transcript.grind(whir.query_phase_pow_bits))
        if v.is_trace:
            # ONE jitted program for all query-index squeezes (bit-identical
            # schedule); downstream consumers accept the (nq,) array
            indices = transcript.sample_bits_batch(log_rs - k, num_queries)
        else:
            indices = [
                transcript.sample_bits(log_rs - k) for _ in range(num_queries)
            ]
        if whir_round == 0:
            rs_mats = [d.get_rs_matrix() for d in committed]
            for com_idx, d in enumerate(committed):
                if v.is_trace and num_queries:
                    # batched: ONE gather per commitment for rows and ONE
                    # (nq, depth, 8) array for paths; the per-query/per-level
                    # materialization dominated the fused WHIR program size.
                    # _rebuild_proof expands back to per-query lists on host.
                    initial_opened_rows[com_idx] = get_opened_rows_batch(
                        rs_mats[com_idx], indices, 1 << k, ext=False
                    )
                    initial_merkle_proofs[com_idx] = (
                        d.tree.batch_query_proofs_arr(indices)
                    )
                    continue
                # NB: guard on num_queries, not `indices` — in trace mode
                # with num_queries == 0 `indices` is an empty jnp array and
                # array truthiness raises.
                proofs = (
                    d.tree.batch_query_proofs(indices) if num_queries else []
                )
                for qi, index in enumerate(indices):
                    rows = get_opened_rows(rs_mats[com_idx], index, 1 << k, ext=False)
                    initial_opened_rows[com_idx].append(rows)
                    initial_merkle_proofs[com_idx].append(proofs[qi])
        else:
            if v.is_trace and num_queries:
                rows = get_opened_rows_batch(rs_codeword, indices, 1 << k, ext=True)
                codeword_opened_values.append(rows[:, :, 0, :])  # (nq, 2^k, 4)
                codeword_merkle_proofs.append(
                    rs_tree.batch_query_proofs_arr(indices)
                )
            else:
                opened = []
                proofs = (
                    rs_tree.batch_query_proofs(indices) if num_queries else []
                )
                for qi, index in enumerate(indices):
                    rows = get_opened_rows(rs_codeword, index, 1 << k, ext=True)
                    opened.append(rows[:, 0, :])  # width 1 -> (2^k, 4)
                codeword_opened_values.append(opened)
                codeword_merkle_proofs.append(proofs)
        # one root-of-unity table + one gather for ALL queries (a per-query
        # pow_omega embedded a fresh 2^(log_rs-k) constant table per call,
        # bloating the fused program with megabytes of duplicate literals)
        zs = v.pow_omega_batch(log_rs - k, indices)

        if not is_last:
            rs_tree = g_tree
            rs_codeword = g_rs

        gamma = transcript.sample_ext()
        if not is_last:
            # w += gamma * eq(pow(z0)) + sum_i gamma^{2+i} * eq(pow(z_i)).
            # The query points z_i are base-field (powers of omega): build
            # their eq tables with ONE batched doubling ladder per chunk and
            # contract against the gamma powers — identical field values to
            # the per-query accumulation (modular addition is associative),
            # ~Q x fewer traced ops.
            upd = jf.ext_mul(
                v.ef_dev(gamma),
                eq_pows_hypercube_dev(z0, cur_m, base_field=False),
            )
            gamma_pows = v.ext.epowers(gamma, num_queries + 2)
            if num_queries:
                if v.is_trace:
                    zs_vec = jnp.asarray(zs)
                else:
                    zs_vec = jnp.asarray(
                        jf.const_arr(np.asarray(zs, dtype=np.uint64))
                    )
                gp_dev = v.const_vec(
                    v.stack([gamma_pows[i + 2] for i in range(num_queries)])
                )
                chunk = 32  # bounds the (chunk, 2^m, 4) contraction buffer
                for base in range(0, num_queries, chunk):
                    zc = zs_vec[base : base + chunk]
                    gc = gp_dev[base : base + chunk]
                    tab = eq_pows_base_batch_dev(zc, cur_m)  # (q, 2^m)
                    upd = jf.ext_add(
                        upd,
                        jf.ext_sum(
                            jf.mul(tab[:, :, None], gc[:, None, :]), axis=0
                        ),
                    )
            w_evals = jf.ext_add(w_evals, upd)
        log_rs -= 1

    if v.is_trace and whir_sumcheck_polys:
        # fold-round evals were collected as raw (2, 4) stacks; expand to
        # the per-eval proof layout from ONE batched fetch when concrete
        import jax

        concrete = not any(
            isinstance(e, jax.core.Tracer) for e in whir_sumcheck_polys
        )
        evs = (
            jax.device_get(whir_sumcheck_polys)
            if concrete
            else whir_sumcheck_polys
        )
        whir_sumcheck_polys = [[v.ef(e[0]), v.ef(e[1])] for e in evs]

    return WhirProof(
        mu_pow_witness=mu_pow_witness,
        whir_sumcheck_polys=whir_sumcheck_polys,
        codeword_commits=codeword_commits,
        ood_values=ood_values,
        folding_pow_witnesses=folding_pow_witnesses,
        query_phase_pow_witnesses=query_phase_pow_witnesses,
        initial_round_opened_rows=initial_opened_rows,
        initial_round_merkle_proofs=initial_merkle_proofs,
        codeword_opened_values=codeword_opened_values,
        codeword_merkle_proofs=codeword_merkle_proofs,
        final_poly=final_poly,
    )


def _interp_vec(vec, x: int):
    """(2m, 4) -> (m, 4) at integer X (stride-2: see gkr._pair_split)."""
    t0, t1 = vec[0::2], vec[1::2]
    if x == 1:
        return t1
    return jf.ext_add(t0, jf.ext_scale(jf.ext_sub(t1, t0), jf.const(x)))


def _interp_vec_br(vec, x: int):
    """Bit-reversed-layout variant: logical pairs are CONTIGUOUS halves
    (j, j + m) — 8x faster than the stride-2 form on the v5e (see
    gkr._pair_split)."""
    h = int(vec.shape[0]) // 2
    t0, t1 = vec[:h], vec[h:]
    if x == 1:
        return t1
    return jf.ext_add(t0, jf.ext_scale(jf.ext_sub(t1, t0), jf.const(x)))


def _fold_mle_vec_br(vec, r_dev):
    """Bit-reversed-layout MLE fold: (2m, 4) -> (m, 4) over halves."""
    h = int(vec.shape[0]) // 2
    if h < 1:
        return vec
    t0, t1 = vec[:h], vec[h:]
    return jf.ext_add(t0, jf.ext_mul(jf.ext_sub(t1, t0), r_dev))


def _whir_device(
    transcript, params: SystemParams, committed: Sequence[StackedPcsData], u
) -> WhirProof:
    """Device-transcript WHIR opening: the same protocol flow as the host
    body of :func:`prove_whir_opening`, restructured into region-jit
    programs (:mod:`swirl.prover.regions`):

    - ``w_in``: mu grind + squeeze, the mu-batched MLE build (zeta
      transforms), and the Möbius eq weight table;
    - ``w_rnd``: ONE program per WHIR round — k fold sub-rounds (evals,
      absorbs, folding PoW grinds, alpha squeezes, MLE folds), the RS
      commit (NTT + Poseidon2 Merkle), OOD evaluation, query-phase PoW +
      batched index squeezes, batched row/path openings, and the gamma
      weight update.

    The eager fused prover pays one relay dispatch per region; the
    segmented prover inlines the same bodies. Byte-identity with the host
    path is CI-pinned (tests/test_fused.py / test_whir_pcs.py)."""
    import jax

    from .merkle import MerkleTree
    from .regions import run_region
    from .vmode import vm as _vm

    v = _vm()
    whir = params.whir
    l_skip = params.l_skip
    log_blowup = params.log_blowup
    k = whir.k
    num_rounds = whir.num_whir_rounds()

    mats = [d.get_matrix() for d in committed]
    widths = tuple(int(mat.shape[0]) for mat in mats)
    total_width = sum(widths)
    m = int(mats[0].shape[1]).bit_length() - 1
    log_rs0 = m + log_blowup
    u_arr = u if not isinstance(u, list) else v.stack(u)

    base_key = (
        "whir",
        l_skip,
        log_blowup,
        k,
        m,
        widths,
        int(whir.mu_pow_bits),
        int(whir.folding_pow_bits),
        int(whir.query_phase_pow_bits),
        tuple(rd.num_queries for rd in whir.rounds),
        int(u_arr.shape[0]),
    )

    # ---- region w_in: mu batch + weight table -----------------------------
    def w_in_factory():
        def body(tr, mats, u_a):
            vv = _vm()
            wit = tr.grind(whir.mu_pow_bits)
            mu = tr.sample_ext()
            mu_pows = vv.ext.epowers(mu, total_width)
            f_evals = None
            off = 0
            for mat in mats:
                w = int(mat.shape[0])
                msg = rs_message(l_skip, mat)
                hatf = zeta_transform(msg, m)  # (w, 2^m) base
                mu_dev = vv.const_vec(
                    vv.stack([mu_pows[off + i] for i in range(w)])
                )
                contrib = jf.ext_sum(
                    jf.mul(hatf[:, :, None], mu_dev[:, None, :]), axis=0
                )
                f_evals = (
                    contrib
                    if f_evals is None
                    else jf.ext_add(f_evals, contrib)
                )
                off += w
            # bulk MLEs live in BIT-REVERSED order inside the region path
            # (contiguous-half folds; see gkr._pair_split): permute f once,
            # build the Mobius weight table bit-reversed directly
            from .sumcheck import bitrev_permute

            f_evals = bitrev_permute(f_evals)
            w_evals = mobius_eq_hypercube_dev(u_a, bitrev=True)
            return wit, f_evals, w_evals

        return body

    mu_pow_witness, f_evals, w_evals = run_region(
        transcript, base_key + ("w_in",), w_in_factory, mats, u_arr
    )

    # ---- per-round regions ------------------------------------------------
    rpqs = tuple(d.tree.rows_per_query for d in committed)

    def round_factory(whir_round, cur_m_in, log_rs):
        is_last = whir_round == num_rounds - 1
        num_queries = whir.rounds[whir_round].num_queries
        cur_m = cur_m_in - k

        def factory():
            def body(tr, f_evals, w_evals, qsrc):
                vv = _vm()
                fold_evals = []
                fold_wits = []
                from .sumcheck import bitrev_permute

                for _ in range(k):
                    evals = []
                    for x in (1, 2):
                        fx = _interp_vec_br(f_evals, x)
                        wx = _interp_vec_br(w_evals, x)
                        evals.append(
                            jf.ext_sum(jf.ext_mul(fx, wx), axis=0)
                        )
                    evals2 = jnp.stack(evals)
                    tr.observe_slice(evals2.reshape(-1))
                    fold_wits.append(tr.grind(whir.folding_pow_bits))
                    alpha = tr.sample_ext()
                    f_evals = _fold_mle_vec_br(f_evals, alpha)
                    w_evals = _fold_mle_vec_br(w_evals, alpha)
                    fold_evals.append(evals2)

                # the Mobius transform consumes NATURAL order: un-permute
                # the folded f (bit reversal is an involution)
                g_coeffs = mobius_transform(
                    bitrev_permute(f_evals)[None], cur_m, ext=True
                )[0]
                commit_root = None
                y0 = None
                z0 = None
                g_rs = None
                g_layers = None
                final_poly_arr = None
                if not is_last:
                    padded = jnp.concatenate(
                        [
                            g_coeffs,
                            jnp.zeros(
                                (
                                    (1 << (log_rs - 1)) - (1 << cur_m),
                                    4,
                                ),
                                jnp.uint32,
                            ),
                        ],
                        axis=0,
                    )
                    g_rs = ntt(padded[None], ext=True)  # (1, H, 4)
                    g_tree = build_merkle_tree(g_rs, 1 << k, ext=True)
                    g_layers = tuple(g_tree.layers)
                    commit_root = g_layers[-1][:, 0]
                    tr.observe_commit(commit_root)
                    z0 = tr.sample_ext()
                    pow_tab = _pow_table(z0, cur_m, base_field=False)
                    y0 = jf.ext_sum(jf.ext_mul(g_coeffs, pow_tab), axis=0)
                    tr.observe_ext(y0)
                else:
                    final_poly_arr = g_coeffs
                    tr.observe_slice(jnp.ravel(g_coeffs))

                qp_wit = tr.grind(whir.query_phase_pow_bits)
                indices = tr.sample_bits_batch(log_rs - k, num_queries)

                opened = []
                proofs = []
                if whir_round == 0:
                    src_mats, src_layers = qsrc
                    for ci in range(len(src_mats)):
                        if num_queries:
                            opened.append(
                                get_opened_rows_batch(
                                    src_mats[ci], indices, 1 << k, ext=False
                                )
                            )
                            tree = MerkleTree(
                                list(src_layers[ci]), rpqs[ci]
                            )
                            proofs.append(
                                tree.batch_query_proofs_arr(indices)
                            )
                        else:
                            opened.append([])
                            proofs.append([])
                else:
                    src_codeword, src_layers = qsrc
                    if num_queries:
                        rows = get_opened_rows_batch(
                            src_codeword, indices, 1 << k, ext=True
                        )
                        opened.append(rows[:, :, 0, :])  # (nq, 2^k, 4)
                        tree = MerkleTree(list(src_layers), 1 << k)
                        proofs.append(
                            tree.batch_query_proofs_arr(indices)
                        )
                    else:
                        opened.append([])
                        proofs.append([])

                zs = vv.pow_omega_batch(log_rs - k, indices)
                gamma = tr.sample_ext()
                if not is_last:
                    upd = jf.ext_mul(
                        gamma,
                        eq_pows_hypercube_dev(
                            z0, cur_m, base_field=False, bitrev=True
                        ),
                    )
                    gamma_pows = vv.ext.epowers(gamma, num_queries + 2)
                    if num_queries:
                        zs_vec = jnp.asarray(zs)
                        gp_dev = vv.const_vec(
                            vv.stack(
                                [
                                    gamma_pows[i + 2]
                                    for i in range(num_queries)
                                ]
                            )
                        )
                        chunk = 32  # bounds the (chunk, 2^m, 4) buffer
                        for base in range(0, num_queries, chunk):
                            zc = zs_vec[base : base + chunk]
                            gc = gp_dev[base : base + chunk]
                            tab = eq_pows_base_batch_dev(
                                zc, cur_m, bitrev=True
                            )
                            upd = jf.ext_add(
                                upd,
                                jf.ext_sum(
                                    jf.mul(
                                        tab[:, :, None], gc[:, None, :]
                                    ),
                                    axis=0,
                                ),
                            )
                    w_evals = jf.ext_add(w_evals, upd)
                return (
                    jnp.stack(fold_evals),  # (k, 2, 4)
                    jnp.stack(fold_wits),  # (k,)
                    commit_root,
                    y0,
                    qp_wit,
                    tuple(opened),
                    tuple(proofs),
                    final_poly_arr,
                    f_evals,
                    w_evals,
                    g_rs,
                    g_layers,
                )

            return body

        return factory

    codeword_commits: List = []
    ood_values: List = []
    folding_wits_blocks: List = []
    query_phase_pow_witnesses: List = []
    initial_opened_rows: List = [None] * len(committed)
    initial_merkle_proofs: List = [None] * len(committed)
    codeword_opened_values: List = []
    codeword_merkle_proofs: List = []
    final_poly_arr = None

    cur_m = m
    log_rs = log_rs0
    rs_codeword = None
    rs_layers = None
    for whir_round in range(num_rounds):
        if whir_round == 0:
            qsrc = (
                [d.get_rs_matrix() for d in committed],
                [tuple(d.tree.layers) for d in committed],
            )
        else:
            qsrc = (rs_codeword, rs_layers)
        (
            fold_evals,
            fold_wits,
            commit_root,
            y0,
            qp_wit,
            opened,
            proofs,
            fp_arr,
            f_evals,
            w_evals,
            g_rs,
            g_layers,
        ) = run_region(
            transcript,
            base_key + ("w_rnd", whir_round),
            round_factory(whir_round, cur_m, log_rs),
            f_evals,
            w_evals,
            qsrc,
        )
        folding_wits_blocks.append((fold_evals, fold_wits))
        query_phase_pow_witnesses.append(qp_wit)
        if whir_round == 0:
            for ci in range(len(committed)):
                initial_opened_rows[ci] = opened[ci]
                initial_merkle_proofs[ci] = proofs[ci]
        else:
            codeword_opened_values.append(opened[0])
            codeword_merkle_proofs.append(proofs[0])
        if commit_root is not None:
            codeword_commits.append(commit_root)
            ood_values.append(y0)
            rs_codeword = g_rs
            rs_layers = g_layers
        if fp_arr is not None:
            final_poly_arr = fp_arr
        cur_m -= k
        log_rs -= 1

    # ---- proof assembly (ONE batched fetch when concrete) -----------------
    concrete = not isinstance(transcript.state, jax.core.Tracer)
    payload = (
        folding_wits_blocks,
        codeword_commits,
        ood_values,
        query_phase_pow_witnesses,
        final_poly_arr,
    )
    if concrete:
        payload = jax.device_get(payload)
    blocks_h, commits_h, oods_h, qp_h, fp_h = payload

    whir_sumcheck_polys: List = []
    folding_pow_witnesses: List = []
    for fold_evals, fold_wits in blocks_h:
        for j in range(fold_evals.shape[0]):
            whir_sumcheck_polys.append(
                [fold_evals[j, 0], fold_evals[j, 1]]
            )
            folding_pow_witnesses.append(fold_wits[j])

    final_poly = [fp_h[i] for i in range(fp_h.shape[0])]

    return WhirProof(
        mu_pow_witness=mu_pow_witness,
        whir_sumcheck_polys=whir_sumcheck_polys,
        codeword_commits=commits_h,
        ood_values=oods_h,
        folding_pow_witnesses=folding_pow_witnesses,
        query_phase_pow_witnesses=qp_h,
        initial_round_opened_rows=initial_opened_rows,
        initial_round_merkle_proofs=initial_merkle_proofs,
        codeword_opened_values=codeword_opened_values,
        codeword_merkle_proofs=codeword_merkle_proofs,
        final_poly=final_poly,
    )
