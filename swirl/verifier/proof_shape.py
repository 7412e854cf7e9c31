"""Proof shape verification: recomputes the expected stacking layouts and
checks structural sizes before any indexing (cf. reference
``crates/stark-backend/src/verifier/proof_shape.rs``).

Returns the per-commitment stacking layouts (commit order: common main, then
per sorted trace its preprocessed and cached commitments).
"""

from __future__ import annotations

from typing import List

from ..keygen import MultiStarkVerifyingKey
from ..proof import Proof
from ..prover.stacked_pcs import StackedLayout


class ProofShapeError(Exception):
    pass


def _ensure(cond: bool, msg: str):
    if not cond:
        raise ProofShapeError(msg)


def _ensure_canonical(v, msg: str):
    import numpy as np

    from ..fields.babybear import P

    _ensure(getattr(v, "dtype", None) == np.uint64, msg + " (dtype)")
    _ensure(bool((np.asarray(v) < P).all()), msg + " (non-canonical limb)")


def _ensure_ef(v, msg: str):
    _ensure(getattr(v, "shape", None) == (4,), msg)
    _ensure_canonical(v, msg)


def _ensure_digest(v, msg: str):
    _ensure(getattr(v, "shape", None) == (8,), msg)
    _ensure_canonical(v, msg)


def verify_proof_shape(mvk: MultiStarkVerifyingKey, proof: Proof) -> List[StackedLayout]:
    params = mvk.params
    l_skip = params.l_skip
    num_airs = len(mvk.per_air)
    _ensure(len(proof.trace_vdata) == num_airs, "trace_vdata length mismatch")
    _ensure(len(proof.public_values) == num_airs, "public_values length mismatch")

    for air_id, avk in enumerate(mvk.per_air):
        vdata = proof.trace_vdata[air_id]
        pvs = proof.public_values[air_id]
        if vdata is None:
            _ensure(not avk.is_required, f"required AIR {air_id} missing trace")
            _ensure(
                len(pvs) == 0,
                f"AIR {air_id} has public values but no trace",
            )
        else:
            _ensure(
                len(vdata.cached_commitments) == len(avk.params.width.cached_mains),
                f"AIR {air_id} cached commitment count mismatch",
            )
            _ensure(
                0 <= vdata.log_height <= params.log_stacked_height,
                "trace log height out of range",
            )
            _ensure(
                len(pvs) == avk.params.num_public_values,
                f"AIR {air_id} public value count mismatch",
            )

    num_traces = sum(1 for v in proof.trace_vdata if v is not None)
    _ensure(num_traces > 0, "no traces")

    trace_id_to_air_id = sorted(
        (a for a in range(num_airs) if proof.trace_vdata[a] is not None),
        key=lambda a: (-proof.trace_vdata[a].log_height, a),
    )

    # layouts
    common_dims = []
    for a in trace_id_to_air_id:
        w = mvk.per_air[a].params.width.common_main
        common_dims.append((w, proof.trace_vdata[a].log_height))
    try:
        layouts = [StackedLayout.new(l_skip, params.log_stacked_height, common_dims)]
        for a in trace_id_to_air_id:
            avk = mvk.per_air[a]
            lh = proof.trace_vdata[a].log_height
            if avk.preprocessed_data is not None:
                pw = avk.params.width.preprocessed
                layouts.append(
                    StackedLayout.new(l_skip, params.log_stacked_height, [(pw, lh)])
                )
            for cw in avk.params.width.cached_mains:
                layouts.append(
                    StackedLayout.new(l_skip, params.log_stacked_height, [(cw, lh)])
                )
    except ValueError as e:
        raise ProofShapeError(str(e))
    total_stacked_width = sum(l.width for l in layouts)
    _ensure(
        total_stacked_width <= params.w_stack,
        "total stacked width exceeds w_stack",
    )

    # GKR proof shape (proof_shape.rs:381-414): the round count is derived
    # from the total lifted interaction count, and layer j's sumcheck has
    # exactly j round polys of 3 evaluations each.
    from ..params import calculate_n_logup

    total_interactions = sum(
        len(mvk.per_air[a].symbolic_constraints.interactions)
        << max(proof.trace_vdata[a].log_height, l_skip)
        for a in trace_id_to_air_id
    )
    n_logup = calculate_n_logup(l_skip, total_interactions)
    num_gkr_rounds = 0 if total_interactions == 0 else l_skip + n_logup
    gp = proof.gkr_proof
    _ensure(
        len(gp.claims_per_layer) == num_gkr_rounds,
        "gkr claims_per_layer count mismatch",
    )
    _ensure(
        len(gp.sumcheck_polys) == max(num_gkr_rounds - 1, 0),
        "gkr sumcheck layer count mismatch",
    )
    for i, layer in enumerate(gp.sumcheck_polys):
        _ensure(len(layer) == i + 1, f"gkr layer {i + 1} round count mismatch")
        for poly in layer:
            _ensure(len(poly) == 3, "gkr round poly must have 3 evaluations")
            for ev in poly:
                _ensure_ef(ev, "gkr round poly eval must be an EF value")
    _ensure_ef(gp.q0_claim, "gkr q0 claim must be an EF value")
    for cl in gp.claims_per_layer:
        for v in (cl.p_xi_0, cl.p_xi_1, cl.q_xi_0, cl.q_xi_1):
            _ensure_ef(v, "gkr layer claim must be an EF value")

    bp = proof.batch_constraint_proof
    _ensure(
        len(bp.numerator_term_per_air) == num_traces,
        "numerator term count mismatch",
    )
    _ensure(
        len(bp.denominator_term_per_air) == num_traces,
        "denominator term count mismatch",
    )
    n_max = max(
        max(proof.trace_vdata[a].log_height - l_skip for a in trace_id_to_air_id), 0
    )
    _ensure(
        len(bp.sumcheck_round_polys) == n_max, "sumcheck round count mismatch"
    )
    s_deg = params.max_constraint_degree + 1
    for evals in bp.sumcheck_round_polys:
        _ensure(len(evals) == s_deg, "round poly eval count mismatch")
        for ev in evals:
            _ensure_ef(ev, "batch round poly eval must be an EF value")
    _ensure(
        len(bp.univariate_round_coeffs) == s_deg * ((1 << l_skip) - 1) + 1,
        "univariate round coeff count mismatch",
    )
    for c in bp.univariate_round_coeffs:
        _ensure_ef(c, "univariate round coeff must be an EF value")
    for v in list(bp.numerator_term_per_air) + list(bp.denominator_term_per_air):
        _ensure_ef(v, "per-air logup term must be an EF value")
    _ensure(len(bp.column_openings) == num_traces, "column openings count")
    for t_idx, a in enumerate(trace_id_to_air_id):
        avk = mvk.per_air[a]
        parts = bp.column_openings[t_idx]
        num_parts = (
            1
            + (1 if avk.preprocessed_data is not None else 0)
            + len(avk.params.width.cached_mains)
        )
        _ensure(len(parts) == num_parts, "column opening part count")
        mult = 2 if avk.params.need_rot else 1
        widths = (
            [avk.params.width.common_main]
            + ([avk.params.width.preprocessed] if avk.preprocessed_data else [])
            + list(avk.params.width.cached_mains)
        )
        for part, w in zip(parts, widths):
            _ensure(len(part) == w * mult, "column opening width mismatch")
            for op in part:
                _ensure_ef(op, "column opening must be an EF value")

    sp = proof.stacking_proof
    _ensure(
        len(sp.univariate_round_coeffs) == 2 * ((1 << l_skip) - 1) + 1,
        "stacking univariate coeff count",
    )
    _ensure(
        len(sp.sumcheck_round_polys) == params.n_stack,
        "stacking sumcheck round count",
    )
    for ev in sp.sumcheck_round_polys:
        _ensure(len(ev) == 2, "stacking round poly eval count")
        for v in ev:
            _ensure_ef(v, "stacking round poly eval must be an EF value")
    for c in sp.univariate_round_coeffs:
        _ensure_ef(c, "stacking univariate coeff must be an EF value")
    _ensure(len(sp.stacking_openings) == len(layouts), "stacking openings count")
    for opens, layout in zip(sp.stacking_openings, layouts):
        _ensure(len(opens) == layout.width, "stacking opening width mismatch")
        for op in opens:
            _ensure_ef(op, "stacking opening must be an EF value")

    wp = proof.whir_proof
    num_rounds = params.num_whir_rounds()
    k = params.k_whir
    _ensure(
        len(wp.whir_sumcheck_polys) == num_rounds * k, "whir sumcheck count"
    )
    for poly in wp.whir_sumcheck_polys:
        _ensure(len(poly) == 2, "whir sumcheck poly eval count")
        for ev in poly:
            _ensure_ef(ev, "whir sumcheck eval must be an EF value")
    _ensure(len(wp.codeword_commits) == num_rounds - 1, "codeword commit count")
    for d in wp.codeword_commits:
        _ensure_digest(d, "codeword commit must be a digest")
    _ensure(len(wp.ood_values) == num_rounds - 1, "ood value count")
    for v in wp.ood_values:
        _ensure_ef(v, "ood value must be an EF value")
    _ensure(
        len(wp.folding_pow_witnesses) == num_rounds * k, "folding pow count"
    )
    _ensure(
        len(wp.query_phase_pow_witnesses) == num_rounds, "query pow count"
    )
    _ensure(
        len(wp.initial_round_opened_rows) == len(layouts),
        "initial opened rows commit count",
    )
    _ensure(
        len(wp.initial_round_merkle_proofs) == len(layouts),
        "initial merkle proofs commit count",
    )
    nq0 = params.whir.rounds[0].num_queries
    depth0 = params.log_stacked_height + params.log_blowup - k
    for c_idx, layout in enumerate(layouts):
        rows_per_q = wp.initial_round_opened_rows[c_idx]
        proofs_per_q = wp.initial_round_merkle_proofs[c_idx]
        _ensure(len(rows_per_q) == nq0, "initial opened row query count")
        _ensure(len(proofs_per_q) == nq0, "initial merkle proof query count")
        for rows in rows_per_q:
            _ensure(rows.shape == (1 << k, layout.width), "opened row shape")
        for pf in proofs_per_q:
            _ensure(len(pf) == depth0, "initial merkle proof depth")
            for sib in pf:
                _ensure_digest(sib, "initial merkle sibling must be a digest")
    _ensure(
        len(wp.codeword_opened_values) == num_rounds - 1,
        "codeword opened value rounds",
    )
    _ensure(
        len(wp.codeword_merkle_proofs) == num_rounds - 1,
        "codeword merkle proof rounds",
    )
    for rnd in range(1, num_rounds):
        nq = params.whir.rounds[rnd].num_queries
        depth = depth0 - rnd
        opened = wp.codeword_opened_values[rnd - 1]
        proofs = wp.codeword_merkle_proofs[rnd - 1]
        _ensure(len(opened) == nq, "codeword opened query count")
        _ensure(len(proofs) == nq, "codeword merkle proof query count")
        for vals in opened:
            _ensure(vals.shape == (1 << k, 4), "codeword opened value shape")
        for pf in proofs:
            _ensure(len(pf) == depth, "codeword merkle proof depth")
            for sib in pf:
                _ensure_digest(sib, "codeword merkle sibling must be a digest")
    _ensure(
        len(wp.final_poly) == 1 << params.log_final_poly_len(),
        "final poly length",
    )
    for c in wp.final_poly:
        _ensure_ef(c, "final poly coeff must be an EF value")
    _ensure_digest(proof.common_main_commit, "common main commit must be a digest")
    for air_id, vdata in enumerate(proof.trace_vdata):
        if vdata is not None:
            for d in vdata.cached_commitments:
                _ensure_digest(d, f"AIR {air_id} cached commitment must be a digest")
    return layouts
