"""Pipeline decomposition helpers: run the prover only up to the batch
constraint stage and verify that stage in isolation.

Peer of the reference ``test_utils/mod.rs:40`` (``prove_up_to_batch_
constraints``) used by the conformance suite's stage-isolation tests
(lib.rs:378-565): exercising GKR + the batched zerocheck sumcheck without
committing to the opening stages, so stage-level negatives (e.g. a tampered
q0 claim) hit the exact rejecting check.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..prover.backend import Coordinator, DeviceMultiStarkProvingKey, ProvingContext
from ..prover.logup_zerocheck import TraceProver, prove_zerocheck_and_logup
from ..transcript import Transcript


def prove_up_to_batch_constraints(
    backend,
    mpk: DeviceMultiStarkProvingKey,
    unsorted_ctx: ProvingContext,
    transcript: Transcript = None,
):
    """Commit + preamble + RAP constraint stage only.

    Returns (common_commit, trace_vdata, gkr_proof, batch_proof, r,
    post-stage transcript) — everything the stage-level verifier needs.
    """
    transcript = transcript or Transcript()
    params = mpk.params
    ctx = unsorted_ctx.sorted_for_stacking()
    num_airs = len(mpk.per_air)

    transcript.observe_commit(mpk.vk_pre_hash)
    common_traces = [tc.common_main for _, tc in ctx.per_trace]
    common_commit, _common_data = backend.commit_traces(common_traces)

    from ..proof import TraceVData

    trace_vdata = [None] * num_airs
    public_values: List[List[int]] = [[] for _ in range(num_airs)]
    for air_id, tc in ctx.per_trace:
        trace_vdata[air_id] = TraceVData(
            log_height=tc.height.bit_length() - 1,
            cached_commitments=[cd.commitment for cd in tc.cached_mains],
        )
        public_values[air_id] = list(tc.public_values)

    transcript.observe_commit(common_commit)
    for air_id in range(num_airs):
        pk = mpk.per_air[air_id]
        vdata = trace_vdata[air_id]
        if not pk.vk.is_required:
            transcript.observe(1 if vdata is not None else 0)
        if vdata is not None:
            if pk.preprocessed_data is not None:
                transcript.observe_commit(pk.preprocessed_data.commitment)
            else:
                transcript.observe(vdata.log_height)
            for c in vdata.cached_commitments:
                transcript.observe_commit(c)
        for pv in public_values[air_id]:
            transcript.observe(pv)

    traces = []
    for air_id, tc in ctx.per_trace:
        pk = mpk.per_air[air_id]
        vk = pk.vk
        traces.append(
            TraceProver(
                air_id=air_id,
                dag=vk.symbolic_constraints,
                needs_next=vk.params.need_rot,
                d_air=vk.max_constraint_degree,
                public_values=list(tc.public_values),
                height=tc.height,
                n=tc.height.bit_length() - 1 - params.l_skip,
                preprocessed=(
                    pk.preprocessed_data.trace
                    if pk.preprocessed_data is not None
                    else None
                ),
                cached=[cd.trace for cd in tc.cached_mains],
                common=tc.common_main,
            )
        )
    gkr_proof, batch_proof, r = prove_zerocheck_and_logup(
        transcript, params, mpk.max_constraint_degree, traces
    )
    return common_commit, trace_vdata, public_values, gkr_proof, batch_proof, r, transcript


def verify_up_to_batch_constraints(
    mvk,
    common_commit: np.ndarray,
    trace_vdata,
    public_values,
    gkr_proof,
    batch_proof,
    transcript: Transcript = None,
):
    """Stage-level verification of the RAP constraint proof (preamble replay
    + GKR verify + batch-constraint verify)."""
    from ..verifier.batch_constraints import verify_zerocheck_and_logup

    transcript = transcript or Transcript()
    params = mvk.params
    transcript.observe_commit(mvk.pre_hash)
    transcript.observe_commit(common_commit)
    num_airs = len(mvk.per_air)
    for air_id in range(num_airs):
        avk = mvk.per_air[air_id]
        vdata = trace_vdata[air_id]
        if not avk.is_required:
            transcript.observe(1 if vdata is not None else 0)
        if vdata is not None:
            if avk.preprocessed_data is not None:
                transcript.observe_commit(avk.preprocessed_data.commit)
            else:
                transcript.observe(vdata.log_height)
            for c in vdata.cached_commitments:
                transcript.observe_commit(c)
        for pv in public_values[air_id]:
            transcript.observe(pv)

    trace_id_to_air_id = sorted(
        (a for a in range(num_airs) if trace_vdata[a] is not None),
        key=lambda a: (-trace_vdata[a].log_height, a),
    )
    n_per_trace = [
        trace_vdata[a].log_height - params.l_skip for a in trace_id_to_air_id
    ]
    return verify_zerocheck_and_logup(
        transcript,
        params,
        mvk.per_air,
        public_values,
        gkr_proof,
        batch_proof,
        trace_id_to_air_id,
        n_per_trace,
    )
