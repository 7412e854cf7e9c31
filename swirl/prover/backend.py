"""JAX prover backend: device data types, transport, commitment, and the
proof coordinator.

This is the single JAX backend (runs on TPU for production and on the CPU
XLA backend for tests), playing the role of the reference's HAL
implementations (``crates/stark-backend/src/prover/hal.rs`` +
``cpu-backend``/``cuda-backend`` devices). The stage drivers mirror
``Coordinator::prove`` (``prover/mod.rs:104``): stacked commit, RAP
constraint proving (GKR + batch sumcheck), opening proving (stacked
reduction + WHIR).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..fields import jfield as jf
from ..keygen import MultiStarkProvingKey, StarkProvingKey
from ..params import SystemParams
from ..proof import Proof, TraceVData
from ..transcript import Transcript
from .logup_zerocheck import TraceProver, prove_zerocheck_and_logup
from .. import metrics
from .. import sanitize
from .stacked_pcs import StackedPcsData, stacked_commit
from .stacked_reduction import prove_stacked_opening_reduction
from .whir import prove_whir_opening


def to_device_matrix(trace: np.ndarray) -> jnp.ndarray:
    """(height, width) canonical host trace -> (width, height) Monty device."""
    trace = np.asarray(trace, dtype=np.uint64)
    return jnp.asarray(jf.const_arr(trace.T))


def from_device_matrix(mat: jnp.ndarray) -> np.ndarray:
    """(width, height) Monty device -> (height, width) canonical host."""
    return jf.to_host(mat).T


@dataclass
class CommittedTraceData:
    commitment: np.ndarray  # digest (8,)
    trace: jnp.ndarray  # device (w, h)
    data: StackedPcsData


@dataclass
class AirContext:
    cached_mains: List[CommittedTraceData]
    common_main: jnp.ndarray  # device (w, h)
    public_values: List[int]

    @property
    def height(self) -> int:
        return int(self.common_main.shape[1])


@dataclass
class ProvingContext:
    per_trace: List[Tuple[int, AirContext]]

    def sorted_for_stacking(self) -> "ProvingContext":
        order = sorted(
            range(len(self.per_trace)),
            key=lambda i: (-self.per_trace[i][1].height, self.per_trace[i][0]),
        )
        return ProvingContext([self.per_trace[i] for i in order])


@dataclass
class DeviceStarkProvingKey:
    air_name: str
    vk: object  # StarkVerifyingKey
    preprocessed_data: Optional[CommittedTraceData]


@dataclass
class DeviceMultiStarkProvingKey:
    params: SystemParams
    per_air: List[DeviceStarkProvingKey]
    max_constraint_degree: int
    vk_pre_hash: np.ndarray


@dataclass
class ProverConfig:
    """Memory-policy knobs, peer of the reference ``GpuProverConfig``
    (``cuda-backend/src/device.rs:26-47``): dropping the stacked matrix /
    RS codeword after commitment trades one recompute (stacking gather /
    RS NTT) for the two dominant HBM buffers."""

    cache_stacked_matrix: bool = True
    cache_rs_code_matrix: bool = True
    # chunk the round-0 coset-grid evaluation (8 segments) so the live grid
    # is 1/8 of the full one; None resolves to (log_blowup == 1) like the
    # reference default (device.rs:65)
    zerocheck_save_memory: Optional[bool] = None


# The univariate-skip domain is materialized per chunk (coset-DFT grids of
# 2^l_skip points x d cosets); past this bound the grids no longer fit the
# per-stage working-set model (peer of the reference GPU device's
# ``validate_gpu_l_skip``: ``cuda-backend/src/device.rs:59``, l_skip <= 9).
MAX_BACKEND_L_SKIP = 9


class JaxBackend:
    """Device operations for commitment + the two proving stages."""

    def __init__(self, params: SystemParams, config: Optional[ProverConfig] = None):
        if params.l_skip > MAX_BACKEND_L_SKIP:
            from .errors import ProverError

            raise ProverError(
                f"JaxBackend requires l_skip <= {MAX_BACKEND_L_SKIP}, "
                f"got {params.l_skip}"
            )
        self.params = params
        self.config = config or ProverConfig()
        if self.config.zerocheck_save_memory is None:
            self.config.zerocheck_save_memory = params.log_blowup == 1
        # hash-scheme hook (swirl/hash/scheme.py): None = device Poseidon2
        # Merkle path; the outer BN254 scheme installs a host tree builder
        self.tree_builder = None

    # -- commitment ----------------------------------------------------------

    def commit_traces(self, traces: List[jnp.ndarray]):
        p = self.params
        return stacked_commit(
            p.l_skip, p.n_stack, p.log_blowup, p.k_whir, traces,
            cache_stacked_matrix=self.config.cache_stacked_matrix,
            cache_rs_code_matrix=self.config.cache_rs_code_matrix,
            tree_builder=self.tree_builder,
        )

    def commit_single(self, trace_host: np.ndarray) -> CommittedTraceData:
        dev = to_device_matrix(trace_host)
        commit, data = self.commit_traces([dev])
        return CommittedTraceData(commitment=commit, trace=dev, data=data)

    # -- transport -----------------------------------------------------------

    def transport_pk_to_device(
        self, mpk: MultiStarkProvingKey
    ) -> DeviceMultiStarkProvingKey:
        per_air = []
        for pk in mpk.per_air:
            prep = pk.preprocessed_data  # set by keygen committer (ours)
            per_air.append(
                DeviceStarkProvingKey(
                    air_name=pk.air_name, vk=pk.vk, preprocessed_data=prep
                )
            )
        return DeviceMultiStarkProvingKey(
            params=mpk.params,
            per_air=per_air,
            max_constraint_degree=mpk.max_constraint_degree,
            vk_pre_hash=mpk.vk_pre_hash,
        )

    def keygen_committer(self):
        """Committer callable for MultiStarkKeygenBuilder."""

        def commit(trace_host: np.ndarray):
            ctd = self.commit_single(trace_host)
            return ctd.commitment, ctd, int(ctd.data.matrix.shape[0])

        return commit


class Coordinator:
    """Drives the full prove flow against the JAX backend."""

    def __init__(self, backend: JaxBackend, transcript: Transcript):
        self.backend = backend
        self.transcript = transcript

    def prove(
        self, mpk: DeviceMultiStarkProvingKey, unsorted_ctx: ProvingContext
    ) -> Proof:
        with metrics.span("stark_prove_excluding_trace"):
            return self._prove(mpk, unsorted_ctx)

    def _prove(
        self, mpk: DeviceMultiStarkProvingKey, unsorted_ctx: ProvingContext
    ) -> Proof:
        params = mpk.params
        transcript = self.transcript
        from .gkr import _scan_ok as _dev

        device_path = _dev(transcript)
        if not device_path:
            transcript.observe_commit(mpk.vk_pre_hash)

        ctx = unsorted_ctx.sorted_for_stacking()
        num_airs = len(mpk.per_air)

        common_traces = [tc.common_main for _, tc in ctx.per_trace]
        sanitize.check_traces(common_traces, "common_main")
        with metrics.span("prover.main_trace_commit"):
            common_commit, common_data = self.backend.commit_traces(common_traces)
        if sanitize.enabled() and common_data.matrix is not None:
            sanitize.check_canonical(common_data.matrix, "stacked_matrix")

        trace_vdata: List[Optional[TraceVData]] = [None] * num_airs
        public_values: List[List[int]] = [[] for _ in range(num_airs)]
        for air_id, tc in ctx.per_trace:
            trace_vdata[air_id] = TraceVData(
                log_height=tc.height.bit_length() - 1,
                cached_commitments=[cd.commitment for cd in tc.cached_mains],
            )
            public_values[air_id] = list(tc.public_values)

        if device_path:
            # device transcript: the whole preamble (vk pre-hash, common
            # commit, per-air vdata/public-value observes) as ONE region
            # program. The commit itself has no transcript events, so
            # absorbing the vk pre-hash after it keeps the event ORDER
            # bit-identical to the host path.
            from .regions import run_region

            vkph = tuple(int(x) for x in np.asarray(mpk.vk_pre_hash).ravel())
            pre_key = (
                "preamble",
                vkph,
                tuple(
                    (
                        air_id,
                        trace_vdata[air_id].log_height
                        if trace_vdata[air_id] is not None
                        else None,
                        len(trace_vdata[air_id].cached_commitments)
                        if trace_vdata[air_id] is not None
                        else 0,
                        mpk.per_air[air_id].vk.is_required,
                        mpk.per_air[air_id].preprocessed_data is not None,
                        tuple(int(p) for p in public_values[air_id]),
                    )
                    for air_id in range(num_airs)
                ),
            )

            def pre_factory():
                def body(tr, common_commit_a, prep_commits, cached_commits):
                    tr.observe_commit(np.asarray(mpk.vk_pre_hash))
                    tr.observe_commit(common_commit_a)
                    for air_id in range(num_airs):
                        pk = mpk.per_air[air_id]
                        vdata = trace_vdata[air_id]
                        if not pk.vk.is_required:
                            tr.observe(1 if vdata is not None else 0)
                        if vdata is not None:
                            if pk.preprocessed_data is not None:
                                tr.observe_commit(prep_commits[air_id])
                            else:
                                tr.observe(vdata.log_height)
                            for c in cached_commits[air_id]:
                                tr.observe_commit(c)
                        for pv in public_values[air_id]:
                            tr.observe(pv)
                    return ()

                return body

            run_region(
                transcript,
                pre_key,
                pre_factory,
                jnp.asarray(common_commit),
                {
                    air_id: jnp.asarray(
                        mpk.per_air[air_id].preprocessed_data.commitment
                    )
                    if mpk.per_air[air_id].preprocessed_data is not None
                    else None
                    for air_id in range(num_airs)
                },
                {
                    air_id: [
                        jnp.asarray(c)
                        for c in trace_vdata[air_id].cached_commitments
                    ]
                    if trace_vdata[air_id] is not None
                    else []
                    for air_id in range(num_airs)
                },
            )
        else:
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

        # stage: RAP constraints (GKR + batch sumcheck)
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
        with metrics.span("prove_rap_constraints"):
            gkr_proof, batch_proof, r = prove_zerocheck_and_logup(
                transcript,
                params,
                mpk.max_constraint_degree,
                traces,
                save_memory=bool(self.backend.config.zerocheck_save_memory),
            )

        # stage: openings (stacked reduction + WHIR)
        stacked_per_commit: List[StackedPcsData] = [common_data]
        need_rot_per_commit: List[List[bool]] = [
            [mpk.per_air[air_id].vk.params.need_rot for air_id, _ in ctx.per_trace]
        ]
        for air_id, tc in ctx.per_trace:
            pk = mpk.per_air[air_id]
            need_rot = pk.vk.params.need_rot
            if pk.preprocessed_data is not None:
                stacked_per_commit.append(pk.preprocessed_data.data)
                need_rot_per_commit.append([need_rot])
            for cd in tc.cached_mains:
                stacked_per_commit.append(cd.data)
                need_rot_per_commit.append([need_rot])

        with metrics.span("prove_stacked_reduction"):
            stacking_proof, u = prove_stacked_opening_reduction(
                transcript, params, stacked_per_commit, need_rot_per_commit, r
            )

        # u_cube: replace the prism coordinate u0 with its bit powers
        from .vmode import vm as _vm

        _ext = _vm().ext
        if not isinstance(u, list):
            # stacked device opening point from the region-jit reduction:
            # build u_cube as ONE jitted program (per-element squaring cost
            # one relay dispatch each in the eager prover)
            from .stacked_reduction import _u_cube_jit

            u_cube = _u_cube_jit(params.l_skip)(u)
        else:
            u_cube = []
            cur = u[0]
            for _ in range(params.l_skip):
                u_cube.append(cur)
                cur = _ext.emul(cur, cur)
            u_cube.extend(u[1:])

        with metrics.span("prove_whir"):
            whir_proof = prove_whir_opening(
                transcript, params, stacked_per_commit, u_cube,
                tree_builder=self.backend.tree_builder,
            )

        return Proof(
            common_main_commit=common_commit,
            trace_vdata=trace_vdata,
            public_values=public_values,
            gkr_proof=gkr_proof,
            batch_constraint_proof=batch_proof,
            stacking_proof=stacking_proof,
            whir_proof=whir_proof,
        )
