"""StarkEngine: top-level keygen / prove / verify / run_test API.

Cf. reference ``crates/stark-backend/src/engine.rs``. The engine bundles the
system parameters, the JAX backend and a fresh transcript per operation.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .air import Air
from .keygen import MultiStarkKeygenBuilder, MultiStarkProvingKey, MultiStarkVerifyingKey
from .params import SystemParams
from .proof import Proof
from .prover.backend import (  # noqa: F401
    AirContext,
    Coordinator,
    DeviceMultiStarkProvingKey,
    JaxBackend,
    ProvingContext,
    to_device_matrix,
)
from .transcript import Transcript
from .verifier import verify as verify_proof
from .debug import check_constraints_and_interactions


class StarkEngine:
    """``hash_scheme`` selects the Fiat-Shamir/commitment hash (reference
    ``cuda-backend/src/hash_scheme.rs``): default BabyBear Poseidon2-16
    (inner proofs), or ``"bn254-outer"`` for the outer-recursion scheme
    (``stark-sdk/src/config/baby_bear_bn254_poseidon2.rs``). The outer
    scheme proves on the host path (eager device compute, host BN254
    Merkle/transcript) — outer traces are tiny by construction."""

    def __init__(self, params: SystemParams, prover_config=None, hash_scheme=None):
        from .hash.scheme import get_scheme

        self.params = params
        self.scheme = get_scheme(hash_scheme)
        self.backend = JaxBackend(params, prover_config)
        self.backend.tree_builder = self.scheme.tree_builder()

    def proving_memory_config(self):
        """HBM peak model for segmentation decisions (cf. reference
        ``StarkEngine::proving_memory_config``, ``engine.rs:68-78``)."""
        from .memory_metering import ProvingMemoryConfig

        cfg = self.backend.config
        return ProvingMemoryConfig.from_params(
            self.params,
            cache_stacked_matrix=cfg.cache_stacked_matrix,
            cache_rs_code_matrix=cfg.cache_rs_code_matrix,
            zerocheck_save_memory=bool(cfg.zerocheck_save_memory),
        )

    # -- keygen ----------------------------------------------------------------

    def keygen(
        self, airs: List[Air], required: Optional[List[bool]] = None
    ) -> Tuple[MultiStarkProvingKey, MultiStarkVerifyingKey]:
        builder = MultiStarkKeygenBuilder(self.params, self.backend.keygen_committer())
        if self.scheme.name != "babybear-poseidon2":
            builder.pre_hasher = self.scheme.pre_hash
        for i, air in enumerate(airs):
            if required and required[i]:
                builder.add_required_air(air)
            else:
                builder.add_air(air)
        pk = builder.generate_pk()
        return pk, pk.get_vk()

    # -- context construction ----------------------------------------------------

    def context_for(
        self,
        air_id: int,
        common_main: np.ndarray,
        public_values: Optional[List[int]] = None,
        cached_mains: Optional[List[np.ndarray]] = None,
    ) -> Tuple[int, AirContext]:
        cached = [
            self.backend.commit_single(np.asarray(t, dtype=np.uint64))
            for t in (cached_mains or [])
        ]
        return (
            air_id,
            AirContext(
                cached_mains=cached,
                common_main=to_device_matrix(np.asarray(common_main, np.uint64)),
                public_values=list(public_values or []),
            ),
        )

    # -- prove / verify -----------------------------------------------------------

    def transport_pk(self, pk: MultiStarkProvingKey) -> DeviceMultiStarkProvingKey:
        return self.backend.transport_pk_to_device(pk)

    def prove(
        self,
        dpk: DeviceMultiStarkProvingKey,
        ctx: ProvingContext,
        transcript: Optional[Transcript] = None,
    ) -> Proof:
        coordinator = Coordinator(
            self.backend, transcript or self.scheme.new_transcript()
        )
        return coordinator.prove(dpk, ctx)

    def verify(
        self,
        vk: MultiStarkVerifyingKey,
        proof: Proof,
        transcript: Optional[Transcript] = None,
    ) -> None:
        verify_proof(self.params, vk, proof, transcript, scheme=self.scheme)

    def debug(self, airs: List[Air], pk: MultiStarkProvingKey, ctx: ProvingContext):
        """Host-side row-by-row constraint + interaction balance checks."""
        check_constraints_and_interactions(airs, pk, ctx)

    def run_test(
        self,
        airs: List[Air],
        ctxs: List[Tuple[np.ndarray, List[int], List[np.ndarray]]],
        debug: bool = True,
    ):
        """ctxs: per AIR (common_main, public_values, cached_mains)."""
        pk, vk = self.keygen(airs)
        per_trace = [
            self.context_for(i, cm, pvs, cached)
            for i, (cm, pvs, cached) in enumerate(ctxs)
        ]
        ctx = ProvingContext(per_trace)
        if debug:
            self.debug(airs, pk, ctx)
        dpk = self.transport_pk(pk)
        proof = self.prove(dpk, ctx)
        self.verify(vk, proof)
        return vk, proof
