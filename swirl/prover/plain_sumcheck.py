"""Standalone "plain" sumcheck provers over a single multilinear /
prismalinear polynomial (cf. reference ``prover/sumcheck.rs:431,510``).

Useful on their own (and as conformance anchors for the batched machinery):
``sumcheck_multilinear`` proves sum_{x in H_n} f(x) given hypercube evals;
``sumcheck_prismalinear`` additionally applies Gruen's univariate skip for
the first l_skip variables.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ..fields import ext as hext
from ..fields import jfield as jf
from ..transcript import Transcript
from .. import poly as hpoly
from .errors import SumcheckError
from .sumcheck import barycentric_weights_host, fold_mle_vec, fold_ple


@dataclass
class SumcheckCubeProof:
    sum_claim: np.ndarray
    round_polys_eval: List[List[np.ndarray]]  # per round, evals at {1}
    eval_claim: np.ndarray


@dataclass
class SumcheckPrismProof:
    sum_claim: np.ndarray
    s0_coeffs: List[np.ndarray]
    round_polys_eval: List[List[np.ndarray]]
    eval_claim: np.ndarray


def sumcheck_multilinear(
    transcript: Transcript, evals
) -> Tuple[SumcheckCubeProof, List[np.ndarray]]:
    """evals: device (2^n, 4) EF hypercube evaluations."""
    n = int(evals.shape[0]).bit_length() - 1
    cur = evals
    sum_claim = jf.ext_to_host(jf.ext_sum(cur, axis=0))
    transcript.observe_ext(sum_claim)
    round_polys = []
    r = []
    for _ in range(n):
        # s(1) = sum over odd entries (linear poly; s(0) inferred by verifier)
        s1 = jf.ext_to_host(jf.ext_sum(cur[1::2], axis=0))
        transcript.observe_ext(s1)
        round_polys.append([s1])
        r_i = transcript.sample_ext()
        r.append(r_i)
        cur = fold_mle_vec(cur, jf.ext_const(r_i))
    eval_claim = jf.ext_to_host(cur[0])
    transcript.observe_ext(eval_claim)
    return SumcheckCubeProof(sum_claim, round_polys, eval_claim), r


def verify_sumcheck_multilinear(
    transcript: Transcript, proof: SumcheckCubeProof, n: int
) -> List[np.ndarray]:
    """Replays the transcript and checks round consistency; returns r."""
    transcript.observe_ext(proof.sum_claim)
    claim = proof.sum_claim
    r = []
    for rnd in range(n):
        (s1,) = proof.round_polys_eval[rnd]
        transcript.observe_ext(s1)
        r_i = transcript.sample_ext()
        r.append(r_i)
        s0 = hext.esub(claim, s1)
        claim = hpoly.interpolate_linear_at_01([s0, s1], r_i)
    if not hext.eeq(claim, proof.eval_claim):
        raise SumcheckError("sumcheck final claim mismatch")
    transcript.observe_ext(proof.eval_claim)
    return r


def sumcheck_prismalinear(
    transcript: Transcript, l_skip: int, evals
) -> Tuple[SumcheckPrismProof, List[np.ndarray]]:
    """evals: device (2^{l_skip+n}, 4) EF prism evaluations."""
    total = int(evals.shape[0]).bit_length() - 1
    n = total - l_skip
    sum_claim = jf.ext_to_host(jf.ext_sum(evals, axis=0))
    transcript.observe_ext(sum_claim)

    # univariate round 0: s0(Z) = sum_x f(Z, x); for a prismalinear f this is
    # degree < 2^l_skip, recoverable by iDFT of the per-z sums over x.
    per_z = jf.ext_sum(evals.reshape(-1, 1 << l_skip, 4), axis=0)  # (2^l, 4)
    s0_evals = jf.ext_to_host(per_z)
    s0_coeffs = hpoly.idft_ef(s0_evals)
    for c in s0_coeffs:
        transcript.observe_ext(c)
    r0 = transcript.sample_ext()
    r = [r0]
    weights = jf.const_arr(barycentric_weights_host(l_skip, r0))
    cur = fold_ple(evals.reshape(1, -1, 4), l_skip, False, weights)[0]
    round_polys = []
    for _ in range(n):
        s1 = jf.ext_to_host(jf.ext_sum(cur[1::2], axis=0))
        transcript.observe_ext(s1)
        round_polys.append([s1])
        r_i = transcript.sample_ext()
        r.append(r_i)
        cur = fold_mle_vec(cur, jf.ext_const(r_i))
    eval_claim = jf.ext_to_host(cur[0])
    transcript.observe_ext(eval_claim)
    return (
        SumcheckPrismProof(sum_claim, [c for c in s0_coeffs], round_polys, eval_claim),
        r,
    )


def verify_sumcheck_prismalinear(
    transcript: Transcript, proof: SumcheckPrismProof, l_skip: int, n: int
) -> List[np.ndarray]:
    transcript.observe_ext(proof.sum_claim)
    s0 = np.stack(proof.s0_coeffs)
    total = hpoly.sum_over_subgroup_from_coeffs(s0, l_skip)
    if not hext.eeq(total, proof.sum_claim):
        raise SumcheckError("prism sumcheck s0 sum mismatch")
    for c in proof.s0_coeffs:
        transcript.observe_ext(c)
    r0 = transcript.sample_ext()
    r = [r0]
    claim = hpoly.horner_eval(s0, r0)
    for rnd in range(n):
        (s1,) = proof.round_polys_eval[rnd]
        transcript.observe_ext(s1)
        r_i = transcript.sample_ext()
        r.append(r_i)
        s_at_0 = hext.esub(claim, s1)
        claim = hpoly.interpolate_linear_at_01([s_at_0, s1], r_i)
    if not hext.eeq(claim, proof.eval_claim):
        raise SumcheckError("prism sumcheck final claim mismatch")
    transcript.observe_ext(proof.eval_claim)
    return r
