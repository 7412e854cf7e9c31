"""Fused single-program prover: the ENTIRE prove is one XLA computation.

The host-path prover dispatches one device program per array step and syncs
the Fiat-Shamir transcript on host between rounds — hundreds of round trips
per proof. On TPU the idiomatic shape is the opposite: trace once, compile
once, run the whole proof as a single program. This driver does exactly
that:

- value mode switched to trace (``vmode.trace_mode``): the protocol-small
  math runs as Monty-form tracers via ``fields.text`` / ``swirl.tpoly``;
- the transcript is the device sponge (``DeviceTranscript``) — bit-exact
  with the host sponge, including PoW grinding (a ``while_loop`` on
  device);
- the unchanged ``Coordinator._prove`` drives the same stage code as the
  host path, so the resulting proof is byte-identical to a host-path proof
  (asserted by the conformance tests).

The reference's CUDA backend keeps a device-resident sponge mirror and
still syncs claims to the host every round (``cuda-backend/src/sponge.rs``);
this is the TPU-native end state of that idea — there is nothing left to
sync.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import List

import numpy as np
import jax

from ..fields.babybear import P
from ..proof import (
    BatchConstraintProof,
    GkrLayerClaims,
    GkrProof,
    Proof,
    StackingProof,
    TraceVData,
    WhirProof,
)
from . import vmode
from .device_transcript import DeviceTranscript

_RINV = pow(1 << 32, P - 2, P)


def _canon(x) -> np.ndarray:
    """Monty uint32 array -> canonical uint64 numpy."""
    return (np.asarray(x, dtype=np.uint64) * np.uint64(_RINV)) % np.uint64(P)


def _wit(x) -> int:
    """Canonical uint32 scalar -> int."""
    return int(np.asarray(x))


def _to_plain(x):
    if dataclasses.is_dataclass(x):
        return {
            f.name: _to_plain(getattr(x, f.name)) for f in dataclasses.fields(x)
        }
    if isinstance(x, (list, tuple)):
        return [_to_plain(i) for i in x]
    return x


def _rebuild_proof(plain, trace_vdata, public_values) -> Proof:
    g = plain["gkr_proof"]
    gkr = GkrProof(
        logup_pow_witness=_wit(g["logup_pow_witness"]),
        q0_claim=_canon(g["q0_claim"]),
        claims_per_layer=[
            GkrLayerClaims(**{k: _canon(cl[k]) for k in cl})
            for cl in g["claims_per_layer"]
        ],
        sumcheck_polys=[
            [[_canon(e) for e in rnd] for rnd in layer]
            for layer in g["sumcheck_polys"]
        ],
    )
    b = plain["batch_constraint_proof"]
    batch = BatchConstraintProof(
        numerator_term_per_air=[_canon(x) for x in b["numerator_term_per_air"]],
        denominator_term_per_air=[
            _canon(x) for x in b["denominator_term_per_air"]
        ],
        univariate_round_coeffs=[_canon(x) for x in b["univariate_round_coeffs"]],
        sumcheck_round_polys=[
            [_canon(x) for x in rnd] for rnd in b["sumcheck_round_polys"]
        ],
        column_openings=[
            [[_canon(x) for x in part] for part in air]
            for air in b["column_openings"]
        ],
    )
    s = plain["stacking_proof"]
    stacking = StackingProof(
        univariate_round_coeffs=[_canon(x) for x in s["univariate_round_coeffs"]],
        sumcheck_round_polys=[
            [_canon(x) for x in rnd] for rnd in s["sumcheck_round_polys"]
        ],
        stacking_openings=[
            [_canon(x) for x in com] for com in s["stacking_openings"]
        ],
    )
    w = plain["whir_proof"]
    whir = WhirProof(
        mu_pow_witness=_wit(w["mu_pow_witness"]),
        whir_sumcheck_polys=[
            [_canon(x) for x in rnd] for rnd in w["whir_sumcheck_polys"]
        ],
        codeword_commits=[_canon(x) for x in w["codeword_commits"]],
        ood_values=[_canon(x) for x in w["ood_values"]],
        folding_pow_witnesses=[_wit(x) for x in w["folding_pow_witnesses"]],
        query_phase_pow_witnesses=[
            _wit(x) for x in w["query_phase_pow_witnesses"]
        ],
        initial_round_opened_rows=[
            [_canon(rows) for rows in com]
            for com in w["initial_round_opened_rows"]
        ],
        initial_round_merkle_proofs=[
            [[_canon(d) for d in path] for path in com]
            for com in w["initial_round_merkle_proofs"]
        ],
        codeword_opened_values=[
            [_canon(x) for x in rnd] for rnd in w["codeword_opened_values"]
        ],
        codeword_merkle_proofs=[
            [[_canon(d) for d in path] for path in rnd]
            for rnd in w["codeword_merkle_proofs"]
        ],
        final_poly=[_canon(x) for x in w["final_poly"]],
    )
    return Proof(
        common_main_commit=_canon(plain["common_main_commit"]),
        trace_vdata=trace_vdata,
        public_values=public_values,
        gkr_proof=gkr,
        batch_constraint_proof=batch,
        stacking_proof=stacking,
        whir_proof=whir,
    )


def enable_compile_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a repo-local dir so the
    fused program compiles once per (shape, params) per machine.

    Default location: ``$SWIRL_JAX_CACHE``, else ``.jax_cache`` next to the
    package (derived from ``__file__``, not a hardcoded checkout path)."""
    import hashlib
    import os
    import platform

    if os.environ.get("SWIRL_JAX_CACHE") == "0":
        return
    if path is None:
        base = os.environ.get("SWIRL_JAX_CACHE") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
        # Scope the cache to this machine's CPU features: XLA:CPU AOT
        # artifacts baked for another host's ISA can SIGILL/segfault when
        # loaded (JAX's cache key does not include host CPU features).
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((l for l in f if l.startswith("flags")), "")
        except OSError:
            flags = ""
        tag = hashlib.sha1(
            (platform.machine() + flags).encode()
        ).hexdigest()[:12]
        path = os.path.join(base, tag)
    if jax.config.jax_compilation_cache_dir is None:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache EVERYTHING: on a remote-compile setup (axon) even sub-second
        # modules pay a round trip to the compile helper
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_AOT_CACHE_VERSION = 2


@lru_cache(maxsize=1)
def _package_digest() -> str:
    """Content hash of every swirl/**/*.py source file.

    A persisted AOT executable must be the product of THIS code: keying the
    bundle by source content means a stale executable from an older prover
    (whose proof bytes could differ from the current host path) can never
    load silently. Mirrors what the XLA persistent compile cache gets for
    free by hashing the HLO."""
    import hashlib
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                h.update(os.path.relpath(full, root).encode())
                with open(full, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()


def _aot_path(mpk, ctx) -> str | None:
    """On-disk path for this (code, device, vk, context) segmented-stage
    executable bundle; None when AOT persistence is unavailable/disabled.

    The XLA persistent compile cache only skips the *compile*; every fresh
    process still pays tracing + lowering + cache deserialization (minutes
    at production heights). Persisting the four compiled stage executables
    skips all three: a warm prove is load + run."""
    import hashlib
    import os

    if os.environ.get("SWIRL_AOT_CACHE", "1") == "0":
        return None
    base = jax.config.jax_compilation_cache_dir
    if base is None:
        return None
    try:
        dev = jax.devices()[0]
        if dev.platform == "axon" and os.environ.get("SWIRL_AOT_CACHE") != "1":
            # Tunneled dev chip: explicit Compiled executables dispatch ~30x
            # slower than the jit wrappers over the relay, and serialize()
            # round-trips the full raw executable (GBs) through the tunnel.
            # The persistent XLA compile cache is the right warm path there.
            return None
        ident = (
            _AOT_CACHE_VERSION,
            jax.__version__,
            dev.platform,
            getattr(dev, "device_kind", ""),
            _package_digest(),
            tuple(int(v) for v in np.asarray(mpk.vk_pre_hash).ravel()),
            _ctx_cache_key("seg", ctx),
        )
    except Exception:
        return None
    digest = hashlib.sha256(repr(ident).encode()).hexdigest()[:32]
    return os.path.join(base, "aot", f"seg-{digest}.pkl")


def _load_aot_segments(path: str):
    """((s1, s2a, s2b, s3, s4) loaded executables, meta) bundle, or None."""
    import pickle
    import sys

    try:
        with open(path, "rb") as f:
            stage_payloads, meta = pickle.load(f)
        from jax.experimental import serialize_executable as se

        # the segmented stages are single-device programs; without an
        # explicit device list, deserialize_and_load targets ALL
        # addressable devices (8 on the virtual CPU test mesh) and
        # execution fails on a shard-count mismatch
        devs = jax.devices()[:1]
        stages = tuple(
            se.deserialize_and_load(
                blob, in_tree, out_tree, execution_devices=devs
            )
            for blob, in_tree, out_tree in stage_payloads
        )
        return stages, meta
    except FileNotFoundError:
        return None
    except Exception as e:  # corrupt or incompatible bundle: recompile
        print(
            f"swirl: AOT bundle load failed ({type(e).__name__}: {e}); "
            "recompiling",
            file=sys.stderr,
        )
        return None


def _save_aot_segments(path: str, compiled_stages, meta) -> None:
    import os
    import pickle
    import sys

    try:
        from jax.experimental import serialize_executable as se

        payload = [se.serialize(c) for c in compiled_stages]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, meta), f)
        os.replace(tmp, path)
    except Exception as e:
        print(
            f"swirl: AOT bundle save failed ({type(e).__name__}: {e})",
            file=sys.stderr,
        )


def _ctx_cache_key(tag, ctx) -> tuple:
    """Cache key for the per-mpk fused/segmented program cache.

    The traced function closes over each trace's public values and
    cached-main trace data as trace-time constants, so those must be part
    of the key — two contexts with identical shapes but different public
    values or cached commitments are different programs (a stale closure
    would absorb the old values into the transcript while the assembled
    proof carries the new ones)."""
    parts = [tag]
    for air_id, tc in ctx.per_trace:
        cached_ids = tuple(
            tuple(int(v) for v in np.asarray(cd.commitment).ravel())
            for cd in tc.cached_mains
        )
        parts.append(
            (
                air_id,
                tc.height,
                int(tc.common_main.shape[0]),
                tuple(int(p) for p in tc.public_values),
                cached_ids,
            )
        )
    return tuple(parts)


def _mesh_key(mesh):
    if mesh is None:
        return None
    return (
        tuple(mesh.axis_names),
        tuple(mesh.devices.shape),
        tuple(d.id for d in mesh.devices.flat),
    )


def _fused_fn(backend, mpk, ctx, jit: bool = True, mesh=None):
    """Build (and cache on the mpk) the whole-proof function for this
    context shape (jitted single program, or the eager-async variant).

    With ``mesh`` set, the SAME traced program is partitioned by XLA's SPMD
    pass (GSPMD): inputs arrive sharded along the trace-height axis, the
    stage code's :mod:`swirl.parallel.annotate` constraints pin the long
    axis, and XLA inserts the collectives — the multi-chip prover IS the
    single-chip program."""
    import contextlib

    from jax.sharding import NamedSharding, PartitionSpec as PSpec

    from ..parallel import annotate
    from .backend import AirContext, Coordinator, ProvingContext

    key = _ctx_cache_key((jit, _mesh_key(mesh)), ctx)
    cache = getattr(mpk, "_fused_cache", None)
    if cache is None:
        cache = {}
        mpk._fused_cache = cache
    if key in cache:
        return cache[key]

    meta = {}

    def fn(common_list):
        # fresh contexts bound to the jit arguments; pk data and
        # cached/preprocessed device arrays are closed over as constants
        per_trace = [
            (
                air_id,
                AirContext(
                    cached_mains=tc.cached_mains,
                    common_main=arr,
                    public_values=tc.public_values,
                ),
            )
            for (air_id, tc), arr in zip(ctx.per_trace, common_list)
        ]
        mesh_ctx = (
            annotate.spmd_mesh(mesh) if mesh is not None else contextlib.nullcontext()
        )
        with mesh_ctx, vmode.trace_mode():
            coord = Coordinator(backend, DeviceTranscript())
            proof = coord._prove(mpk, ProvingContext(per_trace))
        plain = {
            "common_main_commit": proof.common_main_commit,
            "gkr_proof": _to_plain(proof.gkr_proof),
            "batch_constraint_proof": _to_plain(proof.batch_constraint_proof),
            "stacking_proof": _to_plain(proof.stacking_proof),
            "whir_proof": _to_plain(proof.whir_proof),
        }
        # pack every (uint32) leaf into ONE buffer: a warm prove then costs
        # a single D2H fetch instead of one per proof field
        import jax.numpy as jnp

        leaves, treedef = jax.tree_util.tree_flatten(plain)
        meta["treedef"] = treedef
        meta["shapes"] = [jnp.shape(l) for l in leaves]
        if not any(isinstance(l, jax.core.Tracer) for l in leaves):
            # eager mode: leaves are a mix of device arrays and host numpy
            # (stage drivers assemble protocol-small values host-side).
            # Fetch the device ones in ONE batched device_get and
            # concatenate on host — uploading ~10^3 small host leaves just
            # to concatenate and fetch them back costs a relay dispatch
            # each.
            leaves = jax.device_get(leaves)
            flat = [np.ravel(np.asarray(l, np.uint32)) for l in leaves]
            return (
                np.concatenate(flat)
                if flat
                else np.zeros((0,), np.uint32)
            )
        flat = [jnp.ravel(jnp.asarray(l, jnp.uint32)) for l in leaves]
        return jnp.concatenate(flat) if flat else jnp.zeros((0,), jnp.uint32)

    if mesh is not None:
        n_dev = mesh.devices.size
        in_shardings = [
            NamedSharding(
                mesh,
                PSpec(None, annotate.AXIS)
                if int(tc.common_main.shape[1]) % n_dev == 0
                else PSpec(),
            )
            for _, tc in ctx.per_trace
        ]
        wrapped = jax.jit(
            fn, in_shardings=(in_shardings,), out_shardings=NamedSharding(mesh, PSpec())
        )
    elif jit:
        wrapped = jax.jit(fn)
    else:
        wrapped = fn
    cache[key] = (wrapped, meta)
    return wrapped, meta


def _pack(meta, key, plain):
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(plain)
    meta[key] = (treedef, [jnp.shape(l) for l in leaves])
    flat = [jnp.ravel(jnp.asarray(l, jnp.uint32)) for l in leaves]
    return jnp.concatenate(flat) if flat else jnp.zeros((0,), jnp.uint32)


def _unpack(meta, key, flat):
    treedef, shapes = meta[key]
    flat = np.asarray(flat)
    leaves = []
    off = 0
    for shape in shapes:
        n = int(np.prod(shape)) if shape else 1
        leaves.append(flat[off : off + n].reshape(shape))
        off += n
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _mesh_shardings(mesh, tree):
    """Sharding rule for the mesh-segmented prover: any array whose LAST
    axis is the long (height-derived) axis — trace rows, stacked/RS matrix
    height, Merkle layer index — shards over the mesh; everything
    protocol-small (sponge state, packed proof flats, xi/r stacks, tower
    tails) replicates. One rule applied to both in- and out-avals keeps
    cross-segment buffers resident in place (no resharding between
    stages)."""
    from jax.sharding import NamedSharding, PartitionSpec

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def rule(aval):
        shape = getattr(aval, "shape", ())
        if (
            len(shape) >= 2
            and shape[-1] % n_dev == 0
            and shape[-1] // n_dev >= 64
        ):
            return NamedSharding(
                mesh, PartitionSpec(*([None] * (len(shape) - 1) + [axis]))
            )
        return NamedSharding(mesh, PartitionSpec())

    return jax.tree_util.tree_map(rule, tree)


def _segmented_fn(backend, mpk, ctx, mesh=None):
    """Five stage-level jitted programs with the device-sponge state (and
    trace-time cursor constants) crossing between them: commit+preamble /
    GKR fractional sumcheck / batch constraints / stacked reduction / WHIR.

    Same zero-host-sync property as the monolithic program — the transcript
    never leaves the device — but each stage compiles separately, bounding
    XLA module size for tall traces (a monolithic compile can exhaust the
    compile helper past ~2^16 rows).

    ``mesh``: shard every stage over the device mesh (GSPMD) with the long
    axis distributed per :func:`_mesh_shardings`; proof bytes are identical
    to the single-device path (all math is exact modular integer
    arithmetic, so reduction reorderings cannot change values)."""
    import jax.numpy as jnp

    from ..proof import TraceVData
    from .backend import Coordinator, ProvingContext  # noqa: F401
    from .logup_zerocheck import (
        TraceProver,
        prove_batch_phase,
        prove_gkr_phase,
    )
    from .merkle import MerkleTree
    from .stacked_pcs import StackedPcsData
    from .stacked_reduction import prove_stacked_opening_reduction
    from .whir import prove_whir_opening

    params = mpk.params
    num_airs = len(mpk.per_air)
    meta = {}

    def restore_transcript(state, key):
        t = DeviceTranscript()
        t.state = state
        t.absorb_idx, t.sample_idx = meta[key]
        return t

    def save_cursor(t, key):
        meta[key] = (t.absorb_idx, t.sample_idx)

    def mk_data(layout, rpq, matrix, rs_matrix, layers):
        return StackedPcsData(
            layout=layout,
            matrix=matrix,
            rs_matrix=rs_matrix,
            tree=MerkleTree(layers=list(layers), rows_per_query=rpq),
            l_skip=params.l_skip,
            n_stack=params.n_stack,
            log_blowup=params.log_blowup,
        )

    def seg1(common_list):
        with vmode.trace_mode():
            t = DeviceTranscript()
            t.observe_commit(mpk.vk_pre_hash)
            common_commit, common_data = backend.commit_traces(common_list)
            trace_vdata = [None] * num_airs
            pvs = [[] for _ in range(num_airs)]
            for (air_id, tc), arr in zip(ctx.per_trace, common_list):
                trace_vdata[air_id] = TraceVData(
                    log_height=int(arr.shape[1]).bit_length() - 1,
                    cached_commitments=[c.commitment for c in tc.cached_mains],
                )
                pvs[air_id] = list(tc.public_values)
            t.observe_commit(common_commit)
            for air_id in range(num_airs):
                pk = mpk.per_air[air_id]
                vdata = trace_vdata[air_id]
                if not pk.vk.is_required:
                    t.observe(1 if vdata is not None else 0)
                if vdata is not None:
                    if pk.preprocessed_data is not None:
                        t.observe_commit(pk.preprocessed_data.commitment)
                    else:
                        t.observe(vdata.log_height)
                    for c in vdata.cached_commitments:
                        t.observe_commit(c)
                for pv in pvs[air_id]:
                    t.observe(pv)
        save_cursor(t, "cur1")
        meta["layout"] = common_data.layout
        meta["rpq"] = common_data.tree.rows_per_query
        meta["num_layers"] = len(common_data.tree.layers)
        return (
            t.state,
            _pack(meta, "commit", {"common_main_commit": common_commit}),
            common_data.matrix,
            common_data.rs_matrix,
            tuple(common_data.tree.layers),
        )

    def mk_traces(common_list):
        traces = []
        for air_id, tc in ctx.per_trace:
            pk = mpk.per_air[air_id]
            vk = pk.vk
            cm = dict(zip([a for a, _ in ctx.per_trace], common_list))[air_id]
            traces.append(
                TraceProver(
                    air_id=air_id,
                    dag=vk.symbolic_constraints,
                    needs_next=vk.params.need_rot,
                    d_air=vk.max_constraint_degree,
                    public_values=list(tc.public_values),
                    height=int(cm.shape[1]),
                    n=int(cm.shape[1]).bit_length() - 1 - params.l_skip,
                    preprocessed=(
                        pk.preprocessed_data.trace
                        if pk.preprocessed_data is not None
                        else None
                    ),
                    cached=[cd.trace for cd in tc.cached_mains],
                    common=cm,
                )
            )
        return traces

    def seg2a(state, common_list):
        """GKR phase: grind, input eval, fractional sumcheck. Split from
        the batch phase so each compiles as a separate program — the
        monolithic RAP stage's MLIR was large enough to OOM the remote
        compile helper at production heights."""
        with vmode.trace_mode():
            t = restore_transcript(state, "cur1")
            gkr_proof, xi, beta = prove_gkr_phase(
                t, params, mpk.max_constraint_degree, mk_traces(common_list)
            )
        save_cursor(t, "cur2a")
        # xi is ONE stacked (l_skip + n_global, 4) array on the device path
        return (
            t.state,
            _pack(meta, "rap_gkr", _to_plain(gkr_proof)),
            jnp.asarray(xi),
            beta,
        )

    def seg2b(state, xi_stack, beta, common_list):
        with vmode.trace_mode():
            t = restore_transcript(state, "cur2a")
            batch_proof, r = prove_batch_phase(
                t,
                params,
                mpk.max_constraint_degree,
                mk_traces(common_list),
                xi_stack,
                beta,
                save_memory=bool(backend.config.zerocheck_save_memory),
            )
        save_cursor(t, "cur2")
        # r is ONE stacked (n_max + 1, 4) array on the device path
        return (
            t.state,
            _pack(meta, "rap_batch", _to_plain(batch_proof)),
            jnp.asarray(r),
        )

    def stacked_datas(matrix, rs_matrix, layers):
        datas = [
            mk_data(meta["layout"], meta["rpq"], matrix, rs_matrix, layers)
        ]
        need_rot = [
            [mpk.per_air[a].vk.params.need_rot for a, _ in ctx.per_trace]
        ]
        for air_id, tc in ctx.per_trace:
            pk = mpk.per_air[air_id]
            nr = pk.vk.params.need_rot
            if pk.preprocessed_data is not None:
                datas.append(pk.preprocessed_data.data)
                need_rot.append([nr])
            for cd in tc.cached_mains:
                datas.append(cd.data)
                need_rot.append([nr])
        return datas, need_rot

    def seg3(state, r_stack, matrix, rs_matrix, layers):
        with vmode.trace_mode():
            t = restore_transcript(state, "cur2")
            datas, need_rot = stacked_datas(matrix, rs_matrix, layers)
            stacking_proof, u = prove_stacked_opening_reduction(
                t, params, datas, need_rot, r_stack
            )
        save_cursor(t, "cur3")
        # u is ONE stacked (n_stack + 1, 4) array on the device path
        return (
            t.state,
            _pack(meta, "stacking", _to_plain(stacking_proof)),
            jnp.asarray(u),
        )

    def seg4(state, u_stack, matrix, rs_matrix, layers):
        with vmode.trace_mode():
            t = restore_transcript(state, "cur3")
            datas, _ = stacked_datas(matrix, rs_matrix, layers)
            from .stacked_reduction import _u_cube_jit

            u_cube = _u_cube_jit(params.l_skip)(u_stack)
            whir_proof = prove_whir_opening(t, params, datas, u_cube)
        return _pack(meta, "whir", _to_plain(whir_proof))

    if mesh is None:
        segs = (
            jax.jit(seg1),
            jax.jit(seg2a),
            jax.jit(seg2b),
            jax.jit(seg3),
            jax.jit(seg4),
        )
        return segs, meta

    # mesh-segmented: derive in/out shardings per stage from the avals with
    # one shared rule, so stage boundaries hand sharded buffers straight
    # through. Stages are traced in order (later stages need meta cursors
    # and seg1's output avals).
    sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
    common_avals = [sds(tc.common_main) for _, tc in ctx.per_trace]

    def mesh_jit(fn, *in_avals):
        out_avals = jax.eval_shape(fn, *in_avals)
        return (
            jax.jit(
                fn,
                in_shardings=_mesh_shardings(mesh, tuple(in_avals)),
                out_shardings=_mesh_shardings(mesh, out_avals),
            ),
            out_avals,
        )

    j1, o1 = mesh_jit(seg1, common_avals)
    j2a, o2a = mesh_jit(seg2a, sds(o1[0]), common_avals)
    j2b, o2b = mesh_jit(
        seg2b, sds(o2a[0]), sds(o2a[2]), sds(o2a[3]), common_avals
    )
    big = tuple(jax.tree_util.tree_map(sds, (o1[2], o1[3], o1[4])))
    j3, o3 = mesh_jit(seg3, sds(o2b[0]), sds(o2b[2]), *big)
    j4, _ = mesh_jit(seg4, sds(o3[0]), sds(o3[2]), *big)
    return (j1, j2a, j2b, j3, j4), meta


def _prove_segmented(
    backend, mpk, ctx, trace_vdata, public_values, mesh=None
) -> Proof:
    cache = getattr(mpk, "_fused_cache", None)
    if cache is None:
        cache = {}
        mpk._fused_cache = cache
    key = _ctx_cache_key("seg" if mesh is None else f"seg@{id(mesh)}", ctx)
    save_path = None
    if key not in cache:
        # AOT executable bundles are single-device; the mesh path always
        # traces fresh (the persistent XLA cache still applies).
        path = _aot_path(mpk, ctx) if mesh is None else None
        entry = _load_aot_segments(path) if path is not None else None
        if entry is None:
            entry = _segmented_fn(backend, mpk, ctx, mesh=mesh)
            save_path = path  # fresh trace: persist the executables below
        cache[key] = entry
    stages, meta = cache[key]

    from .. import metrics
    from jax import block_until_ready as _block

    # On a fresh trace, compile each stage explicitly (lower().compile())
    # so the executables can be serialized to the AOT bundle; subsequent
    # in-process proves and AOT-loaded stages call straight through.
    compiled_for_save = [] if save_path is not None else None

    def call(stage, *args):
        if compiled_for_save is None or not hasattr(stage, "lower"):
            return stage(*args)
        c = stage.lower(*args).compile()
        compiled_for_save.append(c)
        return c(*args)

    common = [tc.common_main for _, tc in ctx.per_trace]
    if mesh is not None:
        # place trace shards across the mesh up front (the stage jits would
        # otherwise reshard on entry)
        shardings = _mesh_shardings(
            mesh, [jax.ShapeDtypeStruct(c.shape, c.dtype) for c in common]
        )
        common = [
            jax.device_put(c, sh) for c, sh in zip(common, shardings)
        ]

    def run_stages(s1, s2a, s2b, s3, s4):
        # span names match the Coordinator's (and the roofline bound keys)
        # so bench.py's roofline join attributes the segmented warm time per
        # stage; block_until_ready pins async dispatch in the right span.
        with metrics.span("prover.main_trace_commit"):
            state, commit_flat, matrix, rs_matrix, layers = _block(
                call(s1, common)
            )
        with metrics.span("prove_rap_constraints"):
            state, gkr_flat, xi_stack, beta = _block(
                call(s2a, state, common)
            )
            state, batch_flat, r_stack = _block(
                call(s2b, state, xi_stack, beta, common)
            )
        with metrics.span("prove_stacked_reduction"):
            state, stacking_flat, u_stack = _block(
                call(s3, state, r_stack, matrix, rs_matrix, layers)
            )
        with metrics.span("prove_whir"):
            whir_flat = _block(
                call(s4, state, u_stack, matrix, rs_matrix, layers)
            )
        return commit_flat, gkr_flat, batch_flat, stacking_flat, whir_flat

    try:
        commit_flat, gkr_flat, batch_flat, stacking_flat, whir_flat = (
            run_stages(*stages)
        )
    except Exception:
        # AOT-loaded executables can fail AT CALL TIME on some platforms
        # (XLA:CPU's thunk registry collides with live jitted kernels when
        # a deserialized executable shares a process with other compiled
        # functions). The stages are pure, so recover by re-tracing and
        # re-running from s1. A traced-stage failure is a real error.
        if hasattr(stages[0], "lower"):
            raise
        import sys

        print(
            "swirl: AOT-loaded stage failed at call time; re-tracing",
            file=sys.stderr,
        )
        cache[key] = _segmented_fn(backend, mpk, ctx, mesh=mesh)
        stages, meta = cache[key]
        compiled_for_save = None
        commit_flat, gkr_flat, batch_flat, stacking_flat, whir_flat = (
            run_stages(*stages)
        )

    if compiled_for_save is not None and len(compiled_for_save) == 5:
        # meta is fully populated once every stage has traced
        _save_aot_segments(save_path, compiled_for_save, meta)
        # later in-process proves reuse the explicit executables (the
        # jitted wrappers would otherwise re-trace: lower() does not
        # populate jit's dispatch cache)
        cache[key] = (tuple(compiled_for_save), meta)

    with metrics.span("proof_fetch"):
        commit = _unpack(meta, "commit", commit_flat)
        gkr = _unpack(meta, "rap_gkr", gkr_flat)
        batch = _unpack(meta, "rap_batch", batch_flat)
        stacking = _unpack(meta, "stacking", stacking_flat)
        whir = _unpack(meta, "whir", whir_flat)
    plain = {
        "common_main_commit": commit["common_main_commit"],
        "gkr_proof": gkr,
        "batch_constraint_proof": batch,
        "stacking_proof": stacking,
        "whir_proof": whir,
    }
    return _rebuild_proof(plain, trace_vdata, public_values)


def prove_fused(backend, mpk, unsorted_ctx, mode: str = "jit", mesh=None) -> Proof:
    """Device-resident prove; byte-identical to ``Coordinator.prove``.

    mode="jit": the whole proof is ONE compiled XLA program (compile once
    per shape, best steady-state latency; compile cost grows with the round
    count).
    mode="segmented": five stage-level programs with the sponge state
    carried across — bounded compile size for tall traces.
    mode="eager": the same trace-mode pipeline runs op-by-op with async
    dispatch — the transcript and every intermediate stay on device, there
    are ZERO host round-trips until the single final proof fetch, and
    nothing big ever compiles. The right choice for one-off shapes.

    mesh: a ``jax.sharding.Mesh`` with axis "rows" — the whole proof runs
    SPMD over the mesh with traces sharded along the height axis (GSPMD
    partitioning of the jit program; only mode="jit" supports this). The
    proof bytes are identical to the single-device result.
    """
    enable_compile_cache()
    if mesh is not None and mode not in ("jit", "segmented"):
        raise ValueError("mesh sharding requires mode='jit' or 'segmented'")
    ctx = unsorted_ctx.sorted_for_stacking()
    num_airs = len(mpk.per_air)

    # static proof metadata (mirrors Coordinator._prove's host assembly)
    trace_vdata: List = [None] * num_airs
    public_values: List[List[int]] = [[] for _ in range(num_airs)]
    for air_id, tc in ctx.per_trace:
        trace_vdata[air_id] = TraceVData(
            log_height=tc.height.bit_length() - 1,
            cached_commitments=[cd.commitment for cd in tc.cached_mains],
        )
        public_values[air_id] = list(tc.public_values)

    common = [tc.common_main for _, tc in ctx.per_trace]
    if mode == "segmented":
        return _prove_segmented(
            backend, mpk, ctx, trace_vdata, public_values, mesh=mesh
        )
    fn, meta = _fused_fn(backend, mpk, ctx, jit=(mode == "jit"), mesh=mesh)
    flat = np.asarray(fn(common))  # one transfer for the whole proof
    leaves = []
    off = 0
    for shape in meta["shapes"]:
        n = int(np.prod(shape)) if shape else 1
        leaves.append(flat[off : off + n].reshape(shape))
        off += n
    plain = jax.tree_util.tree_unflatten(meta["treedef"], leaves)
    return _rebuild_proof(plain, trace_vdata, public_values)
