"""Randomized malformed-proof fuzz over the shape verifier.

The reference's conformance bar (``verifier/proof_shape.rs``) is that EVERY
structurally-malformed proof is rejected with a typed ``ProofShapeError``
variant BEFORE any indexing — never an ``IndexError``/``TypeError`` from deep
inside a stage verifier. This fuzz walks the proof's container tree, applies
seeded random structural mutations (truncate/extend lists, reshape arrays,
de-canonicalize limbs, flip dtypes), and asserts the verifier raises from the
typed taxonomy (``swirl/verifier/errors.py``) every time.

A mutation can also leave the SHAPE valid and only change values — then the
proof must fail semantic verification instead (still a typed VerifierError).
"""

from __future__ import annotations

import copy
import dataclasses
import random

import numpy as np
import pytest

from swirl.engine import StarkEngine
from swirl.fields.babybear import P
from swirl.params import test_system_params_small as _small_params
from swirl.testing.fixtures import FibonacciAir
from swirl.verifier.errors import VerifierError

N_MUTATIONS = 60


@pytest.fixture(scope="module", params=["fib", "interactions"])
def proven(request):
    """Two fixture proofs: Fibonacci (no interactions — minimal sections)
    and a self-interaction AIR (GKR + LogUp sections present), so the fuzz
    walks every proof container family."""
    if request.param == "fib":
        eng = StarkEngine(_small_params(2, 6, 3))
        air = FibonacciAir()
        vk, proof = eng.run_test(
            [air], [(air.generate_trace(0, 1, 64), air.pvs(0, 1, 64), [])]
        )
        return eng, vk, proof
    from swirl.testing.fixtures import SelfInteractionAir

    eng = StarkEngine(_small_params(2, 4, 3))
    air = SelfInteractionAir(4)
    vk, proof = eng.run_test([air], [(air.generate_trace(64), [], [])])
    return eng, vk, proof


def _sites(obj, path=""):
    """Collect (path, parent, key) mutation sites: list slots and ndarray
    leaves anywhere in the nested proof dataclasses."""
    out = []
    if dataclasses.is_dataclass(obj):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            out.append((f"{path}.{f.name}", obj, f.name))
            out.extend(_sites(v, f"{path}.{f.name}"))
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            out.append((f"{path}[{i}]", obj, i))
            out.extend(_sites(v, f"{path}[{i}]"))
    return out


def _get(parent, key):
    return getattr(parent, key) if isinstance(key, str) else parent[key]


def _set(parent, key, value):
    if isinstance(key, str):
        setattr(parent, key, value)
    else:
        parent[key] = value


def _mutate(rng: random.Random, parent, key) -> str | None:
    """Apply one random structural mutation at the site; returns a
    description or None if the site doesn't admit this mutation."""
    v = _get(parent, key)
    choice = rng.randrange(6)
    if isinstance(v, list):
        if choice == 0 and len(v) > 0:
            _set(parent, key, v[:-1])
            return "truncate list"
        if choice == 1 and len(v) > 0:
            _set(parent, key, v + [copy.deepcopy(v[-1])])
            return "extend list"
        if choice == 2:
            _set(parent, key, [])
            return "empty list"
        return None
    if isinstance(v, np.ndarray):
        if choice == 0 and v.size > 1:
            _set(parent, key, v.reshape(-1)[:-1].copy())
            return "flatten+truncate array"
        if choice == 1:
            w = v.copy().reshape(-1)
            w[rng.randrange(w.size)] = P  # non-canonical limb
            _set(parent, key, w.reshape(v.shape))
            return "non-canonical limb"
        if choice == 2:
            _set(parent, key, v.astype(np.float64))
            return "wrong dtype"
        if choice == 3:
            _set(parent, key, np.concatenate([v.reshape(-1), v.reshape(-1)]))
            return "double array"
        if choice == 4 and v.size > 0:
            w = v.copy().reshape(-1)
            i = rng.randrange(w.size)
            w[i] = (int(w[i]) + 1) % P
            _set(parent, key, w.reshape(v.shape))
            return "value bump"
        return None
    if isinstance(v, int) and not isinstance(v, bool):
        if choice == 0:
            _set(parent, key, v + 1)
            return "int bump"
        if choice == 1:
            _set(parent, key, -1)
            return "int negative"
        return None
    return None


def test_shape_fuzz_rejects_typed(proven):
    eng, vk, base_proof = proven
    rng = random.Random(0xC0FFEE)
    applied = 0
    for trial in range(N_MUTATIONS * 4):
        if applied >= N_MUTATIONS:
            break
        proof = copy.deepcopy(base_proof)
        sites = _sites(proof, "proof")
        path, parent, key = sites[rng.randrange(len(sites))]
        desc = _mutate(rng, parent, key)
        if desc is None:
            continue
        applied += 1
        try:
            eng.verify(vk, proof)
        except VerifierError:
            continue  # typed rejection: the required outcome
        except Exception as e:  # noqa: BLE001
            pytest.fail(
                f"mutation {desc!r} at {path} leaked an untyped "
                f"{type(e).__name__}: {e}"
            )
        else:
            pytest.fail(f"mutation {desc!r} at {path} VERIFIED")
    assert applied >= N_MUTATIONS


def test_error_variant_equality():
    """Variants carry fields and compare by value (reference enums'
    PartialEq)."""
    from swirl.verifier.errors import (
        CachedCommitmentsMismatch,
        VDataLengthMismatch,
    )

    a = VDataLengthMismatch(len=2, num_airs=3)
    b = VDataLengthMismatch(len=2, num_airs=3)
    c = VDataLengthMismatch(len=1, num_airs=3)
    assert a == b and a != c
    assert a.fields == {"len": 2, "num_airs": 3}
    assert "2" in str(a) and "3" in str(a)
    assert a != CachedCommitmentsMismatch(air_idx=0, expected=2, actual=3)
