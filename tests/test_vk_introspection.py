"""vk-introspection conformance: exact trace-height LinearConstraint content
and implied-constraint removal, mirroring the reference tests
`interaction_trace_height_constraints` and
`trace_height_constraints_implied_removal`
(`crates/backend-tests/src/lib.rs:772-843`). Fast tier (keygen only)."""

import tests.conftest  # noqa: F401

from swirl.engine import StarkEngine
from swirl.fields.babybear import P
from swirl.params import default_test_params_small
from swirl.testing.fixtures import DummyInteractionAir, FibonacciSelectorAir


def test_interaction_trace_height_constraints_exact():
    n = 8
    sels = [i % 2 == 0 for i in range(n)]
    fib_air = FibonacciSelectorAir(sels, interaction=True)  # cw 0, bus 0
    sender = DummyInteractionAir(1, True, 0, count_weight=3)
    sender_2 = DummyInteractionAir(1, True, 0, count_weight=1)
    sender_3 = DummyInteractionAir(1, True, 1, count_weight=7)

    eng = StarkEngine(default_test_params_small())
    _, vk = eng.keygen([fib_air, sender, sender_2, sender_3])

    cs = vk.trace_height_constraints
    assert len(cs) == 3
    # bus 0: per-AIR summed count_weights, threshold = p
    assert cs[0].coefficients == [0, 3, 1, 0]
    assert cs[0].threshold == P
    # bus 1
    assert cs[1].coefficients == [0, 0, 0, 7]
    assert cs[1].threshold == P
    # total interactions (1 per AIR), threshold = max_interaction_count
    assert cs[2].coefficients == [1, 1, 1, 1]
    assert cs[2].threshold == eng.params.logup.max_interaction_count


def test_trace_height_constraints_implied_removal():
    n = 8
    sels = [i % 2 == 0 for i in range(n)]
    fib_air = FibonacciSelectorAir(sels, interaction=True)
    sender = DummyInteractionAir(1, True, 0, count_weight=1)
    sender_2 = DummyInteractionAir(1, True, 1, count_weight=1)

    eng = StarkEngine(default_test_params_small())
    _, vk = eng.keygen([fib_air, sender, sender_2])

    cs = vk.trace_height_constraints
    # per-bus constraints [0,1,0] and [0,0,1] (threshold p) are implied by
    # the total [1,1,1] (threshold max_interaction_count < p): removed.
    assert len(cs) == 1
    assert cs[0].coefficients == [1, 1, 1]
    assert cs[0].threshold == eng.params.logup.max_interaction_count


def test_pre_vk_postcard_golden_bytes():
    """Freeze the postcard pre-vk serialization (vk pre-hash input).

    The MontyField31 monty-form-u32 varint layout (postcard_vk.py header)
    cannot be cross-checked against in-repo reference data (no Plonky3
    sources on disk, no egress), so this golden vector pins the whole
    layout against silent drift: any change to the postcard emulation, the
    symbolic DAG serialization, or the felt encoding fails here first.
    Reference flow: keygen/mod.rs:193-216."""
    import hashlib

    from swirl.postcard_vk import versioned_pre_vk_bytes

    n = 8
    sels = [i % 2 == 0 for i in range(n)]
    airs = [
        FibonacciSelectorAir(sels, interaction=True),
        DummyInteractionAir(1, True, 0, count_weight=3),
    ]
    eng = StarkEngine(default_test_params_small())
    _, vk = eng.keygen(airs)
    data = versioned_pre_vk_bytes(
        eng.params, vk.per_air, vk.trace_height_constraints
    )
    assert len(data) == 264
    # version framing: CODEC_VERSION=3 u32 LE ++ payload len u64 LE
    assert data[:4] == (3).to_bytes(4, "little")
    assert data[4:12] == (252).to_bytes(8, "little")
    assert data[:64].hex() == (
        "03000000fc00000000000000020880200103030a04020301020103018080808004"
        "070203020199ffb99707aadc8c8a039ce6b39f06ebf6aac106a5ebd59603ab"
    )
    assert (
        hashlib.sha256(data).hexdigest()
        == "db0fbb62662f13b938c2d0f08eae648bf5712421bc63429816d743c5b2b5e255"
    )
