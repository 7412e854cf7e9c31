"""Cross-field correctness tests for the generic device field zoo.

Peer of the reference ``benchmarks/fields/tests/verification.rs``: every
field's device mul/add/inv is checked against independent Python-int
modular arithmetic, plus algebraic laws (a * a^-1 = 1, distributivity)
on random batches.
"""

from __future__ import annotations

import numpy as np
import pytest

from swirl.fields.generic import (
    FIELDS,
    GL_P,
    Goldilocks,
    Goldilocks3,
    bb5,
    bb6,
    babybear,
    kb5,
    kb6,
    koalabear,
)

N = 257  # deliberately not a power of two
rng = np.random.default_rng(7)


# -- host oracles ------------------------------------------------------------


def _ext_mul_host(a, b, p: int, reduction):
    """Schoolbook poly mul + fold, pure Python ints."""
    d = len(reduction)
    conv = [0] * (2 * d - 1)
    for i in range(d):
        for j in range(d):
            conv[i + j] = (conv[i + j] + int(a[i]) * int(b[j])) % p
    for k in range(2 * d - 2, d - 1, -1):
        t = conv[k]
        for i, c in enumerate(reduction):
            conv[k - d + i] = (conv[k - d + i] + t * c) % p
    return np.array(conv[:d], dtype=object) % p


@pytest.mark.parametrize("name", ["babybear", "koalabear"])
def test_mont31_base_ops(name):
    F = FIELDS[name]
    a = rng.integers(0, F.p, N, dtype=np.uint64)
    b = rng.integers(1, F.p, N, dtype=np.uint64)
    da, db = F.to_monty(a), F.to_monty(b)
    assert np.array_equal(F.to_host(F.mul(da, db)), (a * b) % F.p)
    assert np.array_equal(F.to_host(F.add(da, db)), (a + b) % F.p)
    assert np.array_equal(
        F.to_host(F.sub(da, db)), (a + np.uint64(F.p) - b) % np.uint64(F.p)
    )
    inv = F.to_host(F.inv(db))
    assert np.array_equal((inv * b) % F.p, np.ones(N, dtype=np.uint64))


@pytest.mark.parametrize(
    "name,ext", [("bb5", bb5), ("bb6", bb6), ("kb5", kb5), ("kb6", kb6)]
)
def test_ext_field_ops(name, ext):
    p, d = ext.base.p, ext.d
    red = [c % p for c in ext.reduction]
    n = 64
    a = rng.integers(0, p, (d, n), dtype=np.uint64)
    b = rng.integers(0, p, (d, n), dtype=np.uint64)
    da, db = ext.to_monty(a), ext.to_monty(b)
    got = ext.to_host(ext.mul(da, db))
    for col in range(0, n, 17):
        want = _ext_mul_host(a[:, col], b[:, col], p, red)
        assert np.array_equal(got[:, col].astype(object), want), f"col {col}"
    # distributivity: (a + b) * c == a*c + b*c
    c = rng.integers(0, p, (d, n), dtype=np.uint64)
    dc = ext.to_monty(c)
    lhs = ext.to_host(ext.mul(ext.add(da, db), dc))
    rhs = (
        ext.to_host(ext.mul(da, dc)).astype(np.uint64)
        + ext.to_host(ext.mul(db, dc)).astype(np.uint64)
    ) % np.uint64(p)
    assert np.array_equal(lhs, rhs)


@pytest.mark.parametrize("name,ext", [("bb5", bb5), ("kb5", kb5)])
def test_ext_field_inv(name, ext):
    p, d = ext.base.p, ext.d
    n = 8  # Fermat powering in the extension is ~p^d squarings-worth of mul
    a = rng.integers(1, p, (d, n), dtype=np.uint64)
    da = ext.to_monty(a)
    inv = ext.inv(da)
    prod = ext.to_host(ext.mul(da, inv))
    assert np.array_equal(prod[0], np.ones(n, dtype=np.uint64))
    assert np.array_equal(prod[1:], np.zeros((d - 1, n), dtype=np.uint64))


def test_goldilocks_base():
    a = rng.integers(0, GL_P, N, dtype=np.uint64)
    b = rng.integers(1, GL_P, N, dtype=np.uint64)
    da, db = Goldilocks.to_dev(a), Goldilocks.to_dev(b)
    want_mul = np.array(
        [(int(x) * int(y)) % GL_P for x, y in zip(a, b)], dtype=np.uint64
    )
    assert np.array_equal(Goldilocks.to_host(Goldilocks.mul(da, db)), want_mul)
    want_add = np.array([(int(x) + int(y)) % GL_P for x, y in zip(a, b)], np.uint64)
    assert np.array_equal(Goldilocks.to_host(Goldilocks.add(da, db)), want_add)
    want_sub = np.array([(int(x) - int(y)) % GL_P for x, y in zip(a, b)], np.uint64)
    assert np.array_equal(Goldilocks.to_host(Goldilocks.sub(da, db)), want_sub)


def test_goldilocks_mul_edge_cases():
    """Boundary values that exercise every correction branch of reduce128."""
    edges = np.array(
        [0, 1, 2, GL_P - 1, GL_P - 2, (1 << 32) - 1, 1 << 32, (1 << 63),
         GL_P // 2, (1 << 32) + 1],
        dtype=np.uint64,
    )
    aa, bb = np.meshgrid(edges, edges)
    a, b = aa.ravel(), bb.ravel()
    da, db = Goldilocks.to_dev(a), Goldilocks.to_dev(b)
    want = np.array([(int(x) * int(y)) % GL_P for x, y in zip(a, b)], np.uint64)
    assert np.array_equal(Goldilocks.to_host(Goldilocks.mul(da, db)), want)


def test_goldilocks_inv():
    a = rng.integers(1, GL_P, 33, dtype=np.uint64)
    da = Goldilocks.to_dev(a)
    inv = Goldilocks.to_host(Goldilocks.inv(da))
    got = np.array([(int(x) * int(y)) % GL_P for x, y in zip(a, inv)], np.uint64)
    assert np.array_equal(got, np.ones(33, dtype=np.uint64))


def test_goldilocks3_ops():
    n = 16
    a = rng.integers(0, GL_P, (3, n), dtype=np.uint64)
    b = rng.integers(0, GL_P, (3, n), dtype=np.uint64)
    da, db = Goldilocks3.to_dev(a), Goldilocks3.to_dev(b)
    got = Goldilocks3.to_host(Goldilocks3.mul(da, db))
    # host oracle: X^3 = X + 1
    for col in range(n):
        conv = [0] * 5
        for i in range(3):
            for j in range(3):
                conv[i + j] = (conv[i + j] + int(a[i, col]) * int(b[j, col])) % GL_P
        want = [
            (conv[0] + conv[3]) % GL_P,
            (conv[1] + conv[3] + conv[4]) % GL_P,
            (conv[2] + conv[4]) % GL_P,
        ]
        assert [int(got[i, col]) for i in range(3)] == want, f"col {col}"


def test_goldilocks3_inv():
    n = 2
    a = rng.integers(1, GL_P, (3, n), dtype=np.uint64)
    da = Goldilocks3.to_dev(a)
    inv = Goldilocks3.inv(da)
    prod = Goldilocks3.to_host(Goldilocks3.mul(da, inv))
    assert np.array_equal(prod[0], np.ones(n, np.uint64))
    assert np.array_equal(prod[1:], np.zeros((2, n), np.uint64))
