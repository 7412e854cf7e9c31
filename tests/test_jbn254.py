"""Device BN254 field + Poseidon2 conformance against the host (Python int)
implementation — the swirl peer of the reference's BN254 CUDA kernel tests
(``cuda-backend/src/bn254_sponge.rs``)."""

import random
import unittest

import pytest

import numpy as np

from swirl.fields import jbn254 as jb
from swirl.hash import jbn254_poseidon2 as jp
from swirl.hash.bn254_poseidon2 import P_BN254, compress2, permute
from swirl.hash.multi_field import MultiFieldHasher, pack_felts
from swirl.fields.babybear import P as P_BB


class TestJBn254Field(unittest.TestCase):
    def test_field_ops_match_host(self):
        rng = random.Random(1)
        for _ in range(25):
            x, y = rng.randrange(P_BN254), rng.randrange(P_BN254)
            xm, ym = jb.const(x), jb.const(y)
            self.assertEqual(
                jb.int_from_limbs(jb.to_canonical(jb.mont_mul(xm, ym))),
                x * y % P_BN254,
            )
            self.assertEqual(
                jb.int_from_limbs(jb.to_canonical(jb.add(xm, ym))),
                (x + y) % P_BN254,
            )
            self.assertEqual(
                jb.int_from_limbs(jb.to_canonical(jb.sub(xm, ym))),
                (x - y) % P_BN254,
            )

    def test_field_edge_cases(self):
        for x, y in [
            (0, 0),
            (0, 1),
            (1, 1),
            (P_BN254 - 1, P_BN254 - 1),
            (P_BN254 - 1, 1),
            (0, P_BN254 - 1),
        ]:
            xm, ym = jb.const(x), jb.const(y)
            self.assertEqual(
                jb.int_from_limbs(jb.to_canonical(jb.mont_mul(xm, ym))),
                x * y % P_BN254,
            )
            self.assertEqual(
                jb.int_from_limbs(jb.to_canonical(jb.sub(xm, ym))),
                (x - y) % P_BN254,
            )

    def test_batched_matches_scalar(self):
        rng = random.Random(2)
        xs = [rng.randrange(P_BN254) for _ in range(32)]
        ys = [rng.randrange(P_BN254) for _ in range(32)]
        xa = np.stack([jb.const(v) for v in xs])
        ya = np.stack([jb.const(v) for v in ys])
        prod = jb.to_canonical(jb.mont_mul(xa, ya))
        for i in range(32):
            self.assertEqual(
                jb.int_from_limbs(prod[i]), xs[i] * ys[i] % P_BN254
            )


class TestJBn254Poseidon2(unittest.TestCase):
    def _rand_state(self, rng, t, batch=None):
        vals = [
            [rng.randrange(P_BN254) for _ in range(t)]
            for _ in range(batch or 1)
        ]
        dev = np.stack(
            [np.stack([jb.const(v) for v in row]) for row in vals]
        )
        if batch is None:
            return vals[0], dev[0]
        return vals, dev

    @pytest.mark.slow
    def test_permute_width3_matches_host(self):
        # slow tier: the 64-round unrolled 8-limb device permutation is a
        # ~50 s compile on the 1-core box; width-2/batched peers are
        # slow-tier already and CI runs --runslow on every main push
        rng = random.Random(3)
        host_in, dev_in = self._rand_state(rng, 3)
        want = permute(host_in, 3)
        got = jb.to_canonical(jp.permute_dev(dev_in, 3))
        for lane in range(3):
            self.assertEqual(jb.int_from_limbs(got[lane]), want[lane])

    @pytest.mark.slow
    def test_permute_width2_matches_host(self):
        rng = random.Random(4)
        host_in, dev_in = self._rand_state(rng, 2)
        want = permute(host_in, 2)
        got = jb.to_canonical(jp.permute_dev(dev_in, 2))
        for lane in range(2):
            self.assertEqual(jb.int_from_limbs(got[lane]), want[lane])

    @pytest.mark.slow
    def test_batched_permute_matches_host(self):
        rng = random.Random(5)
        host_in, dev_in = self._rand_state(rng, 3, batch=4)
        got = jb.to_canonical(jp.permute_dev(dev_in, 3))
        for b in range(4):
            want = permute(host_in[b], 3)
            for lane in range(3):
                self.assertEqual(jb.int_from_limbs(got[b, lane]), want[lane])

    @pytest.mark.slow
    def test_compress_matches_host(self):
        # separate ~1-min device compile; the width-3 permute test already
        # covers the BN254 device permutation in the default tier
        rng = random.Random(6)
        a, b = rng.randrange(P_BN254), rng.randrange(P_BN254)
        got = jb.to_canonical(
            jp.compress2_dev(jb.const(a)[None], jb.const(b)[None])
        )
        self.assertEqual(jb.int_from_limbs(got[0]), compress2(a, b))

    def test_pack_felts_matches_host(self):
        rng = random.Random(7)
        felts = [rng.randrange(P_BB) for _ in range(8)]
        got = jp.pack_felts_dev(np.asarray([felts], np.uint32))
        self.assertEqual(jb.int_from_limbs(got[0]), pack_felts(felts)[0])

    @pytest.mark.slow
    def test_hash_rows_matches_host(self):
        rng = random.Random(8)
        for w in (7, 16):
            rows = np.asarray(
                [[rng.randrange(P_BB) for _ in range(w)] for _ in range(3)],
                np.uint32,
            )
            got = jp.hash_rows_dev(rows)
            for r in range(3):
                self.assertEqual(
                    jb.int_from_limbs(got[r]),
                    MultiFieldHasher.hash_slice(rows[r].astype(np.uint64)),
                )

    @pytest.mark.slow
    def test_merkle_layers_match_host(self):
        rng = random.Random(9)
        rows = np.asarray(
            [[rng.randrange(P_BB) for _ in range(8)] for _ in range(4)],
            np.uint32,
        )
        leaves = jp.hash_rows_dev(rows)
        layers = jp.merkle_layers_dev(leaves)
        root = jb.int_from_limbs(layers[-1][0])
        want = MultiFieldHasher.merkle_root(
            [r.astype(np.uint64) for r in rows]
        )
        self.assertEqual(root, want)


if __name__ == "__main__":
    unittest.main()
