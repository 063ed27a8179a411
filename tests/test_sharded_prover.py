"""Sharded production prover on the 8-device virtual CPU mesh.

Covers the three layers VERDICT r2 flagged as demo-only:
 - ShardedRedMSM (red dense pipeline per shard + gathered tree combine),
 - ShardedWitnessMap (sparse matvec + full coset NTT pipeline, incl the
   divide-by-Z and icoset transforms, under one shard_map),
 - ProverContext(mesh=...): a proof produced multi-device verifies under
   the unchanged pairing verifier and matches the single-chip prover
   bit-for-bit (nozk determinism).
"""
import random
import unittest

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.bn254 import G1_GEN, CURVE_ORDER, multiply, add
from ethsnarks_tpu.parallel.mesh import make_mesh

P = SNARK_SCALAR_FIELD

_rng = random.Random(77)


def _det_rng():
    return _rng.randrange(1, P)


def _host_msm(scalars, points):
    out = None
    for s, p in zip(scalars, points):
        out = add(out, multiply(p, s))
    return out


class TestShardedRedMSM(unittest.TestCase):
    def test_g1_full_scalars(self):
        from ethsnarks_tpu.ops import msm_red
        from ethsnarks_tpu.ops.msm import window_digits_host_np
        from ethsnarks_tpu.parallel.msm_red_sharded import ShardedRedMSM
        mesh = make_mesh(4)
        n = 128
        rng = np.random.default_rng(3)
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        scalars = [int.from_bytes(rng.bytes(32), 'little') % CURVE_ORDER
                   for _ in range(n)]
        msm = ShardedRedMSM(mesh, n, 8)
        pts_sh = msm.shard_points(msm_red.g1_to_red(pts))
        got = msm(pts_sh, window_digits_host_np(scalars, 8))
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_overflow_replan(self):
        # skewed scalars overflow the static per-shard plan -> exact replan
        from ethsnarks_tpu.ops import msm_red
        from ethsnarks_tpu.ops.msm import window_digits_host_np
        from ethsnarks_tpu.parallel.msm_red_sharded import ShardedRedMSM
        mesh = make_mesh(4)
        n = 256
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        s = 12345
        msm = ShardedRedMSM(mesh, n, 8)
        pts_sh = msm.shard_points(msm_red.g1_to_red(pts))
        got = msm(pts_sh, window_digits_host_np([s] * n, 8))
        self.assertEqual(got, _host_msm([s] * n, pts))


class TestShardedWitnessMap(unittest.TestCase):
    def test_matches_single_chip(self):
        from ethsnarks_tpu.qap import QAP
        from ethsnarks_tpu.ops.fp import Fr
        from ethsnarks_tpu.parallel.qap_sharded import ShardedWitnessMap
        from tests.test_groth16 import _cubic_circuit
        pb = _cubic_circuit()
        qap = QAP(pb)
        mesh = make_mesh(min(8, qap.domain_size // 2))
        wm = ShardedWitnessMap(qap, mesh)
        w_mont = Fr.to_mont_jit(Fr.to_limbs(pb.values))
        h_sharded = np.asarray(wm(w_mont))
        h_single = np.asarray(qap._witness_map_jit(w_mont))
        got = Fr.from_limbs(np.asarray(
            Fr.from_mont_jit(np.asarray(h_sharded))))
        want = Fr.from_limbs(np.asarray(
            Fr.from_mont_jit(h_single)))
        self.assertEqual(got, want)


class TestShardedProverContext(unittest.TestCase):
    def test_prove_verify_multidevice(self):
        from ethsnarks_tpu.groth16 import generator, ProverContext
        from tests.test_groth16 import _cubic_circuit
        pb = _cubic_circuit()
        keypair = generator(pb, rng=_det_rng)
        mesh = make_mesh(2)
        ctx = ProverContext(keypair.pk, pb, mesh=mesh)
        proof = ctx.prove(pb.values)
        self.assertTrue(keypair.vk.verify(proof))
        # nozk determinism: identical to the single-chip prover's proof
        ctx1 = ProverContext(keypair.pk, pb, use_device_msm=False)
        self.assertEqual(proof.to_json(), ctx1.prove(pb.values).to_json())


if __name__ == '__main__':
    unittest.main()
