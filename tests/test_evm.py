"""EVM codegen parity: generated MiMC/Poseidon bytecode vs the host oracle.

Replaces the reference's ganache/py-evm tests (test_mimc_evm.py,
test_poseidon_evm.py) with the in-process mini-EVM interpreter.
"""
import random
import unittest

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.evmasm import execute, Assembler
from ethsnarks_tpu.mimc import mimc
from ethsnarks_tpu.mimc.contract import mimc_contract
from ethsnarks_tpu.mimc.contract_sol import mimc_contract_solidity
from ethsnarks_tpu.poseidon import poseidon
from ethsnarks_tpu.poseidon.contract import poseidon_contract

P = SNARK_SCALAR_FIELD
_rng = random.Random(4242)


def _call(code, *words):
    data = b''.join(int(w).to_bytes(32, 'big') for w in words)
    return int.from_bytes(execute(code, data), 'big')


class TestAssembler(unittest.TestCase):
    def test_push_sizes(self):
        asm = Assembler()
        asm.push(0x1234)
        asm.push(1)
        code = asm.assemble()
        self.assertEqual(code[0], 0x61)  # PUSH2
        self.assertEqual(code[3], 0x60)  # PUSH1

    def test_jump_label(self):
        asm = Assembler()
        asm.push_label('end')
        asm.emit('JUMP')
        asm.push(99)  # skipped
        asm.push(0)
        asm.emit('MSTORE')
        asm.label('end')
        asm.push(7)
        asm.push(0)
        asm.emit('MSTORE')
        asm.push(32)
        asm.push(0)
        asm.emit('RETURN')
        self.assertEqual(int.from_bytes(execute(asm.assemble()), 'big'), 7)


class TestMiMCEvm(unittest.TestCase):
    def test_known_vector(self):
        code = mimc_contract(7)
        m0 = 3703141493535563179657531719960160174296085208671919316200479060314459804651
        m1 = 134551314051432487569247388144051420116740427803855572138106146683954151557
        self.assertEqual(_call(code, m0, m1), mimc(m0, m1))

    def test_random(self):
        code7 = mimc_contract(7)
        code5 = mimc_contract(5, rounds=110)
        for _ in range(3):
            x, k = _rng.randrange(P), _rng.randrange(P)
            self.assertEqual(_call(code7, x, k), mimc(x, k))
            self.assertEqual(_call(code5, x, k), mimc(x, k, e=5, R=110))

    def test_solidity_source(self):
        src = mimc_contract_solidity(7)
        self.assertIn('library MiMCpe7_generated', src)
        self.assertIn('mulmod', src)
        # 91 rounds present
        self.assertEqual(src.count('addmod(addmod('), 91)


class TestPoseidonEvm(unittest.TestCase):
    def test_known_vector(self):
        code = poseidon_contract()
        self.assertEqual(_call(code, 1, 2), poseidon([1, 2]))

    def test_random(self):
        code = poseidon_contract()
        for _ in range(2):
            a, b = _rng.randrange(P), _rng.randrange(P)
            self.assertEqual(_call(code, a, b), poseidon([a, b]))

    def test_solidity_source(self):
        from ethsnarks_tpu.poseidon.contract_sol import \
            poseidon_contract_solidity
        from ethsnarks_tpu.poseidon.permutation import DefaultParams
        src = poseidon_contract_solidity()
        self.assertIn('library Poseidon_generated', src)
        n_rounds = DefaultParams.nRoundsF + DefaultParams.nRoundsP
        # every round constant and MDS entry is hardcoded
        for c in (DefaultParams.constants_C[0],
                  DefaultParams.constants_C[-1]):
            self.assertIn(hex(c % P), src)
        self.assertIn(hex(DefaultParams.constants_M[0][0] % P), src)
        self.assertIn(hex(DefaultParams.constants_M[-1][-1] % P), src)
        self.assertEqual(src.count('        C['), n_rounds)
        self.assertEqual(src.count('        M['),
                         DefaultParams.t * DefaultParams.t)
        self.assertIn('function Permute', src)
        self.assertIn('function PoseidonHash', src)


if __name__ == "__main__":
    unittest.main()
