"""Gas metering pins for the mini-EVM (Istanbul schedule).

Exact pins for the hand-assembled micro programs (any schedule drift is a
deliberate change and should update these), plus sanity bands for the
contract twins mirroring the reference's logged gas figures
(test/TestMiMC.js estimateGas, eth-gas-reporter).
"""
import unittest

from ethsnarks_tpu.evmasm import Assembler, execute


class TestGasSchedule(unittest.TestCase):
    def test_arithmetic_and_memory_pin(self):
        a = Assembler()
        a.push(2).push(3).emit('ADD')          # 3 + 3 + 3
        a.push(0).emit('MSTORE')               # 3 + 3 + mem(1 word)=3
        a.push(32).push(0).emit('RETURN')      # 3 + 3 + 0
        out, gas = execute(a.assemble(), with_gas=True)
        self.assertEqual(int.from_bytes(out, 'big'), 5)
        self.assertEqual(gas, 24)

    def test_exp_dynamic_cost(self):
        def run(exponent):
            a = Assembler()
            a.push(exponent).push(2).emit('EXP')
            a.push(0).emit('MSTORE')
            a.push(32).push(0).emit('RETURN')
            _, gas = execute(a.assemble(), with_gas=True)
            return gas
        # 50/exponent byte: 1-byte vs 2-byte exponent differ by exactly 50
        self.assertEqual(run(0x100) - run(0xFF), 50)

    def test_memory_expansion_quadratic(self):
        def run(words):
            a = Assembler()
            a.push(1).push(32 * (words - 1)).emit('MSTORE')
            a.push(0).push(0).emit('RETURN')
            _, gas = execute(a.assemble(), with_gas=True)
            return gas
        # linear region: 3/word
        self.assertEqual(run(11) - run(10), 3)
        # far out, the words^2/512 term kicks in
        big, bigger = run(1000), run(1001)
        self.assertGreater(bigger - big, 3)

    def test_sha3_word_cost(self):
        def run(nbytes):
            a = Assembler()
            # pre-expand memory past the hashed range so the delta below
            # isolates the SHA3 word cost (no memory-expansion gas mixed in)
            a.push(0).push(64).emit('MSTORE')
            a.push(nbytes).push(0).emit('SHA3')
            a.push(0).emit('MSTORE')
            a.push(32).push(0).emit('RETURN')
            _, gas = execute(a.assemble(), with_gas=True)
            return gas
        self.assertEqual(run(64) - run(32), 6)

    def test_precompile_prices(self):
        from ethsnarks_tpu.evmasm import _precompile_gas
        self.assertEqual(_precompile_gas(0x06, b'\x00' * 128), 150)
        self.assertEqual(_precompile_gas(0x07, b'\x00' * 96), 6000)
        self.assertEqual(_precompile_gas(0x08, b'\x00' * 384),
                         45000 + 2 * 34000)
        self.assertEqual(_precompile_gas(0x02, b'\x00' * 64), 60 + 24)


class TestTwinGasBands(unittest.TestCase):
    """Loose bands so refactors that halve/double real gas get noticed."""

    def test_mimc_band(self):
        from ethsnarks_tpu.mimc.contract import mimc_contract
        data = (123).to_bytes(32, 'big') + (45).to_bytes(32, 'big')
        _, gas = execute(mimc_contract(), data, with_gas=True)
        self.assertTrue(5000 < gas < 40000, gas)

    def test_groth16_verify_band(self):
        from tests.test_verifier import VK_STATIC, PROOF_STATIC
        from ethsnarks_tpu.verifier import VerifyingKey, Proof
        from ethsnarks_tpu.evm_verifier import (
            groth16_verifier_code, encode_calldata)
        vk = VerifyingKey.from_dict(VK_STATIC)
        proof = Proof.from_dict(PROOF_STATIC)
        out, gas = execute(groth16_verifier_code(),
                           bytes(encode_calldata(vk, proof, proof.input)),
                           gas_limit=50_000_000, with_gas=True)
        self.assertEqual(int.from_bytes(out, 'big'), 1)
        # reference headline: ~500k incl. tx+calldata overhead; pure
        # execution with 1 input lands well under that but far above the
        # bare pairing precompile price
        self.assertTrue(120_000 < gas < 500_000, gas)


if __name__ == "__main__":
    unittest.main()
