// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

/** Modular arithmetic helpers (inversion via the EIP-198 modexp precompile). */
library ModArith
{
    function ModExp(uint256 base, uint256 exponent, uint256 modulus)
        internal view returns (uint256 result)
    {
        bool ok;
        uint256[6] memory input;
        input[0] = 0x20;
        input[1] = 0x20;
        input[2] = 0x20;
        input[3] = base;
        input[4] = exponent;
        input[5] = modulus;
        uint256[1] memory output;
        assembly {
            ok := staticcall(sub(gas, 2000), 5, input, 0xc0, output, 0x20)
        }
        require(ok, "modexp failed");
        return output[0];
    }

    function InvMod(uint256 value, uint256 modulus)
        internal view returns (uint256)
    {
        return ModExp(value, modulus - 2, modulus);
    }

    function NegMod(uint256 value, uint256 modulus)
        internal pure returns (uint256)
    {
        return modulus - (value % modulus);
    }
}
