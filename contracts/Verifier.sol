// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

/**
 * Groth16 proof verification over alt_bn128 via the EIP-196/197 precompiles.
 *
 * ABI-compatible with the reference verifier (same flattened layouts):
 *   vk        = [alpha.x, alpha.y,
 *                beta.x.c1, beta.x.c0, beta.y.c1, beta.y.c0,
 *                gamma.(same 4), delta.(same 4)]          (14 words)
 *   gammaABC  = flattened G1 points (x, y pairs), length 2*(n_inputs+1)
 *   proof     = [A.x, A.y, B.x.c1, B.x.c0, B.y.c1, B.y.c0, C.x, C.y]
 *   inputs    = n_inputs field elements, each < r
 *
 * Accepts iff  e(A,B) * e(-alpha,beta) * e(-vk_x,gamma) * e(-C,delta) == 1.
 */
library Verifier
{
    uint256 internal constant SNARK_SCALAR_FIELD =
        21888242871839275222246405745257275088548364400416034343698204186575808495617;
    uint256 internal constant PRIME_Q =
        21888242871839275222246405745257275088696311157297823662689037894645226208583;

    function ScalarField ()
        internal pure returns (uint256)
    {
        return SNARK_SCALAR_FIELD;
    }

    function NegateY( uint256 Y )
        internal pure returns (uint256)
    {
        return PRIME_Q - (Y % PRIME_Q);
    }

    /** G1 addition via precompile 0x06; reverts on failure. */
    function _ecAdd( uint256[4] memory input )
        internal view returns (uint256[2] memory result)
    {
        bool ok;
        assembly {
            ok := staticcall(sub(gas, 2000), 6, input, 0x80, result, 0x40)
        }
        require(ok, "ec-add failed");
    }

    /** G1 scalar multiplication via precompile 0x07; reverts on failure. */
    function _ecMul( uint256[3] memory input )
        internal view returns (uint256[2] memory result)
    {
        bool ok;
        assembly {
            ok := staticcall(sub(gas, 2000), 7, input, 0x60, result, 0x40)
        }
        require(ok, "ec-mul failed");
    }

    function Verify (
        uint256[14] memory in_vk,
        uint256[] memory vk_gammaABC,
        uint256[8] memory in_proof,
        uint256[] memory proof_inputs
    )
        internal view returns (bool)
    {
        require( ((vk_gammaABC.length / 2) - 1) == proof_inputs.length,
                 "input count mismatch" );

        // vk_x = gammaABC[0] + sum_i inputs[i] * gammaABC[i+1]
        uint256[2] memory vk_x = [vk_gammaABC[0], vk_gammaABC[1]];
        for (uint256 i = 0; i < proof_inputs.length; i++)
        {
            require( proof_inputs[i] < SNARK_SCALAR_FIELD,
                     "input >= scalar field" );
            uint256[2] memory term = _ecMul(
                [vk_gammaABC[2 + 2 * i], vk_gammaABC[3 + 2 * i],
                 proof_inputs[i]]);
            vk_x = _ecAdd([vk_x[0], vk_x[1], term[0], term[1]]);
        }

        // Single pairing-product call over four pairs.
        uint256[24] memory input = [
            in_proof[0], in_proof[1],                             // A
            in_proof[2], in_proof[3], in_proof[4], in_proof[5],   // B
            in_vk[0], NegateY(in_vk[1]),                          // -alpha
            in_vk[2], in_vk[3], in_vk[4], in_vk[5],               // beta
            vk_x[0], NegateY(vk_x[1]),                            // -vk_x
            in_vk[6], in_vk[7], in_vk[8], in_vk[9],               // gamma
            in_proof[6], NegateY(in_proof[7]),                    // -C
            in_vk[10], in_vk[11], in_vk[12], in_vk[13]            // delta
        ];

        uint256[1] memory out;
        bool ok;
        assembly {
            ok := staticcall(sub(gas, 2000), 8, input, 768, out, 0x20)
        }
        require(ok, "pairing failed");
        return out[0] != 0;
    }
}
