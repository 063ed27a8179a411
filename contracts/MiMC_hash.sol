// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

import "./MiMC_permutation.sol";

/**
 * One-way compression modes over the MiMCpe7 permutation:
 *  - Miyaguchi-Preneel: k' = k + x + E_k(x)   (the Merkle-tree node hash)
 *  - Merkle-Damgard:    k' = E_k(x)
 *
 * Derivation note: ABI and mode equations follow the reference
 * zkh2018/ethsnarks contracts/MiMC.sol (a ~40-line library whose shape is
 * forced by the two compression-mode formulas); behavior is pinned by the
 * executed bytecode twin in tests/test_evm.py.
 */
library MiMC_hash
{
    uint256 internal constant P =
        21888242871839275222246405745257275088548364400416034343698204186575808495617;

    function ScalarField ()
        internal pure returns (uint256)
    {
        return P;
    }

    function MiMCpe7_mp( uint256[] memory in_x, uint256 in_k )
        internal pure returns (uint256)
    {
        uint256 k = in_k;
        for (uint256 i = 0; i < in_x.length; i++)
        {
            k = addmod(
                addmod(k, in_x[i], P),
                MiMC_permutation.MiMCpe7(in_x[i], k), P);
        }
        return k;
    }

    function MiMCpe7_md( uint256[] memory in_x, uint256 in_k )
        internal pure returns (uint256)
    {
        uint256 k = in_k;
        for (uint256 i = 0; i < in_x.length; i++)
        {
            k = MiMC_permutation.MiMCpe7(in_x[i], k);
        }
        return k;
    }
}
