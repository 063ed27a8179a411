// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

/**
 * MiMC-p/p permutation over the alt_bn128 scalar field, loop form.
 *
 * Round constants are the iterated-Keccak chain seeded with
 * keccak256("mimc") - identical to the Python/C++/TPU implementations,
 * making E_k(x) agree bit-for-bit across all four (cross-pinned by
 * tests/test_evm.py against the host oracle).
 */
library MiMC_permutation
{
    uint256 internal constant P =
        21888242871839275222246405745257275088548364400416034343698204186575808495617;

    // keccak256("mimc")
    uint256 internal constant SEED =
        0xb6e489e6b37224a50bebfddbe7d89fa8fdcaa84304a70bd13f79b5d9f7951e9e;

    function ScalarField()
        internal pure returns (uint256)
    {
        return P;
    }

    /** 91 rounds of x <- (x + k + c_i)^7, then + k. */
    function MiMCpe7( uint256 in_x, uint256 in_k )
        internal pure returns (uint256 out_x)
    {
        assembly {
            let p := 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001
            let scratch := mload(0x40)
            mstore(0x40, add(scratch, 32))
            mstore(scratch, 0xb6e489e6b37224a50bebfddbe7d89fa8fdcaa84304a70bd13f79b5d9f7951e9e)

            let x := in_x
            for { let r := 0 } lt(r, 91) { r := add(r, 1) } {
                mstore(scratch, keccak256(scratch, 32))
                let t := addmod(addmod(x, mload(scratch), p), in_k, p)
                let t2 := mulmod(t, t, p)
                let t4 := mulmod(t2, t2, p)
                x := mulmod(mulmod(t4, t2, p), t, p)
            }
            out_x := addmod(x, in_k, p)
        }
    }

    /** 110 rounds of x <- (x + k + c_i)^5, then + k. */
    function MiMCpe5( uint256 in_x, uint256 in_k )
        internal pure returns (uint256 out_x)
    {
        assembly {
            let p := 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001
            let scratch := mload(0x40)
            mstore(0x40, add(scratch, 32))
            mstore(scratch, 0xb6e489e6b37224a50bebfddbe7d89fa8fdcaa84304a70bd13f79b5d9f7951e9e)

            let x := in_x
            for { let r := 0 } lt(r, 110) { r := add(r, 1) } {
                mstore(scratch, keccak256(scratch, 32))
                let t := addmod(addmod(x, mload(scratch), p), in_k, p)
                let t2 := mulmod(t, t, p)
                let t4 := mulmod(t2, t2, p)
                x := mulmod(t4, t, p)
            }
            out_x := addmod(x, in_k, p)
        }
    }
}
