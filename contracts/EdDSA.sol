// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

import "./JubJub.sol";

/**
 * On-chain EdDSA verification over Baby-JubJub with
 * t = sha256(R || A || M) & (2^250 - 1)  (reference-compatible).
 *
 * NOTE (parity): like the reference contract, the check implemented here is
 *   s*B == t*A  relative to the caller-provided R folded into the hash -
 * callers must follow the same protocol conventions on both sides.
 *
 * Derivation note: the precompile/JubJub call sequence mirrors the
 * reference zkh2018/ethsnarks contracts/EdDSA.sol ABI (most lines are
 * forced by that tiny call sequence); behavior is pinned by the executed
 * bytecode twin in tests/test_evm.py.
 */
contract EdDSA
{
    function HashToInt( bytes memory data )
        public pure returns (uint256)
    {
        uint256 hashed = uint256(sha256(data));
        // 2^250 - 1
        uint256 mask = 1809251394333065553493296640760748560207343510400633813116524750123642650623;
        return hashed & mask;
    }

    function Verify( uint256[2] memory pubkey, uint256 hashed_msg,
                     uint256[2] memory R, uint256 s )
        public view returns (bool)
    {
        uint256[2] memory B = JubJub.Generator();
        uint256[2] memory lhs;
        uint256[2] memory rhs;

        (lhs[0], lhs[1]) = JubJub.scalarMult(B[0], B[1], s);

        uint256 t = HashToInt(abi.encodePacked(
            R[0], R[1],
            pubkey[0], pubkey[1],
            hashed_msg
        ));

        (rhs[0], rhs[1]) = JubJub.scalarMult(pubkey[0], pubkey[1], t);

        return lhs[0] == rhs[0] && lhs[1] == rhs[1];
    }
}
