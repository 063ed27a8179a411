// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

/**
 * Extended Twisted Edwards Coordinate (ETEC) operations for Baby-JubJub,
 * exposed as standalone library functions operating on 4-element arrays
 * (X, Y, T, Z) - parity with the reference's ETEC.sol surface.
 */
library ETEC
{
    uint256 internal constant Q =
        21888242871839275222246405745257275088548364400416034343698204186575808495617;
    uint256 internal constant A = 168700;
    uint256 internal constant D = 168696;

    /** (x, y) affine -> (X, Y, T, Z). */
    function pointToEtec(uint256 x, uint256 y)
        internal pure returns (uint256[4] memory p)
    {
        p[0] = x;
        p[1] = y;
        p[2] = mulmod(x, y, Q);
        p[3] = 1;
    }

    /** (X, Y, T, Z) -> affine via one modexp inversion. */
    function etecToPoint(uint256[4] memory p)
        internal view returns (uint256 x, uint256 y)
    {
        uint256 zinv = invmod(p[3]);
        x = mulmod(p[0], zinv, Q);
        y = mulmod(p[1], zinv, Q);
    }

    function invmod(uint256 value)
        internal view returns (uint256 result)
    {
        bool ok;
        uint256[6] memory input;
        input[0] = 0x20;
        input[1] = 0x20;
        input[2] = 0x20;
        input[3] = value;
        input[4] = Q - 2;
        input[5] = Q;
        uint256[1] memory output;
        assembly {
            ok := staticcall(sub(gas, 2000), 5, input, 0xc0, output, 0x20)
        }
        require(ok, "modexp failed");
        return output[0];
    }

    /** HWCD'08 3.1 unified addition. */
    function etecAdd(uint256[4] memory p1, uint256[4] memory p2)
        internal pure returns (uint256[4] memory p3)
    {
        uint256 x1x2 = mulmod(p1[0], p2[0], Q);
        uint256 y1y2 = mulmod(p1[1], p2[1], Q);
        uint256 dtt = mulmod(mulmod(D, p1[2], Q), p2[2], Q);
        uint256 z1z2 = mulmod(p1[3], p2[3], Q);
        uint256 e = addmod(
            mulmod(addmod(p1[0], p1[1], Q), addmod(p2[0], p2[1], Q), Q),
            Q - addmod(x1x2, y1y2, Q), Q);
        uint256 f = addmod(z1z2, Q - dtt, Q);
        uint256 g = addmod(z1z2, dtt, Q);
        uint256 h = addmod(y1y2, Q - mulmod(A, x1x2, Q), Q);
        p3[0] = mulmod(e, f, Q);
        p3[1] = mulmod(g, h, Q);
        p3[2] = mulmod(e, h, Q);
        p3[3] = mulmod(f, g, Q);
    }

    /** dbl-2008-hwcd doubling. */
    function etecDouble(uint256[4] memory p)
        internal pure returns (uint256[4] memory p3)
    {
        uint256 a_ = mulmod(p[0], p[0], Q);
        uint256 b_ = mulmod(p[1], p[1], Q);
        uint256 c_ = mulmod(2, mulmod(p[3], p[3], Q), Q);
        uint256 d_ = mulmod(A, a_, Q);
        uint256 t = addmod(p[0], p[1], Q);
        uint256 e = addmod(mulmod(t, t, Q), Q - addmod(a_, b_, Q), Q);
        uint256 g = addmod(d_, b_, Q);
        uint256 f = addmod(g, Q - c_, Q);
        uint256 h = addmod(d_, Q - b_, Q);
        p3[0] = mulmod(e, f, Q);
        p3[1] = mulmod(g, h, Q);
        p3[2] = mulmod(e, h, Q);
        p3[3] = mulmod(f, g, Q);
    }
}
