// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

/**
 * Baby-JubJub twisted Edwards curve operations on-chain.
 *
 *   168700*x^2 + y^2 = 1 + 168696*x^2*y^2  over the snark scalar field.
 *
 * Internally uses extended twisted Edwards coordinates (X, Y, T, Z) with the
 * HWCD'08 unified addition/doubling formulas; affine results are projected
 * with a single modexp-precompile inversion.
 */
library JubJub
{
    uint256 internal constant Q =
        21888242871839275222246405745257275088548364400416034343698204186575808495617;
    uint256 internal constant A = 168700;
    uint256 internal constant D = 168696;

    function Generator ()
        internal pure returns (uint256[2] memory)
    {
        return [
            uint256(16540640123574156134436876038791482806971768689494387082833631921987005038935),
            uint256(20819045374670962167435360035096875258406992893633759881276124905556507972311)
        ];
    }

    function IsOnCurve (uint256 x, uint256 y)
        internal pure returns (bool)
    {
        uint256 xx = mulmod(x, x, Q);
        uint256 yy = mulmod(y, y, Q);
        uint256 lhs = addmod(mulmod(A, xx, Q), yy, Q);
        uint256 rhs = addmod(1, mulmod(mulmod(D, xx, Q), yy, Q), Q);
        return lhs == rhs;
    }

    /** Modular inverse via the EIP-198 modexp precompile. */
    function InvMod (uint256 value)
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

    /** (x, y) -> extended (X, Y, T, Z). */
    function PointToEtec (uint256 x, uint256 y)
        internal pure returns (uint256[4] memory p)
    {
        p[0] = x;
        p[1] = y;
        p[2] = mulmod(x, y, Q);
        p[3] = 1;
    }

    /** Extended -> affine, one inversion. */
    function EtecToPoint (uint256[4] memory p)
        internal view returns (uint256 x, uint256 y)
    {
        uint256 zinv = InvMod(p[3]);
        x = mulmod(p[0], zinv, Q);
        y = mulmod(p[1], zinv, Q);
    }

    function EtecIdentity ()
        internal pure returns (uint256[4] memory)
    {
        return [uint256(0), uint256(1), uint256(0), uint256(1)];
    }

    /** HWCD'08 3.1 unified addition in extended coordinates. */
    function EtecAdd (uint256[4] memory p1, uint256[4] memory p2)
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
    function EtecDouble (uint256[4] memory p)
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

    /** Binary double-and-add scalar multiplication. */
    function scalarMult (uint256 x, uint256 y, uint256 value)
        internal view returns (uint256 rx, uint256 ry)
    {
        uint256[4] memory point = PointToEtec(x, y);
        uint256[4] memory accum = EtecIdentity();

        while (value != 0)
        {
            if (value & 1 != 0)
            {
                accum = EtecAdd(accum, point);
            }
            point = EtecDouble(point);
            value = value / 2;
        }
        (rx, ry) = EtecToPoint(accum);
    }
}
