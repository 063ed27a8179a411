// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

import "./ETEC.sol";

/**
 * Windowed-NAF scalar multiplication on Baby-JubJub (window 5): the
 * gas-optimized path for on-chain variable-base multiplication, parity with
 * the reference wNAF.sol capability.
 */
library wNAF
{
    uint256 internal constant Q =
        21888242871839275222246405745257275088548364400416034343698204186575808495617;

    /** Precompute odd multiples +-{1,3,...,15} * P; index i holds (2i+1)P. */
    function buildWindow(uint256 x, uint256 y)
        internal pure returns (uint256[4][8] memory w)
    {
        uint256[4] memory p = ETEC.pointToEtec(x, y);
        uint256[4] memory twoP = ETEC.etecDouble(p);
        w[0] = p;
        for (uint256 i = 1; i < 8; i++)
        {
            w[i] = ETEC.etecAdd(w[i - 1], twoP);
        }
    }

    function negate(uint256[4] memory p)
        internal pure returns (uint256[4] memory r)
    {
        uint256 q = Q;
        r[0] = q - (p[0] % q);
        r[1] = p[1];
        r[2] = q - (p[2] % q);
        r[3] = p[3];
    }

    /** Scalar multiplication via width-5 wNAF digits. */
    function scalarMultNAF5(uint256 x, uint256 y, uint256 value)
        internal view returns (uint256 rx, uint256 ry)
    {
        uint256[4][8] memory w = buildWindow(x, y);

        // compute wNAF digits (LSB first) into a fixed buffer
        int256[256] memory digits;
        uint256 n = 0;
        uint256 k = value;
        while (k > 0)
        {
            int256 d = 0;
            if (k & 1 != 0)
            {
                uint256 c = k & 31;               // mod 32
                if (c > 16) {
                    d = int256(c) - 32;
                    k = k + (32 - c);
                } else {
                    d = int256(c);
                    k = k - c;
                }
            }
            digits[n++] = d;
            k = k / 2;
        }

        uint256[4] memory acc;
        acc[0] = 0;
        acc[1] = 1;
        acc[2] = 0;
        acc[3] = 1;
        for (uint256 i = n; i > 0; i--)
        {
            acc = ETEC.etecDouble(acc);
            int256 d = digits[i - 1];
            if (d > 0) {
                acc = ETEC.etecAdd(acc, w[uint256(d) / 2]);
            } else if (d < 0) {
                acc = ETEC.etecAdd(acc, negate(w[uint256(-d) / 2]));
            }
        }
        (rx, ry) = ETEC.etecToPoint(acc);
    }
}
