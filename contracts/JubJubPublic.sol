// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

import "./JubJub.sol";
import "./wNAF.sol";

/** Public wrappers for gas measurement (parity: JubJubPublic.sol). */
contract JubJubPublic
{
    function pointAdd(uint256[2] memory a, uint256[2] memory b)
        public view returns (uint256, uint256)
    {
        uint256[4] memory r = JubJub.EtecAdd(
            JubJub.PointToEtec(a[0], a[1]), JubJub.PointToEtec(b[0], b[1]));
        return JubJub.EtecToPoint(r);
    }

    function scalarMult(uint256[2] memory p, uint256 s)
        public view returns (uint256, uint256)
    {
        return JubJub.scalarMult(p[0], p[1], s);
    }

    function scalarMultNAF(uint256[2] memory p, uint256 s)
        public view returns (uint256, uint256)
    {
        return wNAF.scalarMultNAF5(p[0], p[1], s);
    }
}
