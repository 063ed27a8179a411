// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

/**
 * Packing helpers bridging EVM words and libsnark bit-packed field elements:
 * N 256-bit words -> ceil(256N/253) field elements of 253 bits each,
 * mirroring libff::pack_int_vector_into_field_element_vector (and the
 * Python utils.bytes_to_field_elements convention).
 *
 * Derivation note: the packing order and ABI mirror the reference
 * zkh2018/ethsnarks contracts/SnarkUtils.sol (the 253-bit packing spec
 * forces most of the bit arithmetic); behavior is pinned by the executed
 * bytecode twin in tests/test_evm_snarkutils.py.
 */
library SnarkUtils
{
    function _bits(uint256 self, uint256 index, uint256 numBits)
        internal pure returns (uint256)
    {
        require( index + numBits <= 256, "bit range" );
        return (self / 2**index) & (2**numBits - 1);
    }

    function PackWords (uint256[] memory in_words, uint256[] memory out_words)
        internal pure
    {
        uint256 i = 0;
        uint256 source = ReverseBits(in_words[0]);
        uint256 source_offset = 0;

        for (uint256 o = 0; o < out_words.length; o++)
        {
            uint256 dest = 0;
            uint256 dest_offset = 0;
            while (dest_offset < 253)
            {
                uint256 needed = 253 - dest_offset;
                uint256 avail = 256 - source_offset;
                uint256 n = needed < avail ? needed : avail;

                dest |= _bits(source, source_offset, n) * (2**dest_offset);
                source_offset += n;
                dest_offset += n;

                if (source_offset >= 256)
                {
                    i += 1;
                    if (i >= in_words.length) {
                        break;
                    }
                    source = ReverseBits(in_words[i]);
                    source_offset = 0;
                }
            }
            out_words[o] = dest;
        }
    }

    /** Bit-reverse a 256-bit word (parallel swap, log steps). */
    function ReverseBits( uint256 v )
        internal pure returns (uint256)
    {
        uint256 s = 256;
        uint256 mask = ~uint256(0);
        while ((s >>= 1) > 0)
        {
            mask ^= (mask << s);
            v = ((v >> s) & mask) | ((v << s) & ~mask);
        }
        return v;
    }
}
