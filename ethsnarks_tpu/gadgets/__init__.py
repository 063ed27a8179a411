"""Circuit gadget library (R1CS builders + witness fillers).

One module per gadget family, mirroring the reference's src/gadgets/ and
src/jubjub/ inventories (SURVEY.md §2.3, §2.4) on top of the TPU-first
builder in :mod:`ethsnarks_tpu.r1cs`.
"""

from .mimc import MiMCe7_gadget, MiMCe5_gadget, MiyaguchiPreneel_OWF, MerkleDamgard_OWF  # noqa: F401
from .merkle import merkle_path_selector, merkle_path_compute, merkle_path_authenticator, merkle_tree_IVs  # noqa: F401
from .basics import (  # noqa: F401
    lookup_1bit_gadget, lookup_2bit_gadget, lookup_3bit_gadget,
    lookup_signed_3bit_gadget, IsNonZero, field2bits_strict, one_of_n,
    packing_gadget, boolean_constrain)
from .poseidon import Poseidon_gadget  # noqa: F401
from .arith import comparison_gadget, subadd_gadget, shamir_poly  # noqa: F401
from .sha256 import sha256_full_gadget_512, sha256_many, bits2blocks_padded  # noqa: F401
