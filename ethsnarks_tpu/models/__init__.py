"""Flagship circuit "models": end-to-end provable workloads.

Analogous to the reference's application layer (Miximus-style Merkle
membership, hash preimage proofs, batched signature verification) - each
model builds a circuit from :mod:`ethsnarks_tpu.gadgets`, fills its witness
(bulk-hashing on device where it pays), and proves via
:mod:`ethsnarks_tpu.groth16`.
"""

from .merkle_membership import MerkleMembership  # noqa: F401
from .mimc_preimage import MiMCPreimage  # noqa: F401
from .eddsa_verify import (  # noqa: F401
    EdDSAVerify, eddsa_open, pureeddsa_open, hasheddsa_open)
