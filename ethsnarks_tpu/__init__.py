"""ethsnarks_tpu: a TPU-native Groth16 zkSNARK framework.

A from-scratch reimplementation of the capabilities of the ethsnarks
(zkh2018 fork) toolkit, designed TPU-first:

 - host layer (this package root): exact arbitrary-precision field/curve/hash
   primitives, API-compatible with the reference Python library; serves both
   as user API and as the bit-exactness oracle for the device kernels,
 - :mod:`ethsnarks_tpu.ops`: batched JAX/Pallas kernels (limb-based Montgomery
   field arithmetic, MiMC/Poseidon, Baby-JubJub, NTT, Pippenger MSM),
 - :mod:`ethsnarks_tpu.parallel`: multi-chip sharding (pjit/shard_map meshes),
 - :mod:`ethsnarks_tpu.r1cs` + :mod:`ethsnarks_tpu.gadgets`: circuit builder,
 - :mod:`ethsnarks_tpu.groth16`: the Groth16-"zok" (deterministic, nozk)
   proof system; proofs verify under the unmodified reference Verifier.sol
   and Python verifier.
"""

__version__ = "0.1.0"

from .field import FQ, FR, SNARK_SCALAR_FIELD, FR_ORDER  # noqa: F401
