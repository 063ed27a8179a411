"""Multi-chip execution: meshes, sharded MSM, distributed NTT.

The reference is single-node OpenMP (SURVEY.md §2.10); the TPU-native
scale-out equivalents live here: Pippenger MSM with points sharded across
chips and partial sums combined over ICI, and a radix-2 NTT whose
cross-shard butterfly stages exchange chunks with ``ppermute``.
"""

from .mesh import make_mesh  # noqa: F401
