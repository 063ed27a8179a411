"""Batched TPU kernels: field, hash, curve, NTT, and MSM operations."""

from .fp import Fp, Fr, Fq, BN254_R, BN254_Q  # noqa: F401
