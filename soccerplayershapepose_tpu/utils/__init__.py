"""Shared utilities."""

from soccerplayershapepose_tpu.utils.precision import hp_einsum, hp_matmul  # noqa: F401
