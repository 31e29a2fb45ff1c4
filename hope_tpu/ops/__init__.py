"""Pallas TPU kernels for the hot rollout ops."""
from .mask_steps import mask_step_lengths

__all__ = ["mask_step_lengths"]
