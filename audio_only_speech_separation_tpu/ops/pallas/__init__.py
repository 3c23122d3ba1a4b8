"""Hand-written Pallas TPU kernels for the hot paths."""

from .convtasnet_block import fused_tcn_separator

__all__ = ["fused_tcn_separator"]
