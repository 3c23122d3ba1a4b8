"""Loss registry (reference: look2hear/losses/__init__.py:8-36)."""

from .matrix import (
    PairwiseNegSDR,
    SingleSrcNegSDR,
    MultiSrcNegSDR,
    pairwise_neg_sisdr,
    pairwise_neg_sdsdr,
    pairwise_neg_snr,
    singlesrc_neg_sisdr,
    singlesrc_neg_sdsdr,
    singlesrc_neg_snr,
    multisrc_neg_sisdr,
    multisrc_neg_sdsdr,
    multisrc_neg_snr,
)
from .pit import PITLossWrapper
from .mixit import MixITLossWrapper

__all__ = [
    "PairwiseNegSDR",
    "SingleSrcNegSDR",
    "MultiSrcNegSDR",
    "PITLossWrapper",
    "MixITLossWrapper",
    "pairwise_neg_sisdr",
    "pairwise_neg_sdsdr",
    "pairwise_neg_snr",
    "singlesrc_neg_sisdr",
    "singlesrc_neg_sdsdr",
    "singlesrc_neg_snr",
    "multisrc_neg_sisdr",
    "multisrc_neg_sdsdr",
    "multisrc_neg_snr",
]


def get(identifier):
    """String → loss object, mirroring the reference's getattr reflection."""
    if callable(identifier):
        return identifier
    if isinstance(identifier, str):
        obj = globals().get(identifier)
        if obj is None:
            raise ValueError(f"Could not interpret loss identifier: {identifier}")
        return obj
    raise ValueError(f"Could not interpret loss identifier: {identifier}")
