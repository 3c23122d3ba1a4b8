"""Metrics (reference: look2hear/metrics/__init__.py:7-10)."""

from .sdr import sdr_matrix, sdr_pit
from .wrapper import MetricsTracker, SPlitMetricsTracker

__all__ = ["MetricsTracker", "SPlitMetricsTracker", "sdr_matrix", "sdr_pit"]
