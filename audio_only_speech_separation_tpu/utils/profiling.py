"""Profiling + analytic cost counting — the ptflops replacement.

The reference measures MACs/params with ptflops (unit_tests.py:22,
evaluated_mac_params.py:49) and wall clock by hand (unit_tests.py:27-42).
Here:

- ``count_params`` walks the param pytree;
- ``estimate_cost`` asks XLA itself (``lower(...).cost_analysis()``) for
  flops/bytes — exact for the compiled graph, no per-layer hooks;
- ``profile_trace`` wraps ``jax.profiler.trace`` for on-TPU timeline
  captures (the aux subsystem the reference lacks, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def estimate_cost(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis of ``jit(fn)(*args)``: flops, bytes accessed."""
    lowered = jax.jit(fn).lower(*args)
    try:
        compiled = lowered.compile()
        analysis = compiled.cost_analysis()
    except Exception:
        analysis = lowered.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0] if analysis else {}
    out = {}
    if analysis:
        for key in ("flops", "bytes accessed"):
            norm = key.replace(" ", "_")
            if key in analysis:
                out[norm] = float(analysis[key])
            else:  # some backends suffix keys (e.g. 'bytes accessed0{}')
                matches = [v for k, v in analysis.items() if k.startswith(key)]
                if matches:
                    out[norm] = float(max(matches))
    return out


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device timeline viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats for the train loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self.times = self.times[-self.window :]
            self._t0 = None

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")
