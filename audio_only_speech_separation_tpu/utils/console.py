"""Console helpers (reference: look2hear/utils/lightning_utils.py:19-101).

``print_only`` gates output to host 0 — the JAX-native replacement for
Lightning's @rank_zero_only.
"""

from __future__ import annotations


def _is_rank_zero() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def print_only(message: str) -> None:
    if _is_rank_zero():
        try:
            from rich import print as rprint

            rprint(message)
        except ImportError:
            print(message)
