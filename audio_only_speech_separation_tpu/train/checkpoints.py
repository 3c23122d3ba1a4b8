"""Checkpointing: top-k + last + portable best, with auto-resume.

Artifact parity with the reference experiment layout (SURVEY.md §5):
``Experiments/checkpoint/<exp>/`` holds

- ``epoch=N.ckpt`` — top-k full training states (params, opt state, epoch,
  scheduler/early-stop state, config) ranked by the monitored metric
  (reference audio_train.py:95-103, save_top_k=5);
- ``last.ckpt`` — always the latest state (save_last=True);
- ``best_k_models.json`` — monitor-score map (audio_train.py:139-141);
- ``best_model.pth`` — portable serialized model via models.serialize
  (audio_train.py:142-148);
- ``conf.yml`` — config snapshot (audio_train.py:59-63).

Beyond the reference: ``maybe_resume`` restores from last.ckpt
automatically — the reference has save_last but no auto-resume wiring.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(
        self,
        ckpt_dir: str,
        monitor: str = "val_loss",
        mode: str = "min",
        save_top_k: int = 5,
        save_last: bool = True,
        filename: str = "epoch={epoch}",
    ):
        self.ckpt_dir = ckpt_dir
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self.filename = filename
        os.makedirs(ckpt_dir, exist_ok=True)
        self.best_k: Dict[str, float] = {}

    def _path(self, epoch: int) -> str:
        return os.path.join(
            self.ckpt_dir, self.filename.format(epoch=epoch) + ".ckpt"
        )

    @property
    def last_path(self) -> str:
        return os.path.join(self.ckpt_dir, "last.ckpt")

    def _worst(self) -> Tuple[Optional[str], Optional[float]]:
        if not self.best_k:
            return None, None
        sel = max if self.mode == "min" else min
        path = sel(self.best_k, key=self.best_k.get)
        return path, self.best_k[path]

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def save(self, state: Dict[str, Any], epoch: int, metric: float) -> None:
        """Save a candidate checkpoint; evict the worst beyond top-k."""
        state = dict(state)
        state["epoch"] = epoch
        state["monitor"] = {self.monitor: float(metric)}
        blob = pickle.dumps(
            {k: _to_numpy(v) if k in ("params", "opt_state") else v for k, v in state.items()}
        )
        if self.save_last:
            with open(self.last_path, "wb") as f:
                f.write(blob)
        if self.save_top_k == 0:
            return
        worst_path, worst_metric = self._worst()
        if len(self.best_k) < self.save_top_k or self._better(metric, worst_metric):
            path = self._path(epoch)
            with open(path, "wb") as f:
                f.write(blob)
            self.best_k[path] = float(metric)
            if len(self.best_k) > self.save_top_k:
                worst_path, _ = self._worst()
                self.best_k.pop(worst_path, None)
                if os.path.exists(worst_path):
                    os.remove(worst_path)
        self.write_best_k()

    @property
    def best_path(self) -> Optional[str]:
        if not self.best_k:
            return None
        sel = min if self.mode == "min" else max
        return sel(self.best_k, key=self.best_k.get)

    def write_best_k(self) -> None:
        path = os.path.join(self.ckpt_dir, "best_k_models.json")
        with open(path, "w") as f:
            json.dump(self.best_k, f, indent=0)

    def load(self, path: Optional[str] = None) -> Dict[str, Any]:
        path = path or self.best_path
        with open(path, "rb") as f:
            return pickle.load(f)

    def maybe_resume(self) -> Optional[Dict[str, Any]]:
        """Auto-resume: restore last.ckpt if present."""
        if os.path.exists(self.last_path):
            state = self.load(self.last_path)
            # rebuild the top-k map from disk
            bk = os.path.join(self.ckpt_dir, "best_k_models.json")
            if os.path.exists(bk):
                with open(bk) as f:
                    self.best_k = {k: float(v) for k, v in json.load(f).items()}
            return state
        return None
