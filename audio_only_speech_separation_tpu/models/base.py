"""Model base utilities: shape contract, serialization, pretrain loading.

Contract (reference: look2hear/models/utils/base_model.py:34-94): every model
maps waveforms [B, T] → [B, n_src, T]; 1-D input passes through as 2-D with
the batch axis squeezed back; [B, 1, T] is squeezed.  ``serialize`` emits
{model_name, state_dict, model_args, infos} and ``from_pretrain``
re-instantiates through the registry — same artifact roles, JAX pytrees
instead of torch state dicts.
"""

from __future__ import annotations

import pickle
from dataclasses import fields as dataclass_fields
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def normalize_input(wav: jnp.ndarray) -> Tuple[jnp.ndarray, bool]:
    """[T] | [B, T] | [B, 1, T] → ([B, T], was_one_d)."""
    if wav.ndim == 1:
        return wav[None, :], True
    if wav.ndim == 3:
        return wav[:, 0, :], False
    return wav, False


def restore_output(out: jnp.ndarray, was_one_d: bool) -> jnp.ndarray:
    return out[0] if was_one_d else out


class BaseModel(nn.Module):
    """Marker base for separation models.

    Subclasses are flax dataclasses whose constructor fields ARE the model
    args (so serialization needs no hand-written ``get_model_args``).
    """

    def model_args(self) -> Dict[str, Any]:
        return {f.name: getattr(self, f.name) for f in dataclass_fields(self)
                if f.name not in ("name", "parent")}


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def serialize(model: BaseModel, params) -> Dict[str, Any]:
    """Portable checkpoint dict (reference base_model.py:71-86)."""
    import jax as _jax

    return {
        "model_name": type(model).__name__,
        "state_dict": _to_numpy(params),
        "model_args": model.model_args(),
        "infos": {
            "software_versions": {
                "jax_version": _jax.__version__,
                "framework": "audio_only_speech_separation_tpu",
            }
        },
    }


def save_serialized(conf: Dict[str, Any], path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(conf, f)


def from_pretrain(pretrained_model_conf_or_path, **kwargs):
    """Rebuild (model, params) from a serialized checkpoint.

    Accepts a path or an already-loaded dict (reference base_model.py:59-69).
    Extra kwargs override the stored model args.
    """
    from . import get  # registry

    if isinstance(pretrained_model_conf_or_path, (str, bytes)):
        with open(pretrained_model_conf_or_path, "rb") as f:
            conf = pickle.load(f)
    else:
        conf = pretrained_model_conf_or_path
    model_class = get(conf["model_name"])
    args = dict(conf.get("model_args") or {})
    args.update(kwargs)
    valid = {f.name for f in dataclass_fields(model_class)}
    args = {k: v for k, v in args.items() if k in valid}
    model = model_class(**args)
    params = jax.tree_util.tree_map(jnp.asarray, conf["state_dict"])
    return model, params
