"""Reference (torch) checkpoint → flax params converters.

The parity goal (BASELINE.md) is that waveforms match the PyTorch reference
within float tolerance when running the SAME weights.  These converters map
the reference's ``best_model.pth`` state dicts
(look2hear/models/utils/base_model.py:71-86 layout) onto our param trees.

Layout conventions translated:
- torch Conv1d weight [out, in, k]  → framed-matmul encoder [k, out] /
  flax Conv kernel [k, in/groups, out]
- torch ConvTranspose1d [in, out, k] → decoder kernel [in, k] / flax [k, in, out]
- torch LSTM weight_ih_l0 [4H, D]    → scan-LSTM w_ih [D, 4H] (gate order
  i,f,g,o is identical); bias_ih + bias_hh fold into one bias
- torch Linear weight [out, in]      → Dense kernel [in, out]
- torch GroupNorm weight/bias        → gamma/beta

Currently covered: ConvTasNet, TasNet (DPRNN/DPTNet modules, group_size=1).
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference best_model.pth → {name: np.ndarray} + model info."""
    import torch

    conf = torch.load(path, map_location="cpu")
    state = conf["state_dict"] if "state_dict" in conf else conf
    return {k: v.detach().cpu().numpy() for k, v in state.items()}, conf


def _lstm(sd, prefix: str, bidirectional: bool):
    """torch LSTM params under `prefix` → scan-LSTM dict."""
    if bidirectional:
        return {
            "w_ih": np.stack(
                [sd[f"{prefix}.weight_ih_l0"].T, sd[f"{prefix}.weight_ih_l0_reverse"].T]
            ),
            "w_hh": np.stack(
                [sd[f"{prefix}.weight_hh_l0"].T, sd[f"{prefix}.weight_hh_l0_reverse"].T]
            ),
            "bias": np.stack(
                [
                    sd[f"{prefix}.bias_ih_l0"] + sd[f"{prefix}.bias_hh_l0"],
                    sd[f"{prefix}.bias_ih_l0_reverse"] + sd[f"{prefix}.bias_hh_l0_reverse"],
                ]
            ),
        }
    return {
        "w_ih": sd[f"{prefix}.weight_ih_l0"].T,
        "w_hh": sd[f"{prefix}.weight_hh_l0"].T,
        "bias": sd[f"{prefix}.bias_ih_l0"] + sd[f"{prefix}.bias_hh_l0"],
    }


def _dense(sd, prefix: str):
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _pointwise(sd, prefix: str):
    """torch Conv1d 1×1 [out, in, 1] → PointwiseConv {kernel [in,out], bias}."""
    out = {"kernel": sd[f"{prefix}.weight"][:, :, 0].T}
    if f"{prefix}.bias" in sd and sd.get(f"{prefix}.bias") is not None:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv1d(sd, prefix: str):
    """torch Conv1d [out, in/groups, k] → flax Conv {kernel [k, in/g, out]}."""
    out = {"Conv_0": {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 1, 0))}}
    if f"{prefix}.bias" in sd:
        out["Conv_0"]["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd, prefix: str):
    """GroupNorm/MLayerNorm weight,bias|gamma,beta → gamma/beta."""
    if f"{prefix}.gamma" in sd:
        return {"gamma": sd[f"{prefix}.gamma"].reshape(-1),
                "beta": sd[f"{prefix}.beta"].reshape(-1)}
    return {"gamma": sd[f"{prefix}.weight"], "beta": sd[f"{prefix}.bias"]}


def _prelu(sd, prefix: str):
    return {"alpha": sd[f"{prefix}.weight"].reshape(-1)}


def convert_convtasnet(sd: Dict[str, np.ndarray], X: int = 8, R: int = 3):
    """Reference ConvTasNet (convtasnet.py:148-219) → flax params."""
    p: Dict = {}
    p["encoder"] = {"kernel": sd["encoder._filters"][:, 0, :].T}
    p["bn_norm"] = _norm(sd, "bottleneck.0")
    p["bn_conv"] = _pointwise(sd, "bottleneck.1")
    for r in range(R):
        for i in range(X):
            pre = f"separation.sep.{r}.tcn.{i}"
            p[f"tcn_{r}_{i}"] = {
                "conv1x1": _pointwise(sd, f"{pre}.conv1x1"),
                "act1": _prelu(sd, f"{pre}.prelu1"),
                "norm1": _norm(sd, f"{pre}.norm1"),
                "dwconv": _conv1d(sd, f"{pre}.dwconv"),
                "act2": _prelu(sd, f"{pre}.prelu2"),
                "norm2": _norm(sd, f"{pre}.norm2"),
                "sconv": _pointwise(sd, f"{pre}.sconv"),
            }
    p["mask_conv"] = _pointwise(sd, "mask")
    p["decoder"] = {"kernel": sd["decoder._filters"][:, 0, :]}
    return {"params": p}


def convert_tasnet_dprnn(sd: Dict[str, np.ndarray], layer: int = 6):
    """Reference TasNet+DPRNN (gc3_network.py, group_size=1) → flax params."""
    p: Dict = {}
    p["encoder"] = {"kernel": sd["encoder.weight"][:, 0, :].T}
    p["bn_norm"] = _norm(sd, "bottleneck.0")
    p["bn_conv"] = {"kernel": sd["bottleneck.1.weight"][:, :, 0].T}
    core: Dict = {}
    for i in range(layer):
        pre = f"seq_model.seq_model"
        core[f"row_rnn_{i}"] = {
            "rnn": _lstm(sd, f"{pre}.row_rnn.{i}.rnn", bidirectional=True),
            "proj": _dense(sd, f"{pre}.row_rnn.{i}.proj"),
        }
        core[f"col_rnn_{i}"] = {
            "rnn": _lstm(sd, f"{pre}.col_rnn.{i}.rnn", bidirectional=True),
            "proj": _dense(sd, f"{pre}.col_rnn.{i}.proj"),
        }
        core[f"row_norm_{i}"] = _norm(sd, f"{pre}.row_norm.{i}")
        core[f"col_norm_{i}"] = _norm(sd, f"{pre}.col_norm.{i}")
    core["out_kernel"] = sd["seq_model.seq_model.output.weight"][:, :, 0, 0].T
    core["out_bias"] = sd["seq_model.seq_model.output.bias"]
    p["seq_model"] = core
    p["mask_conv"] = _pointwise(sd, "mask.0")
    p["decoder"] = {"kernel": sd["decoder.weight"][:, 0, :]}
    return {"params": p}


CONVERTERS: Dict[str, Callable] = {
    "ConvTasNet": convert_convtasnet,
    "TasNet": convert_tasnet_dprnn,
}


def convert(model_name: str, sd: Dict[str, np.ndarray], **kwargs):
    if model_name not in CONVERTERS:
        raise NotImplementedError(
            f"no torch converter for {model_name}; have {sorted(CONVERTERS)}"
        )
    return CONVERTERS[model_name](sd, **kwargs)
