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

Covered: all 8 registered families — ConvTasNet, TasNet (DPRNN/DPTNet/TCN/
SudoRMRF modules incl. GC_* variants), Sepformer, BSRNN, TDANet, AFRCNN,
DPRNNTasNet (legacy), Sandglasset.
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


def _layer_norm(sd, prefix: str):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mha(sd, prefix: str):
    return {
        "in_proj_weight": sd[f"{prefix}.in_proj_weight"],
        "in_proj_bias": sd[f"{prefix}.in_proj_bias"],
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def convert_tasnet_dptnet(sd: Dict[str, np.ndarray], layer: int = 6):
    """Reference TasNet+DPTNet (gc3_network.py + dptnet.py, group_size=1)."""
    p: Dict = {}
    p["encoder"] = {"kernel": sd["encoder.weight"][:, 0, :].T}
    p["bn_norm"] = _norm(sd, "bottleneck.0")
    p["bn_conv"] = {"kernel": sd["bottleneck.1.weight"][:, :, 0].T}
    core: Dict = {}
    for i in range(layer):
        for kind in ("row", "col"):
            pre = f"seq_model.seq_model.{kind}_xfmr.{i}.transformer"
            core[f"{kind}_xfmr_{i}"] = {
                "self_attn": _mha(sd, f"{pre}.self_attn"),
                "norm1": _layer_norm(sd, f"{pre}.norm1"),
                "ffn_lstm": _lstm(sd, f"{pre}.linear1", bidirectional=True),
                "ffn_proj": _dense(sd, f"{pre}.linear2"),
                "norm2": _layer_norm(sd, f"{pre}.norm2"),
            }
    core["out_kernel"] = sd["seq_model.seq_model.output.weight"][:, :, 0, 0].T
    core["out_bias"] = sd["seq_model.seq_model.output.bias"]
    p["seq_model"] = core
    p["mask_conv"] = _pointwise(sd, "mask.0")
    p["decoder"] = {"kernel": sd["decoder.weight"][:, 0, :]}
    return {"params": p}


def _res_rnn(sd, prefix: str, bidirectional: bool = True):
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "rnn": _lstm(sd, f"{prefix}.rnn", bidirectional=bidirectional),
        "proj": _dense(sd, f"{prefix}.proj"),
    }


def convert_bsrnn(
    sd: Dict[str, np.ndarray],
    nband: int = 8,
    num_repeat: int = 8,
    num_layer: int = 1,
    bi_comm: bool = True,
):
    """Reference BSRNN (bsrnn.py:63-242)."""
    p: Dict = {}
    for i in range(nband):
        p[f"bn_norm_{i}"] = _norm(sd, f"BN.{i}.0")
        p[f"bn_conv_{i}"] = _pointwise(sd, f"BN.{i}.1")
    for r in range(num_repeat):
        sep: Dict = {}
        for j in range(num_layer):
            sep[f"band_rnn_{j}"] = _res_rnn(sd, f"separator.{r}.band_rnn.{j}")
        sep["band_comm"] = _res_rnn(sd, f"separator.{r}.band_comm", bidirectional=bi_comm)
        p[f"separator_{r}"] = sep
    for i in range(nband):
        p[f"mask_norm_{i}"] = _norm(sd, f"mask.{i}.0")
        p[f"mask_c1_{i}"] = _pointwise(sd, f"mask.{i}.1")
        p[f"mask_c2_{i}"] = _pointwise(sd, f"mask.{i}.3")
        p[f"mask_c3_{i}"] = _pointwise(sd, f"mask.{i}.5")
        p[f"mask_act_{i}"] = _prelu(sd, f"mask.{i}.6")
        p[f"mask_c4_{i}"] = _pointwise(sd, f"mask.{i}.7")
    return {"params": p}


def convert_sepformer(
    sd: Dict[str, np.ndarray],
    masknet_numlayers: int = 2,
    intra_numlayers: int = 8,
    inter_numlayers: int = 8,
):
    """Reference Sepformer (sepformer.py:849-1020)."""
    p: Dict = {}
    p["encoder"] = {"kernel": sd["encoder.conv1d.weight"][:, 0, :].T}
    p["mask_norm"] = _norm(sd, "masknet.norm")
    p["mask_conv1d"] = {"kernel": sd["masknet.conv1d.weight"][:, :, 0].T}
    for i in range(masknet_numlayers):
        blk: Dict = {}
        for side, n_layers in (("intra", intra_numlayers), ("inter", inter_numlayers)):
            mdl: Dict = {}
            for j in range(n_layers):
                pre = f"masknet.dual_mdl.{i}.{side}_mdl.mdl.layers.{j}"
                mdl[f"layer_{j}"] = {
                    "self_att": _mha(sd, f"{pre}.self_att.att"),
                    "norm1": _layer_norm(sd, f"{pre}.norm1"),
                    "norm2": _layer_norm(sd, f"{pre}.norm2"),
                    "ffn1": _dense(sd, f"{pre}.pos_ffn.ffn.0"),
                    "ffn2": _dense(sd, f"{pre}.pos_ffn.ffn.3"),
                }
            mdl["norm"] = _layer_norm(sd, f"masknet.dual_mdl.{i}.{side}_mdl.mdl.norm")
            blk[f"{side}_mdl"] = mdl
            blk[f"{side}_norm"] = _norm(sd, f"masknet.dual_mdl.{i}.{side}_norm")
        p[f"dual_mdl_{i}"] = blk
    p["mask_prelu"] = _prelu(sd, "masknet.prelu")
    p["conv2d_kernel"] = sd["masknet.conv2d.weight"][:, :, 0, 0].T
    p["conv2d_bias"] = sd["masknet.conv2d.bias"]
    p["output"] = _pointwise(sd, "masknet.output.0")
    p["output_gate"] = _pointwise(sd, "masknet.output_gate.0")
    p["end_conv1x1"] = {"kernel": sd["masknet.end_conv1x1.weight"][:, :, 0].T}
    p["decoder"] = {"kernel": sd["decoder.weight"][:, 0, :]}
    return {"params": p}


def _conv_norm(sd, prefix: str):
    """Reference ConvNorm/DilatedConvNorm {conv, norm} pair."""
    return {"conv": _conv1d(sd, f"{prefix}.conv"), "norm": _norm(sd, f"{prefix}.norm")}


def _conv_norm_act(sd, prefix: str):
    out = _conv_norm(sd, prefix)
    out["act"] = _prelu(sd, f"{prefix}.act")
    return out


def _gate(sd, prefix: str):
    """Depthwise 1×1 concat_block Sequential(conv, PReLU).

    The conv is Conv1d [C,1,1] in TDANet/AFRCNN and Conv2d [C,1,1,1] in the
    dual-path unfold gates — both flatten to a per-channel scale."""
    return {
        "weight": sd[f"{prefix}.0.weight"].reshape(-1),
        "bias": sd[f"{prefix}.0.bias"],
        "act": _prelu(sd, f"{prefix}.1"),
    }


def convert_afrcnn(sd: Dict[str, np.ndarray], upsampling_depth: int = 5):
    """Reference AFRCNN (afrcnn.py:246-364)."""
    D = upsampling_depth
    p: Dict = {}
    p["encoder"] = _conv1d(sd, "encoder")
    p["ln"] = _norm(sd, "ln")
    p["bottleneck"] = _pointwise(sd, "bottleneck")
    blocks: Dict = {}
    blocks["proj_1x1"] = _conv_norm_act(sd, "sm.blocks.proj_1x1")
    for k in range(D):
        blocks[f"spp_{k}"] = _conv_norm(sd, f"sm.blocks.spp_dw.{k}")
    for i in range(1, D):
        # fuse_layers[i][0] is the stride-2 downsampler from scale i-1
        blocks[f"down_{i}"] = _conv_norm(sd, f"sm.blocks.fuse_layers.{i}.0")
    for i in range(D):
        blocks[f"concat_{i}"] = _conv_norm_act(sd, f"sm.blocks.concat_layer.{i}")
    blocks["last_layer"] = _conv_norm_act(sd, "sm.blocks.last_layer.0")
    blocks["res_conv"] = _pointwise(sd, "sm.blocks.res_conv")
    p["sm"] = {"blocks": blocks, "concat_block": _gate(sd, "sm.concat_block")}
    p["mask_act"] = _prelu(sd, "mask_net.0")
    p["mask_conv"] = _pointwise(sd, "mask_net.1")
    p["decoder"] = {"kernel": sd["decoder.weight"]}
    return {"params": p}


def convert_tdanet(sd: Dict[str, np.ndarray], upsampling_depth: int = 5):
    """Reference TDANet (tdanet.py:407-527, unfold=True)."""
    D = upsampling_depth
    p: Dict = {}
    p["encoder"] = _conv1d(sd, "encoder")
    p["ln"] = _norm(sd, "ln")
    p["bottleneck"] = _pointwise(sd, "bottleneck")
    unet: Dict = {}
    unet["proj_1x1"] = _conv_norm_act(sd, "sm.unet.proj_1x1")
    for k in range(D):
        unet[f"spp_{k}"] = _conv_norm(sd, f"sm.unet.spp_dw.{k}")
    for i in range(D):
        unet[f"fus_{i}"] = {
            "local_embedding": _conv_norm(sd, f"sm.unet.loc_glo_fus.{i}.local_embedding"),
            "global_embedding": _conv_norm(sd, f"sm.unet.loc_glo_fus.{i}.global_embedding"),
            "global_act": _conv_norm(sd, f"sm.unet.loc_glo_fus.{i}.global_act"),
        }
    for i in range(D - 1):
        unet[f"last_{i}"] = {
            "local_embedding": _conv_norm(sd, f"sm.unet.last_layer.{i}.local_embedding"),
            "global_embedding": _conv_norm(sd, f"sm.unet.last_layer.{i}.global_embedding"),
            "global_act": _conv_norm(sd, f"sm.unet.last_layer.{i}.global_act"),
        }
    unet["globalatt"] = {
        "attn": {
            "attn_in_norm": _layer_norm(sd, "sm.unet.globalatt.attn.attn_in_norm"),
            "attn": _mha(sd, "sm.unet.globalatt.attn.attn"),
            "norm": _layer_norm(sd, "sm.unet.globalatt.attn.norm"),
        },
        "mlp": {
            "fc1": _conv_norm(sd, "sm.unet.globalatt.mlp.fc1"),
            "dwconv": _conv1d(sd, "sm.unet.globalatt.mlp.dwconv"),
            "fc2": _conv_norm(sd, "sm.unet.globalatt.mlp.fc2"),
        },
    }
    unet["res_conv"] = _pointwise(sd, "sm.unet.res_conv")
    p["sm"] = {"unet": unet, "concat_block": _gate(sd, "sm.concat_block")}
    p["mask_act"] = _prelu(sd, "mask_net.0")
    p["mask_conv"] = _pointwise(sd, "mask_net.1")
    p["decoder"] = {"kernel": sd["decoder.weight"]}
    return {"params": p}


def convert_dprnn_tasnet(sd: Dict[str, np.ndarray], layer: int = 6):
    """Reference DPRNNTasNet (dprnn_old.py:400-516)."""
    p: Dict = {}
    p["encoder"] = {"kernel": sd["encoder._filters"][:, 0, :].T}
    p["freq_norm"] = _norm(sd, "freq_norm")
    p["BN"] = {"kernel": sd["freq_separator.BN.weight"][:, :, 0].T}
    core: Dict = {}
    for i in range(layer):
        core[f"row_rnn_{i}"] = {
            "rnn": _lstm(sd, f"freq_separator.DPRNN.row_rnn.{i}.rnn", bidirectional=True),
            "proj": _dense(sd, f"freq_separator.DPRNN.row_rnn.{i}.proj"),
        }
        core[f"col_rnn_{i}"] = {
            "rnn": _lstm(sd, f"freq_separator.DPRNN.col_rnn.{i}.rnn", bidirectional=True),
            "proj": _dense(sd, f"freq_separator.DPRNN.col_rnn.{i}.proj"),
        }
        core[f"row_norm_{i}"] = _norm(sd, f"freq_separator.DPRNN.row_norm.{i}")
        core[f"col_norm_{i}"] = _norm(sd, f"freq_separator.DPRNN.col_norm.{i}")
    core["out_kernel"] = sd["freq_separator.DPRNN.output.weight"][:, :, 0, 0].T
    core["out_bias"] = sd["freq_separator.DPRNN.output.bias"]
    p["DPRNN"] = core
    p["decoder"] = {"kernel": sd["decoder._filters"][:, 0, :]}
    return {"params": p}


def convert_sandglasset(sd: Dict[str, np.ndarray], n_repeats: int = 6):
    """Reference Sandglasset (sandglasset.py:262-434)."""
    p: Dict = {}
    p["encoder"] = {"kernel": sd["encoder.weight"][:, 0, :].T}
    p["enc_LN"] = _norm(sd, "enc_LN")
    p["bottleneck"] = {"kernel": sd["bottleneck.weight"][:, :, 0].T}
    p["seg_norm"] = _norm(sd, "seg_norm")
    for i in range(n_repeats):
        p[f"sep_{i}"] = {
            "intra_rnn": _lstm(sd, f"sep_net.{i}.intra_RNN.rnn", bidirectional=True),
            "intra_linear": _dense(sd, f"sep_net.{i}.intra_linear"),
            "intra_norm": _norm(sd, f"sep_net.{i}.intra_norm"),
            "attn_in_norm": _layer_norm(sd, f"sep_net.{i}.inter_RNN.attn_in_norm"),
            "attn_layer": {
                "attn": _mha(sd, f"sep_net.{i}.inter_RNN.attn_layer.0.attn"),
                "norm": _layer_norm(sd, f"sep_net.{i}.inter_RNN.attn_layer.0.norm"),
            },
            "inter_norm": _norm(sd, f"sep_net.{i}.inter_norm"),
        }
    p["first_out_act"] = _prelu(sd, "first_out.0")
    p["first_out_kernel"] = sd["first_out.1.weight"][:, :, 0, 0].T
    p["first_out_bias"] = sd["first_out.1.bias"]
    p["out_norm"] = _norm(sd, "out_norm")
    p["decoder_kernel"] = sd["decoder.basis_lin.weight"].T
    return {"params": p}


CONVERTERS: Dict[str, Callable] = {
    "ConvTasNet": convert_convtasnet,
    "TasNet": convert_tasnet_dprnn,
    "TasNetDPTNet": convert_tasnet_dptnet,
    "BSRNN": convert_bsrnn,
    "Sepformer": convert_sepformer,
    "AFRCNN": convert_afrcnn,
    "TDANet": convert_tdanet,
    "DPRNNTasNet": convert_dprnn_tasnet,
    "Sandglasset": convert_sandglasset,
}


def convert(model_name: str, sd: Dict[str, np.ndarray], **kwargs):
    if model_name not in CONVERTERS:
        raise NotImplementedError(
            f"no torch converter for {model_name}; have {sorted(CONVERTERS)}"
        )
    return CONVERTERS[model_name](sd, **kwargs)


# ---------------------------------------------------------------------------
# TasNet variants: GroupComm (group_size>1), unfold weight sharing, and the
# TCN / SudoRM-RF separator modules (reference gc3_network.py:58-96).
# ---------------------------------------------------------------------------


def _projrnn(sd, prefix: str, bidirectional: bool = True):
    return {
        "rnn": _lstm(sd, f"{prefix}.rnn", bidirectional=bidirectional),
        "proj": _dense(sd, f"{prefix}.proj"),
    }


def _tac(sd, prefix: str):
    """Reference TAC (gc3_basics.py:28-60) → blocks.tac.TAC params."""
    return {
        "transform": _dense(sd, f"{prefix}.TAC_input.0"),
        "act_in": _prelu(sd, f"{prefix}.TAC_input.1"),
        "average": _dense(sd, f"{prefix}.TAC_mean.0"),
        "act_mean": _prelu(sd, f"{prefix}.TAC_mean.1"),
        "concat": _dense(sd, f"{prefix}.TAC_output.0"),
        "act_out": _prelu(sd, f"{prefix}.TAC_output.1"),
        "norm": _norm(sd, f"{prefix}.TAC_norm"),
    }


def _gc_rnn(sd, prefix: str, num_layers: int = 2):
    out = {}
    for i in range(num_layers):
        out[f"tac_{i}"] = _tac(sd, f"{prefix}.TAC.{i}")
        out[f"rnn_{i}"] = _projrnn(sd, f"{prefix}.rnn.{i}", bidirectional=True)
        out[f"norm_{i}"] = _norm(sd, f"{prefix}.LN.{i}")
    return out


def convert_tasnet(
    sd: Dict[str, np.ndarray],
    module: str = "DPRNN",
    layer: int = 6,
    group_size: int = 1,
    unfold: bool = False,
):
    """General TasNet converter covering all separator modules + GroupComm
    + unfold (supersedes convert_tasnet_dprnn/convert_tasnet_dptnet)."""
    p: Dict = {}
    p["encoder"] = {"kernel": sd["encoder.weight"][:, 0, :].T}
    p["bn_norm"] = _norm(sd, "bottleneck.0")
    p["bn_conv"] = {"kernel": sd["bottleneck.1.weight"][:, :, 0].T}
    if group_size > 1:
        p["context_enc"] = _gc_rnn(sd, "context_enc", 2)
        p["context_dec"] = _gc_rnn(sd, "context_dec", 2)

    if module in ("DPRNN", "DPTNet"):
        pre = "seq_model.seq_model"
        core: Dict = {}
        if group_size > 1:
            for i in range(layer):
                core[f"tac_{i}"] = _tac(sd, f"{pre}.TAC.{i}")
        if module == "DPRNN":
            if unfold:
                core["row_rnn_shared"] = _projrnn(sd, f"{pre}.row_rnn.0")
                core["col_rnn_shared"] = _projrnn(sd, f"{pre}.col_rnn.0")
                core["row_norm_shared"] = _norm(sd, f"{pre}.row_norm.0")
                core["col_norm_shared"] = _norm(sd, f"{pre}.col_norm.0")
                core["concat_block"] = _gate(sd, f"{pre}.concat_block")
            else:
                for i in range(layer):
                    core[f"row_rnn_{i}"] = _projrnn(sd, f"{pre}.row_rnn.{i}")
                    core[f"col_rnn_{i}"] = _projrnn(sd, f"{pre}.col_rnn.{i}")
                    core[f"row_norm_{i}"] = _norm(sd, f"{pre}.row_norm.{i}")
                    core[f"col_norm_{i}"] = _norm(sd, f"{pre}.col_norm.{i}")
        else:  # DPTNet

            def _xfmr(prefix):
                return {
                    "self_attn": _mha(sd, f"{prefix}.self_attn"),
                    "norm1": _layer_norm(sd, f"{prefix}.norm1"),
                    "ffn_lstm": _lstm(sd, f"{prefix}.linear1", bidirectional=True),
                    "ffn_proj": _dense(sd, f"{prefix}.linear2"),
                    "norm2": _layer_norm(sd, f"{prefix}.norm2"),
                }

            if unfold:
                core["row_xfmr_shared"] = _xfmr(f"{pre}.row_xfmr.0.transformer")
                core["col_xfmr_shared"] = _xfmr(f"{pre}.col_xfmr.0.transformer")
                core["concat_block"] = _gate(sd, f"{pre}.concat_block")
            else:
                for i in range(layer):
                    core[f"row_xfmr_{i}"] = _xfmr(f"{pre}.row_xfmr.{i}.transformer")
                    core[f"col_xfmr_{i}"] = _xfmr(f"{pre}.col_xfmr.{i}.transformer")
        core["out_kernel"] = sd[f"{pre}.output.weight"][:, :, 0, 0].T
        core["out_bias"] = sd[f"{pre}.output.bias"]
        p["seq_model"] = core

    elif module in ("TCN", "GC_TCN"):
        pre = "seq_model.tcn"
        core = {}
        n_blocks = layer * 2  # stack=2 (gc3_network.py:82)
        if module == "TCN":
            core["LN"] = _norm(sd, f"{pre}.LN")
            core["BN"] = _pointwise(sd, f"{pre}.BN")
            core["out_act"] = _prelu(sd, f"{pre}.output.0")
            core["out_conv"] = _pointwise(sd, f"{pre}.output.1")
        else:
            for i in range(n_blocks):
                core[f"tac_{i}"] = _tac(sd, f"{pre}.TAC.{i}")
            core["out_conv"] = _pointwise(sd, f"{pre}.output")
        for i in range(n_blocks):
            bp = f"{pre}.TCN.{i}"
            core[f"block_{i}"] = {
                "conv1d": _pointwise(sd, f"{bp}.conv1d"),
                "dconv1d": _conv1d(sd, f"{bp}.dconv1d"),
                "res_out": _pointwise(sd, f"{bp}.res_out"),
                "skip_out": _pointwise(sd, f"{bp}.skip_out"),
                "act1": _prelu(sd, f"{bp}.nonlinearity1"),
                "act2": _prelu(sd, f"{bp}.nonlinearity2"),
                "reg1": _norm(sd, f"{bp}.reg1"),
                "reg2": _norm(sd, f"{bp}.reg2"),
            }
        p["seq_model"] = core

    elif module in ("SudoRMRF", "GC_SudoRMRF"):

        def _ublock(prefix, depth=5):
            out = {
                "proj_1x1": _conv_norm_act(sd, f"{prefix}.proj_1x1"),
                "final_norm": _norm(sd, f"{prefix}.final_norm.norm"),
                "final_act": _prelu(sd, f"{prefix}.final_norm.act"),
                "res_conv": _pointwise(sd, f"{prefix}.res_conv"),
            }
            for k in range(depth):
                out[f"spp_{k}"] = _conv_norm(sd, f"{prefix}.spp_dw.{k}")
            return out

        for i in range(layer):
            pre = f"seq_model.sudo_rmrf_layers.{i}"
            if module == "GC_SudoRMRF":
                p[f"seq_model_{i}"] = {
                    "tac": _tac(sd, f"{pre}.TAC"),
                    "ublock": _ublock(f"{pre}.UBlock"),
                }
            else:
                p[f"seq_model_{i}"] = _ublock(pre)

    p["mask_conv"] = _pointwise(sd, "mask.0")
    p["decoder"] = {"kernel": sd["decoder.weight"][:, 0, :]}
    return {"params": p}


CONVERTERS["TasNetFull"] = convert_tasnet
