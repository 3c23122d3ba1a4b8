#!/usr/bin/env python
"""Two-step train CLI (reference: audio_train_twostep.py).

Step 1 trains the decoder as an autoencoder (``LRS2TwoStepDataModule``
yields (target, target)); step 2 warm-starts the separation module from a
pretrained checkpoint by copying only the "sm"-prefixed parameter subtree
(reference audio_train_twostep.py:38-49), then trains normally.

    python audio_train_twostep.py --conf-dir=configs/tdanet_lrs2.yml \
        [--pretrained Experiments/checkpoint/<exp>/best_model.pth]
"""

import argparse
import os

import jax
import yaml

import audio_only_speech_separation_tpu.models as models
from audio_only_speech_separation_tpu.utils import print_only

import audio_train


def update_parameter(params, pretrained_params, prefix: str = "sm"):
    """Copy the `prefix` subtree from pretrained into params
    (reference audio_train_twostep.py:38-49 copies 'sm'-prefixed weights)."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    inner = params["params"] if "params" in params else params
    pre_inner = (
        pretrained_params["params"] if "params" in pretrained_params else pretrained_params
    )
    copied = 0
    for key in list(inner.keys()):
        if key == prefix or key.startswith(prefix):
            if key in pre_inner:
                inner[key] = pre_inner[key]
                copied += 1
    print_only(f"warm-started {copied} top-level modules with prefix {prefix!r}")
    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf-dir", default="configs/tdanet_lrs2.yml")
    parser.add_argument(
        "--pretrained",
        default=None,
        help="best_model.pth to warm-start the separation module from",
    )
    args, rest = parser.parse_known_args()
    with open(args.conf_dir) as f:
        config = yaml.safe_load(f)

    if args.pretrained:
        # verify the checkpoint loads before the (long) training run
        _, pre_params = models.from_pretrain(args.pretrained)
        print_only(f"Loaded warm-start weights from {args.pretrained}")
        audio_train.WARM_START = (pre_params, update_parameter)

    with open(args.conf_dir) as f:
        def_conf = yaml.safe_load(f)
    from audio_only_speech_separation_tpu.utils import (
        parse_args_as_dict,
        prepare_parser_from_dict,
    )

    p2 = argparse.ArgumentParser()
    p2.add_argument("--conf-dir", default=args.conf_dir)
    p2 = prepare_parser_from_dict(def_conf, parser=p2)
    arg_dic = parse_args_as_dict(p2, args=[f"--conf-dir={args.conf_dir}", *rest])
    cfg = dict(arg_dic)
    for group in def_conf:
        if group not in cfg:
            cfg[group] = def_conf[group]
    audio_train.main(cfg)


if __name__ == "__main__":
    main()
