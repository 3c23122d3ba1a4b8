#!/usr/bin/env python
"""Standalone FLOPs/params profiler for one config
(reference: evaluated_mac_params.py:17-67, fixed to take --conf-dir).

    python evaluated_mac_params.py --conf-dir configs/tdanet_lrs2.yml
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import yaml

import audio_only_speech_separation_tpu.models as models
from audio_only_speech_separation_tpu.utils.profiling import count_params, estimate_cost


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf-dir", default="configs/tdanet_lrs2.yml")
    parser.add_argument("--seconds", type=float, default=1.0)
    args = parser.parse_args()
    with open(args.conf_dir) as f:
        config = yaml.safe_load(f)
    sr = config["datamodule"]["data_config"]["sample_rate"]
    model = models.get(config["audionet"]["audionet_name"])(
        sample_rate=sr, **(config["audionet"]["audionet_config"] or {})
    )
    T = int(args.seconds * sr)
    x = jnp.asarray(np.zeros((1, T), np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    print(f"model: {config['audionet']['audionet_name']}")
    print(f"params: {count_params(params)/1e6:.3f} M")
    cost = estimate_cost(lambda p, m: model.apply(p, m), params, x)
    if "flops" in cost:
        print(f"forward flops ({args.seconds}s audio): {cost['flops']/1e9:.3f} G")
    if "bytes_accessed" in cost:
        print(f"bytes accessed: {cost['bytes_accessed']/1e6:.1f} MB")


if __name__ == "__main__":
    main()
