#!/usr/bin/env python
"""Eval CLI (reference: audio_test.py:30-101).

    python audio_test.py --conf-dir=Experiments/checkpoint/<exp>/conf.yml

Reloads ``best_model.pth`` through the registry, iterates the raw test set
utterance-by-utterance and streams SI-SNR(i)/SDR(i) to
``results/metrics.csv``.

TPU shape discipline: full-utterance eval has variable T, which would
retrace per length.  Utterances are right-padded to the next multiple of
``--bucket-seconds`` so XLA sees a handful of shapes, and estimates are
cropped back to the true length before scoring (SURVEY.md §7 hard-part 4).
Unlike the reference — whose eval silently random-crops when the training
conf still has ``segment`` set (SURVEY.md §3.2) — the test set here is
ALWAYS built with ``segment=None``.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

import audio_only_speech_separation_tpu.data as datas
import audio_only_speech_separation_tpu.models as models
from audio_only_speech_separation_tpu.metrics import MetricsTracker
from audio_only_speech_separation_tpu.utils import print_only


def choose_dispatch(model, use_bf16: bool, backend: str | None = None) -> str:
    """Single source of truth for the eval forward dispatch.

    Returns one of:
      - "fused":       ConvTasNet whole-separator Pallas kernel (bf16, TPU,
                       standard shapes — the gate is
                       models.convtasnet.fused_forward_eligible, NOT an
                       inline copy of its conditions; e.g. a norm="cLN"
                       non-causal model must never dispatch here)
      - "fast_tdanet": TDANet analytic-moment inference forward (exact
                       eval math, parity-pinned in tests/test_tdanet_fast.py;
                       valid on any backend and in f32 or bf16)
      - "apply":       plain model.apply
    """
    if use_bf16 and isinstance(model, models.ConvTasNet):
        from audio_only_speech_separation_tpu.models.convtasnet import (
            fused_forward_eligible,
        )

        if fused_forward_eligible(model, backend=backend):
            return "fused"
    if isinstance(model, models.TDANet):
        from audio_only_speech_separation_tpu.models.tdanet import (
            fast_forward_eligible,
        )

        if fast_forward_eligible(model):
            return "fast_tdanet"
    return "apply"


def main(config, bucket_seconds: float = 1.0, batch_size: int = 1):
    exp_dir = config["main_args"]["exp_dir"]
    model_path = os.path.join(exp_dir, "best_model.pth")
    print_only(f"Loading model from {model_path}")
    sr = config["datamodule"]["data_config"]["sample_rate"]
    model, params = models.from_pretrain(
        model_path,
        sample_rate=sr,
        **(config["audionet"]["audionet_config"] or {}),
    )

    data_config = dict(config["datamodule"]["data_config"])
    data_config["segment"] = None  # full-utterance eval, explicitly
    datamodule = datas.get(config["datamodule"]["data_name"])(**data_config)
    datamodule.setup()
    _, _, test_set = datamodule.make_sets

    results_dir = os.path.join(exp_dir, "results")
    os.makedirs(results_dir, exist_ok=True)
    metrics = MetricsTracker(
        save_file=os.path.join(results_dir, "metrics.csv"),
        compute_pesq=bool(config["main_args"].get("pesq")) and sr in (8000, 16000),
        sample_rate=sr,
    )

    bucket = max(1, int(bucket_seconds * sr))

    # --bf16: production inference precision (validated SI-SDRi delta vs
    # f32 ≤ 0.02 dB, docs/PALLAS_VALIDATION.json "bf16_quality"); on TPU a
    # standard-shape ConvTasNet additionally dispatches to the fused
    # whole-separator Pallas kernel — the bench.py headline path, ~3.5×
    # over the f32 XLA eval the reference runs (audio_test.py:72-79 there).
    use_bf16 = bool(config["main_args"].get("bf16"))
    if use_bf16 and jax.default_backend() != "tpu":
        # the CPU (test-mesh) backend has no bf16 dots — keep the flag a
        # no-op there instead of crashing mid-eval
        print_only("--bf16 requested but backend is not TPU; running f32")
        use_bf16 = False
    if use_bf16:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )

    dispatch = choose_dispatch(model, use_bf16)
    packed = None
    if dispatch == "fused":
        from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
            pack_convtasnet_full_params,
        )

        packed = pack_convtasnet_full_params(
            params, model.R, model.X, model.num_spks
        )

    @jax.jit
    def forward(p, mix):
        if use_bf16:
            mix = mix.astype(jnp.bfloat16)
        if dispatch == "fused":
            from audio_only_speech_separation_tpu.models.convtasnet import (
                fused_inference_forward,
            )

            return fused_inference_forward(model, p, mix, packed=packed)
        if dispatch == "fast_tdanet":
            from audio_only_speech_separation_tpu.models.tdanet import (
                fast_inference_forward,
            )

            return fast_inference_forward(model, p, mix)
        return model.apply(p, mix)

    # sort by length so same-bucket utterances batch together (fewer XLA
    # shapes AND less padding waste); metrics stay per-utterance
    order = sorted(range(len(test_set)), key=lambda i: test_set.mix[i][1])
    done = 0
    for start in range(0, len(order), batch_size):
        idxs = order[start : start + batch_size]
        items = [test_set[i] for i in idxs]
        T_max = max(it[0].shape[-1] for it in items)
        T_pad = -(-T_max // bucket) * bucket
        mix_in = np.zeros((len(items), T_pad), np.float32)
        for j, (mix, _, _) in enumerate(items):
            mix_in[j, : mix.shape[-1]] = mix
        est = np.asarray(forward(params, jnp.asarray(mix_in)), dtype=np.float32)
        for j, (mix, sources, key) in enumerate(items):
            T = mix.shape[-1]
            metrics(mix, sources, est[j, :, :T], key)
            done += 1
            if done % 50 == 0:
                print_only(f"[{done}/{len(test_set)}] {metrics.update()}")
    metrics.final()
    print_only(f"Results written to {results_dir}/metrics.csv")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--conf-dir",
        type=str,
        required=True,
        help="Path to the experiment conf.yml",
    )
    parser.add_argument("--bucket-seconds", type=float, default=1.0)
    parser.add_argument(
        "--pesq", action="store_true",
        help="add a pesq_est column (P.862-STRUCTURE estimator, 8/16 kHz "
        "only; NOT ITU-conformant — do not compare against published PESQ "
        "numbers)",
    )
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument(
        "--bf16", action="store_true",
        help="bf16 inference (f32 matmul accumulation; SI-SDRi delta vs "
        "f32 ≤ 0.02 dB) + the fused Pallas separator for standard-shape "
        "ConvTasNet on TPU",
    )
    args = parser.parse_args()
    with open(args.conf_dir) as f:
        config = yaml.safe_load(f)
    config.setdefault("main_args", {})
    config["main_args"].setdefault("exp_dir", os.path.dirname(args.conf_dir))
    config["main_args"]["pesq"] = args.pesq
    config["main_args"]["bf16"] = args.bf16
    main(config, bucket_seconds=args.bucket_seconds, batch_size=args.batch_size)
