#!/usr/bin/env python
"""Benchmark CLI: separated-audio-seconds per second per chip.

The reference has no benchmark subsystem (SURVEY.md §6) — its only perf
path is a manual wall-clock harness (unit_tests.py:27-42).  This CLI is the
framework's headline inference benchmark, run by the driver on one real TPU
chip.  Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measurement notes (axon TPU tunnel):
- ``block_until_ready()`` does NOT block through the tunnel (verified: it
  reports >100 PFLOP/s).  Timing therefore forces a 4-byte scalar
  device→host fetch that data-depends on every benchmark iteration.
- All ITERS iterations run inside ONE jitted ``lax.fori_loop`` so per-call
  dispatch/tunnel latency is amortized; the input is perturbed by the loop
  index so XLA cannot hoist the loop-invariant forward out of the loop.

Baseline: the driver's north star is >5× A100 separated-audio-sec/sec/chip
(BASELINE.md).  No measured A100 number exists in the reference, so
``A100_EST`` is an analytic estimate for the same ConvTasNet-LRS3 config:
~51 GFLOP per audio-second at ~20% utilization of 312 bf16 TFLOP/s ≈ 1200;
rounded to 1000 audio-sec/sec.  vs_baseline = value / A100_EST.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

from audio_only_speech_separation_tpu.models import ConvTasNet
from audio_only_speech_separation_tpu.models.convtasnet import fused_inference_forward
from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
    pack_convtasnet_full_params,
)

A100_EST = 1000.0  # audio-sec/sec/chip, analytic estimate (see module docstring)

_REPO = os.path.dirname(os.path.abspath(__file__))


def ensure_kernel_validation():
    """Refuse to benchmark unvalidated kernels (round-2 verdict weak #4).

    docs/PALLAS_VALIDATION.json embeds sha256 hashes of every ops/pallas
    source; if they don't match the tree, re-run the on-chip validator
    before the headline.  A failed or still-stale validation aborts the
    bench rather than reporting a number for unproven kernel math.
    """
    import subprocess

    from audio_only_speech_separation_tpu.utils.kernel_hashes import (
        validation_is_fresh,
    )

    path = os.path.join(_REPO, "docs", "PALLAS_VALIDATION.json")

    def fresh():
        try:
            with open(path) as f:
                return validation_is_fresh(json.load(f))
        except (OSError, ValueError):
            return False

    if fresh():
        return
    print("PALLAS_VALIDATION.json stale; revalidating kernels...", flush=True)
    subprocess.run(
        ["python", os.path.join(_REPO, "scripts", "validate_pallas.py"),
         "--quick", "--out", path],
        check=False, cwd=_REPO, stdout=subprocess.DEVNULL,
    )
    if not fresh():
        raise SystemExit(
            "kernel validation is stale or failing; run "
            "scripts/validate_pallas.py and commit docs/PALLAS_VALIDATION.json"
        )

BATCH = 8
SECONDS = 2.0
SAMPLE_RATE = 16000
ITERS = 100  # the device→host scalar fetch costs ~30-70 ms through the
# axon tunnel regardless of work; 100 in-loop iterations amortize it below
# 1% (profiler-verified: device time per iteration matches at ITERS=50/100)


def main():
    ensure_kernel_validation()
    model = ConvTasNet(
        N=512, L=16, B=128, H=512, P=3, X=8, R=3,
        norm="gLN", num_spks=3, activate="relu", causal=False,
        sample_rate=SAMPLE_RATE,
    )
    T = int(SECONDS * SAMPLE_RATE)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, T)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # Production inference path: bf16 activations/weights (f32 matmul
    # accumulation + f32 norm statistics — ops-level policy; 2.2× over f32,
    # the model is HBM-bandwidth-bound) with the 24-block TCN body running
    # in the fused Pallas kernel (ops/pallas/convtasnet_block.py; another
    # 1.3× by keeping activations resident in VMEM).
    packed = pack_convtasnet_full_params(params, 3, 8, 3)
    x = x.astype(jnp.bfloat16)

    @jax.jit
    def bench_loop(p, mix):
        def body(i, acc):
            # index-dependent perturbation defeats loop-invariant hoisting
            m = mix * (1.0 + 1e-9 * i.astype(mix.dtype))
            est = fused_inference_forward(model, p, m, packed=packed)
            return acc + est.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    float(bench_loop(params, x))  # compile + warmup, fetch forces completion
    t0 = time.perf_counter()
    float(bench_loop(params, x))
    dt = time.perf_counter() - t0

    audio_sec = BATCH * SECONDS * ITERS
    throughput = audio_sec / dt
    print(
        json.dumps(
            {
                "metric": "convtasnet_lrs3_infer_throughput",
                "value": round(throughput, 2),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(throughput / A100_EST, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
