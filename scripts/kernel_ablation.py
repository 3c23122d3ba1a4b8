#!/usr/bin/env python
"""On-chip phase attribution for the fused ConvTasNet separator kernel.

The kernel (ops/pallas/convtasnet_block.py) is VPU-bound and its remaining
headroom is unclear from op counting alone — reduction pipeline drains and
unaligned-shift costs don't show in per-element arithmetic.  This harness
times the WHOLE kernel with individual phases statically ablated (the
``ablate`` knob) and prints the deltas, attributing the per-iteration
milliseconds to: gLN-1 stats, gLN-2 stats, the shifted depthwise taps, the
PReLUs, and P2's pending matmul.  Ablated kernels compute garbage — this is
a timing tool, never a production path.

Usage (on the TPU host):  python scripts/kernel_ablation.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from audio_only_speech_separation_tpu.models import ConvTasNet
from audio_only_speech_separation_tpu.ops.conv import frame_signal
from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
    fused_convtasnet_separator,
    pack_convtasnet_full_params,
)

BATCH = 8
SECONDS = 2.0
SR = 16000
ITERS = 100

ABLATIONS = [
    (),
    ("p1stats",),
    ("p2stats",),
    ("p1stats", "p2stats"),
    ("dw",),
    ("prelu",),
    ("mm2",),
    ("p1stats", "p2stats", "dw", "prelu", "mm2"),
]


def main():
    model = ConvTasNet(
        N=512, L=16, B=128, H=512, P=3, X=8, R=3, norm="gLN", num_spks=3,
        activate="relu", causal=False, sample_rate=SR,
    )
    T = int(SECONDS * SR)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, T)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    packed = pack_convtasnet_full_params(params, 3, 8, 3)
    we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils = packed

    # same framing as models.convtasnet.fused_inference_forward
    win, pad_stride, fb_stride = model.L, model.L // 2, model.L // 4
    xb = x.astype(jnp.bfloat16)
    rest = win - (pad_stride + T % win) % win
    if rest > 0:
        xb = jnp.pad(xb, ((0, 0), (0, rest)))
    xb = jnp.pad(xb, ((0, 0), (win - pad_stride, win - pad_stride)))
    frames = frame_signal(xb, win, fb_stride)
    print(f"frames {frames.shape}", flush=True)

    results = {}
    for ab in ABLATIONS:
        @jax.jit
        def loop(fr, ab=ab):
            def body(i, acc):
                f = fr * (1.0 + 1e-9 * i.astype(fr.dtype))
                o = fused_convtasnet_separator(
                    f, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd,
                    dilations=dils, nspk=3, sigmoid=False, prelu_max=True,
                    ablate=ab,
                )
                return acc + o.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        float(loop(frames))  # compile + warmup
        t0 = time.perf_counter()
        float(loop(frames))
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        results["+".join(ab) or "full"] = round(ms, 3)
        print(f"{'+'.join(ab) or 'full':40s} {ms:7.3f} ms/iter", flush=True)

    base = results["full"]
    print("\nphase attribution (delta vs full):")
    for k, v in results.items():
        if k != "full":
            print(f"  {k:38s} {base - v:+7.3f} ms")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
