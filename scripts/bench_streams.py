#!/usr/bin/env python
"""Measure the ``streams`` knob of the fused ConvTasNet separator on-chip.

``streams=S`` co-resides S samples per grid step so their independent
instruction streams interleave — one sample's P2 VPU chain fills the other's
MXU/load stall cycles (see _kernel docstring).  This harness checks
numerical equality vs streams=1 at the headline shape, then times each
eligible S.

Usage (on the TPU host):  python scripts/bench_streams.py
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
    fused_vmem_bytes,
    pack_convtasnet_full_params,
)

BATCH = 8
SECONDS = 2.0
SR = 16000
ITERS = 100
VMEM_BUDGET = 110 * 1024 * 1024


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

    win, pad_stride, fb_stride = model.L, model.L // 2, model.L // 4
    xb = x.astype(jnp.bfloat16)
    rest = win - (pad_stride + T % win) % win
    if rest > 0:
        xb = jnp.pad(xb, ((0, 0), (0, rest)))
    xb = jnp.pad(xb, ((0, 0), (win - pad_stride, win - pad_stride)))
    frames = frame_signal(xb, win, fb_stride)
    Tf = frames.shape[1]
    Tpad = -(-Tf // 2048) * 2048
    print(f"frames {frames.shape} Tpad {Tpad}", flush=True)

    def run(S):
        return fused_convtasnet_separator(
            frames, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd,
            dilations=dils, nspk=3, sigmoid=False, prelu_max=True,
            streams=S,
        )

    candidates = [
        S for S in (1, 2, 4, 8)
        if BATCH % S == 0
        and fused_vmem_bytes(Tpad, 512, 128, 3, win, S) <= VMEM_BUDGET
    ]
    print(f"VMEM-eligible streams: {candidates}", flush=True)

    ref = np.asarray(run(1))
    results = {}
    for S in candidates:
        got = np.asarray(run(S))
        max_err = float(np.abs(got.astype(np.float32) - ref.astype(np.float32)).max())
        assert max_err == 0.0, f"streams={S} output differs from streams=1: {max_err}"

        @jax.jit
        def loop(fr, S=S):
            def body(i, acc):
                f = fr * (1.0 + 1e-9 * i.astype(fr.dtype))
                o = fused_convtasnet_separator(
                    f, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd,
                    dilations=dils, nspk=3, sigmoid=False, prelu_max=True,
                    streams=S,
                )
                return acc + o.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        float(loop(frames))  # compile + warmup
        t0 = time.perf_counter()
        float(loop(frames))
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        results[f"streams={S}"] = round(ms, 3)
        audio_per_s = BATCH * SECONDS / (ms / 1e3)
        print(f"streams={S}: {ms:7.3f} ms/iter  (~{audio_per_s:.0f} kernel-only audio-sec/s)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
