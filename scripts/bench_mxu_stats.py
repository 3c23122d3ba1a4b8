"""Measure the ``mxu_stats`` kernel variants (gLN Σ/Σ² reductions as MXU
rowsum dots vs VPU tree reductions) for the fused ConvTasNet separator.

CPU: runs a small interpret-mode parity check only.
TPU: parity check + ITERS-amortized timing of (), (p2,), (p1,), (p1,p2).

    python scripts/bench_mxu_stats.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

from audio_only_speech_separation_tpu.models import ConvTasNet
from audio_only_speech_separation_tpu.ops.conv import frame_signal
from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
    fused_convtasnet_separator,
    pack_convtasnet_full_params,
)

ON_TPU = jax.default_backend() == "tpu"


def parity_small():
    """Small-shape parity of every mxu_stats variant vs the f32 model."""
    import functools
    from jax.experimental import pallas as pl

    if not ON_TPU:
        pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)
    model = ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=2, R=1, num_spks=2,
                       sample_rate=8000)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4000)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    packed = pack_convtasnet_full_params(params, 1, 2, 2)
    we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils = packed
    ref = np.asarray(model.apply(params, x))
    scale = np.abs(ref).mean() + 1e-8

    xb = x.astype(jnp.bfloat16)
    win, pad_stride, fb_stride = 16, 8, 4
    T = x.shape[1]
    rest = win - (pad_stride + T % win) % win
    if rest:
        xb = jnp.pad(xb, ((0, 0), (0, rest)))
    xb = jnp.pad(xb, ((0, 0), (win - pad_stride, win - pad_stride)))
    frames = frame_signal(xb, win, fb_stride)
    from audio_only_speech_separation_tpu.ops.conv import overlap_add

    for ms in [(), ("p2",), ("p1",), ("p1", "p2")]:
        o = fused_convtasnet_separator(
            frames, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd,
            dilations=dils, nspk=2, mxu_stats=ms)
        s = overlap_add(
            o.astype(jnp.float32).reshape(2 * 2, o.shape[2], win), fb_stride)
        s = s[:, win - pad_stride: s.shape[-1] - (rest + win - pad_stride)]
        got = np.asarray(s.reshape(2, 2, -1))
        rel = np.abs(ref - got) / scale
        print(f"parity mxu_stats={ms}: rel max {rel.max():.4f} "
              f"mean {rel.mean():.5f}", flush=True)
        assert rel.max() < 0.15 and rel.mean() < 0.02, (ms, rel.max())


def bench():
    model = ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3,
                       activate="relu", sample_rate=16000)
    T = 32000
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, T)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    packed = pack_convtasnet_full_params(params, 3, 8, 3)
    we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils = packed

    xb = x.astype(jnp.bfloat16)
    win, pad_stride, fb_stride = 16, 8, 4
    rest = win - (pad_stride + T % win) % win
    if rest:
        xb = jnp.pad(xb, ((0, 0), (0, rest)))
    xb = jnp.pad(xb, ((0, 0), (win - pad_stride, win - pad_stride)))
    frames = frame_signal(xb, win, fb_stride)
    ITERS = 100

    for ms in [(), ("p2",), ("p1",), ("p1", "p2")]:
        @jax.jit
        def loop(fr, ms=ms):
            def body(i, acc):
                f = fr * (1.0 + 1e-9 * i.astype(fr.dtype))
                o = fused_convtasnet_separator(
                    f, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd,
                    dilations=dils, nspk=3, prelu_max=True, mxu_stats=ms)
                return acc + o.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        float(loop(frames))
        t0 = time.perf_counter()
        float(loop(frames))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"mxu_stats={str(ms):14s} {dt*1e3:6.2f} ms/iter -> "
              f"{8*2/dt:5.0f} audio-sec/s", flush=True)


if __name__ == "__main__":
    parity_small()
    if ON_TPU:
        bench()
