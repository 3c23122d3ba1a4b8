"""Round-5 headline experiments on the fused ConvTasNet separator kernel.

Measures, in one process at the headline shape (B=8, 2 s @ 16 kHz, and a
B=16 re-sweep):

  base      — the production kernel (two-pass, delayed gLN-2)
  sum_dot   — Σv(gLN-2) from the WIDENED pending dot's ones column instead
              of a VPU tree reduce (the one stats-on-MXU variant the
              round-3/4 negatives did NOT cover: no second dot is issued)
  nostats   — p1stats+p2stats ablated (garbage math): the measured lower
              bound for ANY scheme that eliminated every gLN reduction —
              i.e. the best case of the VERDICT-r4 "analytic-moment
              folding" idea if the algebra worked (it cannot: PReLU sits
              between each matmul and its gLN, and moments do not
              propagate through a nonlinearity)

Usage (TPU host):  python scripts/bench_sum_dot.py
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from audio_only_speech_separation_tpu.models import ConvTasNet
from audio_only_speech_separation_tpu.ops.conv import frame_signal
from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
    fused_convtasnet_separator,
    pack_convtasnet_full_params,
    widen_wsgs_for_sum_dot,
)

SECONDS = 2.0
SR = 16000
ITERS = 100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,sum_dot,nostats")
    ap.add_argument("--batches", default="8,16")
    args = ap.parse_args()
    model = ConvTasNet(
        N=512, L=16, B=128, H=512, P=3, X=8, R=3, norm="gLN", num_spks=3,
        activate="relu", causal=False, sample_rate=SR,
    )
    T = int(SECONDS * SR)
    print("init...", flush=True)
    t0 = time.perf_counter()
    x0 = jnp.zeros((2, T), jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.jit(model.init, backend="cpu")(jax.random.PRNGKey(0), x0)
    print(f"init done {time.perf_counter()-t0:.0f}s", flush=True)
    packed = pack_convtasnet_full_params(params, 3, 8, 3)
    print(f"pack done {time.perf_counter()-t0:.0f}s", flush=True)
    we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils = packed
    wsgs_w = widen_wsgs_for_sum_dot(wsgs)

    win, pad_stride, fb_stride = model.L, model.L // 2, model.L // 4

    def make_frames(batch):
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(batch, T)).astype(np.float32)
        ).astype(jnp.bfloat16)
        rest = win - (pad_stride + T % win) % win
        if rest > 0:
            x = jnp.pad(x, ((0, 0), (0, rest)))
        x = jnp.pad(x, ((0, 0), (win - pad_stride, win - pad_stride)))
        return frame_signal(x, win, fb_stride)

    all_variants = {
        "base": (dict(), wsgs),
        "sum_dot": (dict(sum_dot=True), wsgs_w),
        "nostats": (dict(ablate=("p1stats", "p2stats")), wsgs),
    }
    variants = [
        (n, *all_variants[n]) for n in args.variants.split(",") if n
    ]
    for batch in [int(b) for b in args.batches.split(",") if b]:
        frames = make_frames(batch)
        for name, kw, ws in variants:
            @jax.jit
            def loop(fr):
                def body(i, acc):
                    f = fr * (1.0 + 1e-6 * i.astype(fr.dtype))
                    o = fused_convtasnet_separator(
                        f, we, w1s, ws, vecs, cs, alphas, wm, bm, wd,
                        dilations=dils, nspk=3, sigmoid=False,
                        prelu_max=True, **kw,
                    )
                    return acc + o.astype(jnp.float32).sum()

                return jax.lax.fori_loop(
                    0, ITERS, body, jnp.zeros((), jnp.float32)
                )

            print(f"B={batch} {name}: compiling...", flush=True)
            try:
                float(loop(frames))  # compile
                print(f"B={batch} {name}: compiled", flush=True)
                t0 = time.perf_counter()
                float(loop(frames))
                dt = time.perf_counter() - t0
            except Exception as e:
                print(
                    f"B={batch} {name}: FAILED {type(e).__name__}: "
                    f"{str(e)[:300]}",
                    flush=True,
                )
                continue
            ms = dt / ITERS * 1000
            thr = batch * SECONDS * ITERS / dt
            print(
                f"B={batch} {name}: {ms:.2f} ms/iter  "
                f"({thr:.0f} audio-sec/s kernel-only)",
                flush=True,
            )


if __name__ == "__main__":
    main()
