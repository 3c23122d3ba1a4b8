"""Batch-size sweep for the latency-bound model families.

Sandglasset / TDANet / Sepformer are latency- or traffic-bound at their
published bench batches; serial components (scan steps, small fusions)
amortize with batch, so audio-sec/s/chip can rise well past the batch-8
row.  This sweep measures that curve honestly (same fori_loop + scalar
fetch discipline as bench_all.py) so the BENCHMARKS.md row can sit at the
best measured batch.

    python scripts/bench_batch_sweep.py [model ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

import audio_only_speech_separation_tpu.models as M

SWEEPS = {
    "sandglasset": (lambda: M.Sandglasset(sample_rate=8000), 8000, (8, 16, 32)),
    "tdanet": (
        lambda: M.TDANet(
            out_channels=128, in_channels=512, num_blocks=16,
            upsampling_depth=5, enc_kernel_size=4, num_sources=2,
            sample_rate=16000,
        ),
        16000,
        (4, 8, 16),
    ),
    "sepformer": (lambda: M.Sepformer(sample_rate=16000), 16000, (2, 4, 8)),
    "dptnet": (
        lambda: M.TasNet(
            enc_dim=64, bn_dim=64, hidden_dim=128, win=16, layer=6,
            num_spk=2, module="DPTNet", block_size=100, sample_rate=8000,
        ),
        8000,
        (8, 16, 32),
    ),
}

SECONDS = 2.0
ITERS = 50


def bench(name, ctor, sr, batches):
    model = ctor()
    T = int(SECONDS * sr)
    for batch in batches:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(batch, T)).astype(np.float32)
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )
        xx = x.astype(jnp.bfloat16)

        @jax.jit
        def loop(p, mix):
            def body(i, acc):
                m = mix * (1.0 + 1e-9 * i.astype(mix.dtype))
                return acc + model.apply(p, m).sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        try:
            float(loop(p, xx))
            t0 = time.perf_counter()
            float(loop(p, xx))
            dt = time.perf_counter() - t0
        except Exception as e:
            print(f"{name} b={batch}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
            continue
        ms = dt / ITERS * 1000
        thr = batch * SECONDS * ITERS / dt
        print(f"{name} b={batch}: {ms:.1f} ms/iter, {thr:.0f} audio-sec/s",
              flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(SWEEPS)
    for n in names:
        bench(n, *SWEEPS[n])
