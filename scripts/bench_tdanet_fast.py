"""TDANet analytic-moment fast forward vs model.apply on the chip.

    python scripts/bench_tdanet_fast.py
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
from audio_only_speech_separation_tpu.models.tdanet import fast_inference_forward

SECONDS = 2.0
ITERS = 50


def main():
    model = M.TDANet(
        out_channels=128, in_channels=512, num_blocks=16, upsampling_depth=5,
        enc_kernel_size=4, num_sources=2, sample_rate=16000,
    )
    T = int(SECONDS * 16000)
    for batch in (4, 8, 16):
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(batch, T)).astype(np.float32)
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )
        xx = x.astype(jnp.bfloat16)

        for label, fn in (
            ("fast", lambda p_, m_: fast_inference_forward(model, p_, m_)),
            ("apply", lambda p_, m_: model.apply(p_, m_)),
        ):
            @jax.jit
            def loop(p_, mix):
                def body(i, acc):
                    m = mix * (1.0 + 1e-9 * i.astype(mix.dtype))
                    return acc + fn(p_, m).sum().astype(jnp.float32)

                return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

            try:
                float(loop(p, xx))
                t0 = time.perf_counter()
                float(loop(p, xx))
                dt = time.perf_counter() - t0
            except Exception as e:
                print(f"tdanet-{label} b={batch}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            ms = dt / ITERS * 1000
            thr = batch * SECONDS * ITERS / dt
            print(f"tdanet-{label} b={batch}: {ms:.1f} ms/iter, "
                  f"{thr:.0f} audio-sec/s", flush=True)


if __name__ == "__main__":
    main()
