#!/usr/bin/env python
"""Manual model benchmark harness (reference: unit_tests.py:14-42).

Like the reference, this is a smoke/benchmark CLI (the real test suite
lives in tests/): builds a model, reports params + XLA-estimated FLOPs
(replacing ptflops), then times a few jitted train steps on random
tensors.

    python unit_tests.py --model TasNet --module DPRNN --epochs 5
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import audio_only_speech_separation_tpu.models as models
from audio_only_speech_separation_tpu.losses import PITLossWrapper, pairwise_neg_snr
from audio_only_speech_separation_tpu.train import make_optimizer
from audio_only_speech_separation_tpu.utils.profiling import count_params, estimate_cost


def test_model(model, length=32000, batch=4, epochs=5, n_src=2):
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.normal(size=(batch, length)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(batch, n_src, length)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mix)
    print(f"params: {count_params(params)/1e6:.3f} M")
    cost = estimate_cost(lambda p, m: model.apply(p, m), params, mix)
    if "flops" in cost:
        per_audio_sec = cost["flops"] / (batch * length / model.sample_rate)
        print(f"forward flops: {cost['flops']/1e9:.2f} G ({per_audio_sec/1e9:.2f} G/audio-sec)")

    loss_fn = PITLossWrapper(pairwise_neg_snr, threshold_byloss=False)
    tx = make_optimizer("adam", lr=1e-3, grad_clip=5.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, m, t):
        def loss(p_):
            return loss_fn(model.apply(p_, m), t)

        l, grads = jax.value_and_grad(loss)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, l

    params, opt_state, l = step(params, opt_state, mix, src)
    float(l)  # force compile + first step
    t0 = time.perf_counter()
    for _ in range(epochs):
        params, opt_state, l = step(params, opt_state, mix, src)
    lf = float(l)  # fetch forces completion (block_until_ready lies, see bench.py)
    dt = time.perf_counter() - t0
    print(f"{epochs} steps: {dt:.3f}s ({dt/epochs*1000:.1f} ms/step), loss {lf:.3f}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="TasNet")
    parser.add_argument("--module", default="DPRNN")
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--length", type=int, default=32000)
    parser.add_argument("--batch", type=int, default=4)
    args = parser.parse_args()
    cls = models.get(args.model)
    if args.model == "TasNet":
        model = cls(module=args.module, sample_rate=8000)
    else:
        model = cls(sample_rate=8000)
    print(f"=== {args.model}" + (f"/{args.module}" if args.model == "TasNet" else "") + " ===")
    test_model(model, length=args.length, batch=args.batch, epochs=args.epochs)


if __name__ == "__main__":
    main()
