"""Training-step throughput on the real chip (forward+backward+update).

    python scripts/bench_train.py
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
import optax

import audio_only_speech_separation_tpu.models as M
from audio_only_speech_separation_tpu.losses import PITLossWrapper, pairwise_neg_snr
from audio_only_speech_separation_tpu.train import make_optimizer

CASES = [
    ("ConvTasNet (lrs3, b8x2s)", lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000), 16000, 8, 3, "float32"),
    ("ConvTasNet (lrs3, b8x2s, bf16)", lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000), 16000, 8, 3, "bfloat16"),
    ("ConvTasNet (lrs3, b8x2s, bf16+fusedfwd)", lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000), 16000, 8, 3, "bfloat16+fused"),
    # channels-last training layout (round-5 verdict #5): identical param
    # tree, [B, T, C] execution end to end
    ("ConvTasNet (lrs3, b8x2s, bf16+CL)", lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000, channels_last=True), 16000, 8, 3, "bfloat16"),
    # delayed-norm differentiable formulation (round 5): the fused kernel's
    # algebra as plain XLA ops, so jax.grad gets the savings too
    ("ConvTasNet (lrs3, b8x2s, bf16+delayed)", lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000), 16000, 8, 3, "bfloat16+delayed"),
    # fused Pallas forward AND backward for the TCN chain (round 5)
    ("ConvTasNet (lrs3, b8x2s, bf16+kernelbwd)", lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000), 16000, 8, 3, "bfloat16+kernelbwd"),
    ("ConvTasNet (lrs3, b8x2s, f32+CL)", lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000, channels_last=True), 16000, 8, 3, "float32"),
    ("ConvTasNet (lrs3, b16x2s, bf16+kernelbwd)", lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000), 16000, 16, 3, "bfloat16+kernelbwd"),
    ("TasNet-DPRNN (wsj0, b8x4s)", lambda: M.TasNet(enc_dim=64, bn_dim=64, hidden_dim=128, win=16, layer=6, num_spk=2, module="DPRNN", block_size=100, sample_rate=8000), 8000, 8, 2, "float32"),
    ("TasNet-DPRNN (wsj0, b8x4s, bf16)", lambda: M.TasNet(enc_dim=64, bn_dim=64, hidden_dim=128, win=16, layer=6, num_spk=2, module="DPRNN", block_size=100, sample_rate=8000), 8000, 8, 2, "bfloat16"),
    ("BSRNN (wsj0, b8x4s, bf16)", lambda: M.BSRNN(win=256, stride=64, feature_dim=128, num_spks=2, num_repeat=8, sample_rate=8000), 8000, 8, 2, "bfloat16"),
    # remaining trainable families (round 5: complete the training table)
    ("TasNet-DPTNet (wsj0, b8x4s, bf16)", lambda: M.TasNet(enc_dim=64, bn_dim=64, hidden_dim=128, win=16, layer=6, num_spk=2, module="DPTNet", block_size=100, sample_rate=8000), 8000, 8, 2, "bfloat16"),
    ("Sepformer (base, b2x2s, bf16)", lambda: M.Sepformer(sample_rate=16000), 16000, 2, 2, "bfloat16"),
    ("TDANet (lrs2, b4x2s, bf16)", lambda: M.TDANet(out_channels=128, in_channels=512, num_blocks=16, upsampling_depth=5, enc_kernel_size=4, num_sources=2, sample_rate=16000), 16000, 4, 2, "bfloat16"),
    ("AFRCNN (lrs2, b4x2s, bf16)", lambda: M.AFRCNN(out_channels=512, in_channels=512, num_blocks=16, upsampling_depth=5, enc_kernel_size=1, num_sources=2, sample_rate=16000), 16000, 4, 2, "bfloat16"),
    ("Sandglasset (b8x4s, bf16)", lambda: M.Sandglasset(sample_rate=8000), 8000, 8, 2, "bfloat16"),
]

SECONDS = {8000: 4.0, 16000: 2.0}
ITERS = 30  # amortize the ~30-70 ms tunnel fetch


def bench_train(name, ctor, sr, batch, n_src, precision):
    model = ctor()
    T = int(SECONDS[sr] * sr)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.normal(size=(batch, T)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(batch, n_src, T)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), mix)
    loss_fn = PITLossWrapper(pairwise_neg_snr, threshold_byloss=False)
    tx = make_optimizer("adam", lr=1e-3, grad_clip=5.0)
    opt_state = tx.init(params)
    bf16 = precision.startswith("bfloat16")
    apply_fn = model.apply
    if precision.endswith("+fused"):
        from audio_only_speech_separation_tpu.models.convtasnet import (
            make_fused_train_apply,
        )

        apply_fn = make_fused_train_apply(model)
        assert apply_fn is not None, "fused train forward not eligible here"
    elif precision.endswith("+delayed"):
        from audio_only_speech_separation_tpu.models.convtasnet import (
            make_delayed_train_apply,
        )

        apply_fn = make_delayed_train_apply(model)
        assert apply_fn is not None, "delayed train forward not eligible here"
    elif precision.endswith("+kernelbwd"):
        from audio_only_speech_separation_tpu.models.convtasnet import (
            make_kernel_train_apply,
        )

        apply_fn = make_kernel_train_apply(model)
        assert apply_fn is not None, "kernel train path not eligible here"

    def loss(p, m, t):
        if bf16:
            pb = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p
            )
            est = apply_fn(pb, m.astype(jnp.bfloat16)).astype(jnp.float32)
        else:
            est = apply_fn(p, m)
        return loss_fn(est, t)

    @jax.jit
    def steps(p, s, m, t):
        def body(i, carry):
            p, s, _ = carry
            mm = m * (1.0 + 1e-9 * i.astype(m.dtype))
            l, grads = jax.value_and_grad(loss)(p, mm, t)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, l)

        return jax.lax.fori_loop(0, ITERS, body, (p, s, jnp.float32(0.0)))

    p, s, l = steps(params, opt_state, mix, src)
    float(l)  # compile + warmup; fetch forces completion
    t0 = time.perf_counter()
    p, s, l = steps(params, opt_state, mix, src)
    float(l)
    dt = time.perf_counter() - t0
    ms = dt / ITERS * 1000
    thr = batch * SECONDS[sr] * ITERS / dt
    print(f"{name}: {ms:.1f} ms/step, {thr:.0f} trained-audio-sec/s, loss {float(l):.2f}", flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="substring filter on case names")
    a = ap.parse_args()
    for case in CASES:
        if a.only and a.only.lower() not in case[0].lower():
            continue
        try:
            bench_train(*case)
        except Exception as e:
            print(f"{case[0]}: FAILED ({type(e).__name__}: {str(e)[:150]})", flush=True)
