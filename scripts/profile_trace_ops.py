"""Per-op device-time breakdown of one model forward (TPU).

Runs N jitted forwards under ``jax.profiler.trace``, parses the perfetto
trace that JAX writes, and prints the top ops by total device time.  This
is the round-loop profiling tool behind the per-family roofline notes in
docs/BENCHMARKS.md (aux subsystem the reference lacks — SURVEY.md §5's
tracing item; the reference's only analog is ptflops MAC counting,
unit_tests.py:22-25).

    python scripts/profile_trace_ops.py sandglasset [--iters 10] [--top 30]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

import audio_only_speech_separation_tpu.models as M

CASES = {
    "convtasnet": (lambda: M.ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000), 16000, 8),
    "dprnn": (lambda: M.TasNet(enc_dim=64, bn_dim=64, hidden_dim=128, win=16, layer=6, num_spk=2, module="DPRNN", block_size=100, sample_rate=8000), 8000, 8),
    "dptnet": (lambda: M.TasNet(enc_dim=64, bn_dim=64, hidden_dim=128, win=16, layer=6, num_spk=2, module="DPTNet", block_size=100, sample_rate=8000), 8000, 8),
    "sepformer": (lambda: M.Sepformer(sample_rate=16000), 16000, 2),
    "tdanet": (lambda: M.TDANet(out_channels=128, in_channels=512, num_blocks=16, upsampling_depth=5, enc_kernel_size=4, num_sources=2, sample_rate=16000), 16000, 4),
    "afrcnn": (lambda: M.AFRCNN(out_channels=512, in_channels=512, num_blocks=16, upsampling_depth=5, enc_kernel_size=1, num_sources=2, sample_rate=16000), 16000, 4),
    "sandglasset": (lambda: M.Sandglasset(sample_rate=8000), 8000, 8),
    "dprnn_old": (lambda: M.DPRNNTasNet(sample_rate=8000), 8000, 8),
    "bsrnn": (lambda: M.BSRNN(win=256, stride=64, feature_dim=128, num_spks=2, num_repeat=8, sample_rate=8000), 8000, 8),
}


def collect_device_ops(trace_dir):
    """Aggregate (op name -> total_us, count) from the perfetto trace,
    device-track events only."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find process ids whose name mentions the device (TPU/axon); fall back
    # to any pid that is not the python host threads
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = str(e.get("args", {}).get("name", "")).lower()
            if any(k in nm for k in ("tpu", "axon", "xla", "device")):
                if "host" not in nm:
                    device_pids.add(e["pid"])
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        agg[name][0] += float(e.get("dur", 0.0))
        agg[name][1] += 1
    return agg, path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=sorted(CASES))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--seconds", type=float, default=2.0)
    args = ap.parse_args()

    ctor, sr, batch = CASES[args.model]
    model = ctor()
    T = int(args.seconds * sr)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, T)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    pb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )
    xb = x.astype(jnp.bfloat16)
    fwd = jax.jit(lambda p, m: model.apply(p, m).sum().astype(jnp.float32))
    float(fwd(pb, xb))  # compile

    trace_dir = f"/tmp/jax_trace_{args.model}"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    acc = None
    for i in range(args.iters):
        s = fwd(pb, (xb * (1.0 + 1e-6 * i)).astype(xb.dtype))
        acc = s if acc is None else acc + s
    float(acc)
    jax.profiler.stop_trace()

    agg, path = collect_device_ops(trace_dir)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for v in agg.values())
    print(f"trace: {path}")
    print(f"total device-event time: {total/1e3:.2f} ms over {args.iters} iters "
          f"(~{total/1e3/args.iters:.2f} ms/iter if serial)")
    print(f"{'us_total':>12} {'us/iter':>10} {'count':>7}  op")
    for name, (us, n) in rows[: args.top]:
        print(f"{us:12.0f} {us/args.iters:10.1f} {n:7d}  {name[:110]}")


if __name__ == "__main__":
    main()
