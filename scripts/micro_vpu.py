"""Microbenchmark: VPU elementwise throughput on v5e, f32 vs bf16.

Informs the ConvTasNet kernel-v2 precision strategy: if packed bf16
elementwise runs ~2x f32, the kernel should stay bf16 end-to-end (f32
stats only); if rates match (bf16 promoted to f32 per-op), f32-resident
intermediates win by skipping the pack/unpack casts.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2048  # rows
C = 512
REPS = 64  # elementwise chain length inside the kernel


def make_kernel(dtype, with_stats):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        a = dtype(1.0009)
        b = dtype(0.999)
        acc = jnp.float32(0.0)
        for _ in range(REPS):
            # 1 fma + 1 select-ish pair, the P2 flavor of work
            x = x * a + b
            x = jnp.where(x >= 0, x, a * x)
            if with_stats:
                xf = x.astype(jnp.float32)
                acc = acc + jnp.sum(xf * xf)
        o_ref[...] = x + acc.astype(dtype) * dtype(1e-30)

    return kernel


def bench(dtype, with_stats, iters=200):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(N, C)), dtype)
    f = pl.pallas_call(
        make_kernel(dtype, with_stats),
        out_shape=jax.ShapeDtypeStruct((N, C), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def loop(x):
        def body(i, acc):
            y = f(x * (1 + 1e-9 * i.astype(x.dtype)))
            return acc + y.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(loop(x))  # compile
    t0 = time.perf_counter()
    float(loop(x))
    dt = (time.perf_counter() - t0) / iters
    # ops: REPS * (fma=2 + prelu~3 [+stats 3]) per element
    per_elem = REPS * ((2 + 3) + (3 if with_stats else 0))
    gops = N * C * per_elem / dt / 1e9
    print(f"dtype={dtype.__name__:9s} stats={with_stats}  {dt*1e6:8.1f} us/call  ~{gops:7.0f} Gop/s")


if __name__ == "__main__":
    for dt in (jnp.float32, jnp.bfloat16):
        for ws in (False, True):
            bench(dt, ws)
