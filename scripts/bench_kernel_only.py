import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import time, numpy as np, jax, jax.numpy as jnp
from audio_only_speech_separation_tpu.models import ConvTasNet
from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
    fused_tcn_separator, pack_convtasnet_tcn_params)

model = ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000)
x0 = jnp.zeros((8, 32000), jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
packed = pack_convtasnet_tcn_params(params, 3, 8)
w1s, wsgs, vecs, cs, alphas, dils = packed
T = 8008
xin = jnp.asarray(np.random.default_rng(0).normal(size=(8, T, 128)).astype(np.float32)).astype(jnp.bfloat16)
ITERS = 20
@jax.jit
def loop(x):
    def body(i, acc):
        m = x * (1.0 + 1e-6 * i.astype(x.dtype))
        y = fused_tcn_separator(m, w1s, wsgs, vecs, cs, alphas, dils)
        return acc + y.astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))
t0=time.perf_counter(); float(loop(xin)); print("compile", time.perf_counter()-t0)
t0=time.perf_counter(); float(loop(xin)); dt=time.perf_counter()-t0
print(f"kernel only: {dt/ITERS*1000:.2f} ms/iter (24 blocks x 8 samples)")
