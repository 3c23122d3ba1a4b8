import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import time, numpy as np, jax, jax.numpy as jnp
from audio_only_speech_separation_tpu.models import ConvTasNet
from audio_only_speech_separation_tpu.models.convtasnet import fused_inference_forward
from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import pack_convtasnet_tcn_params

model = ConvTasNet(N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3, sample_rate=16000)
T = 32000
x = jnp.asarray(np.random.default_rng(0).normal(size=(8, T)).astype(np.float32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
packed = pack_convtasnet_tcn_params(params, model.R, model.X)
ITERS = 20

fwd = jax.jit(lambda p, m: fused_inference_forward(model, p, m, packed=packed))
# correctness spot check vs XLA f32
ref = np.asarray(model.apply(params, x[:1]))
got = np.asarray(fwd(params, x[:1]).astype(jnp.float32))
print("fused vs f32 full model: max", np.abs(got-ref).max(), "rms ref", float(np.sqrt((ref**2).mean())))

@jax.jit
def loop(p, mix):
    def body(i, acc):
        m = mix * (1.0 + 1e-9 * i.astype(mix.dtype))
        return acc + fused_inference_forward(model, p, m, packed=packed).sum().astype(jnp.float32)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))
t0=time.perf_counter(); float(loop(params, x)); print("compile", time.perf_counter()-t0)
t0 = time.perf_counter(); float(loop(params, x)); dt = time.perf_counter() - t0
print(f"fused: {dt/ITERS*1000:.2f} ms/iter -> {8*2*ITERS/dt:.0f} audio-sec/s")
