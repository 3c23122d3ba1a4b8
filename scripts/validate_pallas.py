import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp
from audio_only_speech_separation_tpu.models.convtasnet import Conv1DBlock
from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
    fused_tcn_separator, pack_convtasnet_tcn_params)
rng = np.random.default_rng(0)
B, T = 2, 2048
X, R = 4, 1
x = rng.normal(size=(B, 128, T)).astype(np.float32) * 0.5
params = {"params": {}}
key = jax.random.PRNGKey(0)
w = jnp.asarray(x)
blocks, ps = [], []
for i in range(X):
    blk = Conv1DBlock(128, 512, 3, dilation=2**i)
    key, k = jax.random.split(key)
    p = blk.init(k, w)
    params["params"][f"tcn_0_{i}"] = p["params"]
    blocks.append(blk); ps.append(p)
    w = blk.apply(p, w)
ref32 = np.asarray(w)
wb = jnp.asarray(x).astype(jnp.bfloat16)
for blk, p in zip(blocks, ps):
    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if a.dtype==jnp.float32 else a, p)
    wb = blk.apply(pb, wb)
ref_bf16 = np.asarray(wb.astype(jnp.float32))
w1s, wss, vecs, wsbs, alphas, dils = pack_convtasnet_tcn_params(params, R, X)
x_cl = jnp.asarray(np.swapaxes(x, 1, 2))
y = fused_tcn_separator(x_cl.astype(jnp.bfloat16), w1s, wss, vecs, wsbs, alphas, dils)
got = np.swapaxes(np.asarray(y.astype(jnp.float32)), 1, 2)
print("pallas vs f32 XLA:  max", np.abs(got-ref32).max(), "mean", np.abs(got-ref32).mean())
print("pallas vs bf16 XLA: max", np.abs(got-ref_bf16).max(), "mean", np.abs(got-ref_bf16).mean())
print("bf16 XLA vs f32:    max", np.abs(ref_bf16-ref32).max(), "mean", np.abs(ref_bf16-ref32).mean())
# odd T (masking path)
T2 = 1500
x2 = rng.normal(size=(1, 128, T2)).astype(np.float32) * 0.5
w2 = jnp.asarray(x2)
for blk, p in zip(blocks, ps):
    w2 = blk.apply(p, w2)
ref2 = np.asarray(w2)
y2 = fused_tcn_separator(jnp.asarray(np.swapaxes(x2,1,2)).astype(jnp.bfloat16), w1s, wss, vecs, wsbs, alphas, dils)
got2 = np.swapaxes(np.asarray(y2.astype(jnp.float32)), 1, 2)
print("odd-T pallas vs f32: max", np.abs(got2-ref2).max(), "mean", np.abs(got2-ref2).mean())
