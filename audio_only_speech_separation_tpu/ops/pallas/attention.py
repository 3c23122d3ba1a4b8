"""Fused short-sequence attention — softmax(qᵀ·k/√d)·v in one Pallas kernel.

Why: dual-path attention runs over chunks (Sepformer K=250, DPTNet K=100,
Sandglasset downsampled frames — reference sepformer.py:578-642,
dptnet.py:26-162), so sequence lengths are tiny but the head count × chunk
count batch is huge.  The XLA lowering materializes the [BH, T, T] logits in
f32 through HBM (for Sepformer-base ≈ 128 MB per layer, ~2/3 of the layer's
wall time); this kernel keeps q/k/v AND the logits resident in VMEM per
grid step, so HBM sees only q, k, v once in and the context once out.

Layout: [BH, dh, T] — the SEQUENCE lives in the lane dimension and the head
dim in sublanes, so no tile is lane-padded by dh (dh is typically 32–64,
far below the 128-lane width; a [T, dh] layout wastes 4× VMEM and VPU
throughput on padding).  Callers fold the layout change into the qkv/out
projection einsums, so no explicit transpose is materialized.  T is passed
UNPADDED: Mosaic masks the partial trailing lane tile in every load, dot,
reduction, and store, which both removes the explicit −1e9 key masking and
— the round-5 win — deletes the three [BH, dh, T_pad] HBM pad
materializations (~0.4 ms each at Sandglasset's BH=16k) the padded
formulation required.  Each grid step processes a VMEM-budgeted group of
heads with batched dot_general (MXU).

Numerical contract: identical math to the einsum path in
ops/attention.MultiheadAttention (f32 logits & softmax, value dtype out),
to bf16 tolerance — verified in tests/test_pallas_kernels.py and
scripts/validate_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEADS_PER_BLOCK = 32
MAX_T_PAD = 1024  # logits [G, T_pad, T_pad] f32 must fit comfortably in VMEM


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # Blocks arrive UNPADDED ([G, dh, T] with T not necessarily a lane
    # multiple): Mosaic masks the partial trailing tile in every load,
    # dot, reduction, and store, so no explicit key masking or query-row
    # slicing is needed — the logits [G, T, T] only ever contain valid
    # rows/columns at the jnp level.  (The previous formulation padded
    # q/k/v to Tp = round_up(T, 128) in HBM and masked padded key lanes
    # with −1e9; the three [BH, dh, Tp] pad materializations cost
    # ~0.4 ms each at Sandglasset's BH=16k, S=131→256 — measured 4.75 →
    # 3.68 ms/call by deleting them, round 5.)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),  # contract dh
        preferred_element_type=jnp.float32,
    ) * scale  # [G, T(q), T(k)] f32
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o_ref[:] = jax.lax.dot_general(
        v,
        attn,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # contract T(k)
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)  # [G, dh, T(q)]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _einsum_attention_bdt(q, k, v):
    """Reference XLA path on [BH, dh, T] (same math); the kernel's VJP."""
    scale = 1.0 / float(np.sqrt(q.shape[1]))
    logits = jnp.einsum("bdq,bdk->bqk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bdk->bdq", attn, v, preferred_element_type=v.dtype)


def _pallas_attention_bdt(q, k, v):
    BH, dh, T = q.shape
    scale = 1.0 / float(np.sqrt(dh))
    # VMEM budget against the PHYSICAL (tile-padded) logits buffer — f32
    # [G, round_up(T, 8), round_up(T, 128)] — cap ~8 MB (more heads per
    # program amortizes the ~µs per-program overhead, which dominates at
    # huge head counts like Sandglasset's BH=16k, dh=16)
    Tp = _round_up(T, 128)
    Tq = min(_round_up(T, 8), Tp)
    G = max(1, min(HEADS_PER_BLOCK, (8 << 20) // (Tq * Tp * 4)))
    while BH % G:
        G -= 1
    spec = pl.BlockSpec((G, dh, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(BH // G,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, dh, T), v.dtype),
    )(q, k, v)


@jax.custom_vjp
def fused_attention_bdt(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """softmax((qᵀk)/√dh) applied to v, on [BH, dh, T] (self-attention).

    Differentiable: the backward pass recomputes attention through the XLA
    einsum formulation (identical math) and takes its gradients, so training
    through the kernel works even though pallas_call has no native VJP.
    """
    return _pallas_attention_bdt(q, k, v)


def _fa_fwd(q, k, v):
    return _pallas_attention_bdt(q, k, v), (q, k, v)


def _fa_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_einsum_attention_bdt, q, k, v)
    return vjp(g)


fused_attention_bdt.defvjp(_fa_fwd, _fa_bwd)


def attention_eligible(
    T: int, dh: int, batch_heads: int | None = None, backend: str | None = None
) -> bool:
    """Whether the fused kernel applies.

    The kernel pays (Tp/T)² extra in-VMEM compute from lane padding but
    eliminates the O(BH·T²) f32 logits HBM round-trip.  It wins when either
    the padding waste is small (Tp ≤ 1.6·T) or the logits the einsum path
    would materialize are large (≥ 64 MB — e.g. Sandglasset's chunk-axis
    attention at ~1 GB).  Sepformer's S=33 inter pass (ratio 3.9, logits
    17 MB) correctly stays on the einsum path — measured faster there."""
    if backend is None:
        backend = jax.default_backend()
    Tp = _round_up(T, 128)
    if not (backend == "tpu" and Tp <= MAX_T_PAD and dh <= 256):
        return False
    if Tp <= T * 1.6:
        return True
    if batch_heads is not None:
        return batch_heads * T * T * 4 >= 64 * 1024 * 1024
    return False
