"""Fused short-sequence attention — softmax(qᵀ·k/√d)·v in one Pallas kernel.

Why: dual-path attention runs over chunks (Sepformer K=250, DPTNet K=100,
Sandglasset downsampled frames — reference sepformer.py:578-642,
dptnet.py:26-162), so sequence lengths are tiny but the head count × chunk
count batch is huge.  The XLA lowering materializes the [BH, T, T] logits in
f32 through HBM (for Sepformer-base ≈ 128 MB per layer, ~2/3 of the layer's
wall time); this kernel keeps q/k/v AND the logits resident in VMEM per
grid step, so HBM sees only q, k, v once in and the context once out.

Layout: [BH, dh, T_pad] — the SEQUENCE lives in the lane dimension (T_pad a
multiple of 128) and the head dim in sublanes, so no tile is lane-padded
(dh is typically 32–64, far below the 128-lane width; a [T, dh] layout
wastes 4× VMEM and VPU throughput on padding).  Callers fold the layout
change into the qkv/out projection einsums, so no explicit transpose is
materialized.  Each grid step processes a VMEM-budgeted group of heads with
batched dot_general (MXU).  Padded key columns are masked with a large
negative logit before the f32 softmax; padded query rows produce uniform
attention and are sliced off by the caller.

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
_NEG = -1e9


def _kernel(q_ref, k_ref, v_ref, o_ref, *, T: int, Tq: int, scale: float):
    # Tq = round_up(T, 8) ≤ Tp: the query axis is SUBLANES in the logits, so
    # slicing q to the valid rows (sublane granularity 8) before the dot
    # shrinks the f32 logits buffer and — the dominant VPU cost — the
    # softmax by Tq/Tp (47 % at Sandglasset's S=131→256 lane padding).
    # Key lanes can't be cut the same way (128-lane vreg granularity), so
    # padded keys are still masked below.  o lanes ≥ Tq are never written —
    # the caller slices to :T.
    q = q_ref[:, :, :Tq]  # [G, dh, Tq]
    k = k_ref[:]
    v = v_ref[:]
    Tp = k.shape[-1]
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),  # contract dh
        preferred_element_type=jnp.float32,
    ) * scale  # [G, Tq(q), Tp(k)] f32
    if T < Tp:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        logits = jnp.where(col < T, logits, _NEG)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o_ref[:, :, :Tq] = jax.lax.dot_general(
        v,
        attn,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # contract Tp(k)
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)  # [G, dh, Tq(q)]


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
    Tp = _round_up(T, 128)
    Tq = min(_round_up(T, 8), Tp)  # valid query rows, f32 sublane granular
    # VMEM budget: the f32 [G, Tq, Tp] logits are the big buffer — cap ~8 MB
    # (more heads per program amortizes the ~µs per-program overhead, which
    # dominates at huge head counts like Sandglasset's BH=16k, dh=16)
    G = max(1, min(HEADS_PER_BLOCK, (8 << 20) // (Tq * Tp * 4)))
    while BH % G:
        G -= 1
    if T < Tp:
        pad = ((0, 0), (0, 0), (0, Tp - T))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    spec = pl.BlockSpec((G, dh, Tp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, Tq=Tq, scale=scale),
        grid=(BH // G,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, dh, Tp), v.dtype),
    )(q, k, v)
    return out[:, :, :T] if T < Tp else out


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
