"""Multi-head attention + positional encodings.

Torch-compatible MHA (packed qkv in_proj, out_proj — the layout of
``nn.MultiheadAttention``, used by Sepformer at reference sepformer.py:124
and TDANet's GlobalAttention at tdanet.py:251-261) so reference checkpoints
map 1:1.  Attention math is pure einsum → XLA fuses the softmax chain and
tiles the matmuls on the MXU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .pallas.attention import attention_eligible, fused_attention_bdt


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params (kernel [in, out], bias [out])
    without applying them — lets the fused-attention path fold the output
    projection into an einsum while keeping the same param pytree."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.out_features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_features,))
            if self.use_bias
            else None
        )
        return k, b


class MultiheadAttention(nn.Module):
    """Self/cross attention on [B, T, E] with torch parameter layout.

    ``dropout`` matches torch's ``nn.MultiheadAttention(dropout=...)``:
    applied to the post-softmax attention weights, train-time only.
    """

    embed_dim: int
    num_heads: int
    use_bias: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Tq, E] — or [B, Tq, K, E] (see below)
        key: Optional[jnp.ndarray] = None,
        value: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, h, Tq, Tk]
        train: bool = False,
    ):
        # Layout-preserving batched self-attention: a 4-D input
        # [B, T, K, E] attends over axis 1 with K as an extra batch axis,
        # WITHOUT the caller transposing to [B·K, T, E].  The two layout
        # changes ride the projection matmuls (einsum "bskd,fd->bkfs" in,
        # "bkes,ef->bskf" out), so no standalone 67 MB transpose is ever
        # materialized — this is the Sandglasset blocks-0/5 path, where
        # [8, 131, 250, 128] moved through 2 physical transposes per block.
        E, h = self.embed_dim, self.num_heads
        dh = E // h
        w_in = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * E, E)
        )
        b_in = (
            self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
            if self.use_bias
            else None
        )
        w_out, b_out = _DenseParams(E, E, self.use_bias, name="out_proj")()
        if query.ndim == 4:
            assert key is None and value is None and mask is None
            drop = (
                nn.Dropout(self.dropout, deterministic=not train)
                if self.dropout > 0.0
                else None
            )
            return _mha_batched_axis1(
                E, h, query, w_in, b_in, w_out, b_out, drop, train
            )
        key = query if key is None else key
        value = key if value is None else value
        wq, wk, wv = jnp.split(w_in, 3, axis=0)

        def proj(x, w, b):
            y = jnp.einsum("bte,fe->btf", x, w, preferred_element_type=x.dtype)
            return y + b if b is not None else y

        if b_in is not None:
            bq, bk, bv = jnp.split(b_in, 3)
        else:
            bq = bk = bv = None

        # fused VMEM-resident kernel for short self-attention: the einsum
        # path materializes f32 [B,h,T,T] logits through HBM, which
        # dominates dual-path transformer wall time (ops/pallas/attention).
        # The [B*h, dh, T] kernel layout is folded into the projection
        # einsums, so no transpose is materialized.
        use_kernel = (
            mask is None
            and not (train and self.dropout > 0.0)
            and query is key
            and key is value
            and attention_eligible(query.shape[1], dh, query.shape[0] * h)
        )
        if use_kernel:
            B, T, _ = query.shape
            # single packed qkv projection (one [E, 3E] matmul — 3× the MXU
            # tile work of separate q/k/v einsums), output already in the
            # kernel's features-in-sublanes layout
            qkv = jnp.einsum(
                "bte,fe->bft", query, w_in.astype(query.dtype),
                preferred_element_type=jnp.float32,
            ).astype(query.dtype)  # [B, 3E, T]
            if b_in is not None:
                qkv = qkv + b_in.astype(qkv.dtype)[None, :, None]
            q3, k3, v3 = jnp.split(qkv, 3, axis=1)

            o = fused_attention_bdt(
                q3.reshape(B * h, dh, T),
                k3.reshape(B * h, dh, T),
                v3.reshape(B * h, dh, T),
            ).reshape(B, h, dh, T)
            # output projection folded over the [h, dh] layout
            out = jnp.einsum(
                "bdt,df->btf", o.reshape(B, E, T), w_out.astype(o.dtype),
                preferred_element_type=jnp.float32,
            ).astype(o.dtype)
            if b_out is not None:
                out = out + b_out.astype(out.dtype)
            return out

        q = proj(query, wq, bq).reshape(*query.shape[:2], h, dh)
        k = proj(key, wk, bk).reshape(*key.shape[:2], h, dh)
        v = proj(value, wv, bv).reshape(*value.shape[:2], h, dh)

        scale = 1.0 / np.sqrt(dh)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        if self.dropout > 0.0:
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=v.dtype)
        out = out.reshape(*query.shape[:2], E)
        out = jnp.einsum(
            "bte,ef->btf", out, w_out.astype(out.dtype),
            preferred_element_type=jnp.float32,
        ).astype(out.dtype)
        if b_out is not None:
            out = out + b_out.astype(out.dtype)
        return out


def _mha_batched_axis1(E, h, x, w_in, b_in, w_out, b_out, drop, train):
    """Self-attention over axis 1 of [B, T, K, E] with K as batch.

    The fused kernel wants [B', dh, T] (tokens in lanes); producing that
    from [B, T, K, E] is a single einsum per projection — the relayout is
    absorbed into the matmul instead of a standalone transpose pass."""
    dh = E // h
    B, T, K, _ = x.shape

    use_kernel = drop is None and attention_eligible(T, dh, B * K * h)
    if use_kernel:
        qkv = jnp.einsum(
            "btke,fe->bkft", x, w_in.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # [B, K, 3E, T]
        if b_in is not None:
            qkv = qkv + b_in.astype(qkv.dtype)[None, None, :, None]
        q3, k3, v3 = jnp.split(qkv, 3, axis=2)
        o = fused_attention_bdt(
            q3.reshape(B * K * h, dh, T),
            k3.reshape(B * K * h, dh, T),
            v3.reshape(B * K * h, dh, T),
        ).reshape(B, K, E, T)
        out = jnp.einsum(
            "bket,ef->btkf", o, w_out.astype(o.dtype),
            preferred_element_type=jnp.float32,
        ).astype(o.dtype)  # back to [B, T, K, E] via the out-proj matmul
        if b_out is not None:
            out = out + b_out.astype(out.dtype)
        return out

    wq, wk, wv = jnp.split(w_in, 3, axis=0)
    if b_in is not None:
        bq, bk, bv = jnp.split(b_in, 3)
    else:
        bq = bk = bv = None

    def proj(w, b):
        y = jnp.einsum("btke,fe->btkf", x, w, preferred_element_type=x.dtype)
        if b is not None:
            y = y + b
        return y.reshape(B, T, K, h, dh)

    q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
    scale = 1.0 / np.sqrt(dh)
    logits = jnp.einsum(
        "bqkhd,btkhd->bkhqt", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    if drop is not None:
        attn = drop(attn)
    out = jnp.einsum("bkhqt,btkhd->bqkhd", attn, v, preferred_element_type=v.dtype)
    out = out.reshape(B, T, K, E)
    out = jnp.einsum(
        "btke,ef->btkf", out, w_out.astype(out.dtype),
        preferred_element_type=jnp.float32,
    ).astype(out.dtype)
    if b_out is not None:
        out = out + b_out.astype(out.dtype)
    return out


def sinusoidal_positions(max_len: int, d_model: int, dtype=jnp.float32):
    """Sinusoidal table [max_len, d_model] (reference sepformer.py:53-80)."""
    pos = np.arange(max_len)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    table = np.zeros((max_len, d_model))
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div[: (d_model + 1) // 2][: table[:, 1::2].shape[1]])
    return jnp.asarray(table, dtype)


class PositionalEncoding(nn.Module):
    """Adds fixed sinusoidal positions to [B, T, E]."""

    d_model: int
    max_len: int = 10000

    @nn.compact
    def __call__(self, x):
        T = x.shape[1]
        table = sinusoidal_positions(T, self.d_model, x.dtype)
        return x + table[None]
