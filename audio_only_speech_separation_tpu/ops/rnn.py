"""Scan-based LSTM with fused gates — the TPU answer to cuDNN LSTM.

The reference leans on ``nn.LSTM`` (cuDNN) inside every dual-path model
(reference: look2hear/models/utils/gc3_basics.py:7-24, dprnn.py:40-49,
bsrnn.py:13-34).  On TPU there is no cuDNN; the efficient mapping is:

1. Hoist the input projection out of the recurrence: ``x @ W_ih + b`` is one
   [B*T, D] @ [D, 4H] matmul over the whole sequence — large, batched, MXU.
2. ``lax.scan`` carries only the [B, H] @ [H, 4H] hidden matmul per step.
3. Bidirectional runs both directions in ONE scan by stacking the reversed
   sequence on a direction axis with per-direction weights — halving the
   number of sequential scans.

Dual-path models call this with very short sequences (chunk size K≈100-250,
or n_chunks S) and very large batch (B × n_chunks), which is exactly the
regime where this scan formulation is competitive.

Gate order is torch's (i, f, g, o) so reference checkpoints import directly.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pallas.lstm import (
    bilstm_eligible,
    fused_bilstm,
    resident_bilstm,
    resident_eligible,
)


def lstm_scan(
    x: jnp.ndarray,  # [B, T, D]
    w_ih: jnp.ndarray,  # [D, 4H]
    w_hh: jnp.ndarray,  # [H, 4H]
    bias: Optional[jnp.ndarray],  # [4H] or None
    reverse: bool = False,
) -> jnp.ndarray:
    """Single-direction LSTM; returns hidden states [B, T, H]."""
    B, T, D = x.shape
    H = w_hh.shape[0]
    if resident_eligible(T, B, D, H, 1, x.dtype):
        # whole-sequence VMEM-resident kernel (projection in-kernel);
        # consumes x batch-major
        xt = x[:, ::-1] if reverse else x
        hs = resident_bilstm(
            xt, w_ih[None], w_hh[None], None if bias is None else bias[None]
        )[:, 0]
        if reverse:
            hs = hs[::-1]
        return jnp.swapaxes(hs, 0, 1)
    xw = jnp.einsum(
        "btd,dg->tbg", x, w_ih.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)  # time-major directly: no post-einsum transpose copy
    if bias is not None:
        xw = xw + bias

    if bilstm_eligible(T, B, H, x.dtype):
        # fused Pallas scan (ops/pallas/lstm.py) — single-direction call
        xwd = xw[:, None]  # [T, 1, B, 4H]
        if reverse:
            xwd = xwd[::-1]
        hs = fused_bilstm(xwd, w_hh[None])[:, 0]  # [T, B, H]
        if reverse:
            hs = hs[::-1]
        return jnp.swapaxes(hs, 0, 1)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.einsum(
            "bh,hg->bg", h, w_hh.astype(h.dtype), preferred_element_type=jnp.float32
        ).astype(h.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((B, H), x.dtype),
        jnp.zeros((B, H), x.dtype),
    )
    _, hs = jax.lax.scan(step, init, xw, reverse=reverse)
    if reverse:
        # scan(reverse=True) already emits outputs aligned to input order
        pass
    return jnp.swapaxes(hs, 0, 1)  # [B, T, H]


def bilstm_scan(
    x: jnp.ndarray,  # [B, T, D]
    w_ih: jnp.ndarray,  # [2, D, 4H]
    w_hh: jnp.ndarray,  # [2, H, 4H]
    bias: Optional[jnp.ndarray],  # [2, 4H] or None
    proj_w: Optional[jnp.ndarray] = None,  # [2H, P]: fuse a following Dense
    proj_b: Optional[jnp.ndarray] = None,  # [P]
    proj_act=None,  # optional elementwise fn applied BEFORE the projection
) -> jnp.ndarray:
    """Bidirectional LSTM in a single scan; returns [B, T, 2H] (fwd‖bwd),
    or [B, T, P] when ``proj_w`` is given (the ProjRNN output projection is
    fused into the output einsums — act(concat(fwd, bwd)) @ W ≡
    act(fwd) @ W[:H] + act(bwd) @ W[H:] for any elementwise act — which
    also absorbs the [T→B-major] transpose, so the concat/swapaxes copies
    never materialize)."""
    B, T, D = x.shape
    H = w_hh.shape[1]

    def finish(fwd, bwd):
        # fwd/bwd: [T, B, H], both aligned to input time order
        if proj_w is not None:
            if proj_act is not None:
                fwd, bwd = proj_act(fwd), proj_act(bwd)
            pw = proj_w.astype(fwd.dtype)
            out = jnp.einsum(
                "tbh,hp->btp", fwd, pw[:H], preferred_element_type=jnp.float32
            ) + jnp.einsum(
                "tbh,hp->btp", bwd, pw[H:], preferred_element_type=jnp.float32
            )
            out = out.astype(fwd.dtype)
            return out + proj_b.astype(out.dtype) if proj_b is not None else out
        return jnp.swapaxes(jnp.concatenate([fwd, bwd], axis=-1), 0, 1)

    if resident_eligible(T, B, D, H, 2, x.dtype):
        # whole-sequence VMEM-resident kernel: consumes x batch-major as-is
        # (no transpose/pad copies); both directions come back time-aligned
        hs = resident_bilstm(x, w_ih, w_hh, bias)  # [T, 2, B, H]
        if proj_w is not None:
            # contract the direction axis INSIDE the projection einsum —
            # act(hs) @ [2, H, P] sums fwd/bwd contributions in the matmul,
            # so the two [T, B, H] direction slices (a ~0.3 ms copy each at
            # Sandglasset shapes) never materialize
            h2 = proj_act(hs) if proj_act is not None else hs
            pw = proj_w.astype(hs.dtype).reshape(2, H, -1)
            out = jnp.einsum(
                "tkbh,khp->btp", h2, pw, preferred_element_type=jnp.float32
            ).astype(hs.dtype)
            return out + proj_b.astype(out.dtype) if proj_b is not None else out
        return finish(hs[:, 0], hs[:, 1])
    # Stack forward and time-reversed copies on a direction axis; the einsum
    # emits xw TIME-major directly ("tkbg"), so no [T,2,B,4H]-sized moveaxis
    # copy ever materializes (measured 22 µs/scan on DPRNN shapes).
    xx = jnp.stack([x, x[:, ::-1]], axis=0)  # [2, B, T, D]
    xw = jnp.einsum(
        "kbtd,kdg->tkbg", xx, w_ih.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if bias is not None:
        xw = xw + bias[None, :, None, :]

    if bilstm_eligible(T, B, H, x.dtype):
        hs = fused_bilstm(xw, w_hh)  # [T, 2, B, H]
        return finish(hs[:, 0], hs[:, 1][::-1])

    def step(carry, xt):
        h, c = carry  # [2, B, H]
        gates = xt + jnp.einsum(
            "kbh,khg->kbg", h, w_hh.astype(h.dtype), preferred_element_type=jnp.float32
        ).astype(h.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((2, B, H), x.dtype),
        jnp.zeros((2, B, H), x.dtype),
    )
    _, hs = jax.lax.scan(step, init, xw)  # [T, 2, B, H]
    return finish(hs[:, 0], hs[:, 1][::-1])


def _torch_lstm_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(H), 1/sqrt(H)) — torch nn.LSTM default; H = shape[-1] // 4."""
    h = shape[-1] // 4
    bound = 1.0 / jnp.sqrt(jnp.array(h, jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class LSTM(nn.Module):
    """Unidirectional single-layer LSTM: [B, T, D] → [B, T, H]."""

    hidden_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        H = self.hidden_size
        w_ih = self.param("w_ih", _torch_lstm_init, (D, 4 * H))
        w_hh = self.param("w_hh", _torch_lstm_init, (H, 4 * H))
        b = self.param("bias", _torch_lstm_init, (4 * H,)) if self.use_bias else None
        return lstm_scan(x, w_ih, w_hh, b)


class BiLSTM(nn.Module):
    """Bidirectional single-layer LSTM: [B, T, D] → [B, T, 2H] (or
    [B, T, P] when a following projection is fused in via proj_w/proj_b)."""

    hidden_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, proj_w=None, proj_b=None, proj_act=None):
        D = x.shape[-1]
        H = self.hidden_size
        w_ih = self.param("w_ih", _torch_lstm_init, (2, D, 4 * H))
        w_hh = self.param("w_hh", _torch_lstm_init, (2, H, 4 * H))
        b = (
            self.param("bias", _torch_lstm_init, (2, 4 * H))
            if self.use_bias
            else None
        )
        return bilstm_scan(x, w_ih, w_hh, b, proj_w, proj_b, proj_act)


class _DenseParams(nn.Module):
    """Creates nn.Dense-identical params (kernel/bias, same names, shapes,
    inits) WITHOUT applying them — so a caller can fuse the projection into
    an adjacent op while keeping the param tree checkpoint-compatible."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class MultiLayerLSTM(nn.Module):
    """num_layers stacked (bi)LSTM, torch nn.LSTM(num_layers=L) semantics."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            if self.bidirectional:
                x = BiLSTM(self.hidden_size, name=f"layer_{i}")(x)
            else:
                x = LSTM(self.hidden_size, name=f"layer_{i}")(x)
        return x


class ProjRNN(nn.Module):
    """(Bi)LSTM + Linear projection back to the input width.

    Reference: look2hear/models/utils/gc3_basics.py:7-24.  Input/output
    [B, T, D]; the projection maps hidden_size × num_directions → D.
    """

    hidden_size: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        if self.bidirectional:
            # projection fused into the scan output (one einsum pair absorbs
            # the concat + transpose + Dense — removes 2 copies per scan)
            k, b = _DenseParams(x.shape[-1], 2 * self.hidden_size, name="proj")()
            return BiLSTM(self.hidden_size, name="rnn")(x, k, b)
        h = LSTM(self.hidden_size, name="rnn")(x)
        return nn.Dense(x.shape[-1], name="proj")(h)
