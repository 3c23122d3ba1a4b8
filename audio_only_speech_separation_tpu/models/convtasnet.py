"""Conv-TasNet (reference: look2hear/models/convtasnet.py:148-219).

Pure-conv time-domain separator: free-filter encoder (stride = L//4),
R stacks of X dilated depthwise Conv1D_Blocks, 1×1 mask head with
relu/sigmoid/softmax, transposed-conv decoder.  Quirks preserved: the pad
computation uses stride L//2 while the filterbank strides L//4
(convtasnet.py:184,125,139), and the output crop is
[win−stride : −(rest+win−stride)] (convtasnet.py:214).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import PReLU
from ..ops.conv import Conv1d, ConvDecoder, ConvEncoder, PointwiseConv
from ..ops.norms import CumulativeLayerNorm, GlobalLayerNorm
from . import register_model
from .base import BaseModel, normalize_input, restore_output


class Conv1DBlock(nn.Module):
    """1×1 → PReLU+norm → dilated depthwise → PReLU+norm → 1×1, residual
    (reference convtasnet.py:28-69).

    ``channels_last=True`` executes the same math on [B, T, C] with an
    IDENTICAL param tree (every submodule supports both layouts) — the
    training-throughput layout experiment (round-5 verdict #5).  Only the
    non-causal gLN form is served channels-last (CumulativeLayerNorm has
    no CL variant; the standard configs are all gLN)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    norm_type: str = "gLN"
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):
        causal = self.norm_type == "cLN"
        pad = (
            self.dilation * (self.kernel_size - 1)
            if causal
            else (self.dilation * (self.kernel_size - 1)) // 2
        )
        if self.channels_last:
            assert not causal, "channels-last Conv1DBlock serves gLN only"
            w = PointwiseConv(
                self.out_channels, channels_last=True, name="conv1x1"
            )(x)
            w = GlobalLayerNorm(
                self.out_channels, channels_last=True, name="norm1"
            )(PReLU(name="act1")(w))
            w = Conv1d(
                self.out_channels,
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                padding=pad,
                groups=self.out_channels,
                channels_last=True,
                name="dwconv",
            )(w)
            w = GlobalLayerNorm(
                self.out_channels, channels_last=True, name="norm2"
            )(PReLU(name="act2")(w))
            w = PointwiseConv(
                self.in_channels, channels_last=True, name="sconv"
            )(w)
            return x + w
        norm_cls = CumulativeLayerNorm if causal else GlobalLayerNorm
        w = PointwiseConv(self.out_channels, name="conv1x1")(x)
        w = norm_cls(self.out_channels, name="norm1")(PReLU(name="act1")(w))
        w = Conv1d(
            self.out_channels,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            padding=pad,
            groups=self.out_channels,
            name="dwconv",
        )(w)
        if causal:
            w = w[:, :, :-pad]
        w = norm_cls(self.out_channels, name="norm2")(PReLU(name="act2")(w))
        w = PointwiseConv(self.in_channels, name="sconv")(w)
        return x + w


@register_model
class ConvTasNet(BaseModel):
    N: int = 512
    L: int = 16
    B: int = 128
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 3
    norm: str = "gLN"
    num_spks: int = 2
    activate: str = "relu"
    causal: bool = False
    sample_rate: int = 16000
    n_src: int = 2  # accepted for config parity; num_spks governs
    # channels-last execution ([B, T', C] end to end, identical param
    # tree — every submodule supports both layouts): the training-layout
    # experiment (round-5 verdict #5).  Non-causal gLN configs only.
    channels_last: bool = False

    @nn.compact
    def __call__(self, wav, train: bool = False):  # train: API uniformity; reference applies no dropout here
        x, was_one_d = normalize_input(wav)
        win, pad_stride = self.L, self.L // 2
        fb_stride = self.L // 4  # filterbank stride (convtasnet.py:125)

        # pad (convtasnet.py:187-201): aux pad is win − stride on both ends
        Bsz, T = x.shape
        rest = win - (pad_stride + T % win) % win
        if rest > 0:
            x = jnp.pad(x, ((0, 0), (0, rest)))
        x = jnp.pad(x, ((0, 0), (win - pad_stride, win - pad_stride)))

        if self.channels_last:
            assert not self.causal and self.norm == "gLN", (
                "channels-last ConvTasNet serves the standard non-causal "
                "gLN configs"
            )
            enc = ConvEncoder(
                self.N, win, fb_stride, channels_last=True, name="encoder"
            )(x)  # [B, T', N]
            times = enc.shape[1]
            w = GlobalLayerNorm(self.N, channels_last=True, name="bn_norm")(enc)
            w = PointwiseConv(self.B, channels_last=True, name="bn_conv")(w)
            for r in range(self.R):
                for i in range(self.X):
                    w = Conv1DBlock(
                        self.B,
                        self.H,
                        self.P,
                        dilation=2**i,
                        norm_type=self.norm,
                        channels_last=True,
                        name=f"tcn_{r}_{i}",
                    )(w)
            m = PointwiseConv(
                self.N * self.num_spks, channels_last=True, name="mask_conv"
            )(w)
            if self.activate == "relu":
                m = nn.relu(m)
            elif self.activate == "sigmoid":
                m = jax.nn.sigmoid(m)
            elif self.activate == "softmax":
                m = jax.nn.softmax(m, axis=-1)  # == axis 1 of [B, C, T]
            else:
                raise RuntimeError(
                    f"Unsupported non-linear function: {self.activate}"
                )
            d = m.reshape(Bsz, times, self.num_spks, self.N) * enc[:, :, None, :]
            d = jnp.swapaxes(d, 1, 2).reshape(
                Bsz * self.num_spks, times, self.N
            )
            s = ConvDecoder(
                self.N, win, fb_stride, channels_last=True, name="decoder"
            )(d)
            s = s[:, win - pad_stride : s.shape[-1] - (rest + win - pad_stride)]
            out = s.reshape(Bsz, self.num_spks, -1)
            return restore_output(out, was_one_d)

        enc = ConvEncoder(self.N, win, fb_stride, name="encoder")(x)  # [B, N, T']
        times = enc.shape[-1]

        norm_cls = CumulativeLayerNorm if self.causal else GlobalLayerNorm
        w = norm_cls(self.N, name="bn_norm")(enc)
        w = PointwiseConv(self.B, name="bn_conv")(w)
        for r in range(self.R):
            for i in range(self.X):
                w = Conv1DBlock(
                    self.B,
                    self.H,
                    self.P,
                    dilation=2**i,
                    norm_type=self.norm if not self.causal else "cLN",
                    name=f"tcn_{r}_{i}",
                )(w)

        m = PointwiseConv(self.N * self.num_spks, name="mask_conv")(w)
        if self.activate == "relu":
            m = nn.relu(m)
        elif self.activate == "sigmoid":
            m = jax.nn.sigmoid(m)
        elif self.activate == "softmax":
            m = jax.nn.softmax(m, axis=1)
        else:
            raise RuntimeError(f"Unsupported non-linear function: {self.activate}")

        d = enc[:, None] * m.reshape(Bsz, self.num_spks, self.N, times)
        s = ConvDecoder(self.N, win, fb_stride, name="decoder")(
            d.reshape(Bsz * self.num_spks, self.N, times)
        )
        s = s[:, win - pad_stride : s.shape[-1] - (rest + win - pad_stride)]
        out = s.reshape(Bsz, self.num_spks, -1)
        return restore_output(out, was_one_d)


def fused_inference_forward(
    model: ConvTasNet, params, wav, packed=None, sum_dot: bool = False
):
    """bf16 inference forward: the WHOLE separator — encoder matmul,
    bottleneck gLN+1×1, the R×X Conv1DBlock body, mask head, mask×enc, and
    the decoder synthesis matmul — runs in ONE Pallas kernel (see
    ops/pallas/convtasnet_block.py).  XLA only frames the padded signal and
    overlap-adds the returned decoder frames, so HBM sees the [B, T', L]
    frames once in and the [B, spk, T', L] masked frames once out.  Only
    lane-aligned shapes (N == H, N/B multiples of 128, P=3, X ≤ 8) are
    supported; anything else falls back to ``model.apply``.

    ``packed`` (from ``pack_convtasnet_full_params``) can be precomputed
    once to avoid re-packing weights per call.
    """
    from ..ops.pallas.convtasnet_block import (
        fused_convtasnet_separator,
        pack_convtasnet_full_params,
    )

    if not _fused_shape_ok(model):
        return model.apply(params, wav)
    if packed is None:
        packed = pack_convtasnet_full_params(
            params, model.R, model.X, model.num_spks, sum_dot=sum_dot
        )
    we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils = packed
    # infer the pack's layout so a pre-widened ``packed`` works regardless
    # of the flag the caller passed
    sum_dot = wsgs.shape[2] == w1s.shape[1] + 128

    from ..ops.conv import frame_signal, overlap_add

    x, was_one_d = normalize_input(wav)
    x = x.astype(jnp.bfloat16)
    win, pad_stride = model.L, model.L // 2
    fb_stride = model.L // 4
    Bsz, T = x.shape
    rest = win - (pad_stride + T % win) % win
    if rest > 0:
        x = jnp.pad(x, ((0, 0), (0, rest)))
    x = jnp.pad(x, ((0, 0), (win - pad_stride, win - pad_stride)))

    frames = frame_signal(x, win, fb_stride)  # [B, T', win]
    times = frames.shape[1]
    # alphas are concrete here (offline pack): when every PReLU alpha ≤ 1,
    # the kernel lowers prelu as max(x, a·x) — one VPU op fewer per pass
    import numpy as _np

    prelu_max = bool(_np.all(_np.asarray(alphas) <= 1.0))
    dec_frames = fused_convtasnet_separator(
        frames, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd,
        dilations=dils, nspk=model.num_spks,
        sigmoid=model.activate == "sigmoid", prelu_max=prelu_max,
        sum_dot=sum_dot,
    )  # [B, spk, T', win]
    s = overlap_add(
        dec_frames.reshape(Bsz * model.num_spks, times, win), fb_stride
    )
    s = s[:, win - pad_stride : s.shape[-1] - (rest + win - pad_stride)]
    out = s.reshape(Bsz, model.num_spks, -1)
    return restore_output(out, was_one_d)


def _fused_shape_ok(model: ConvTasNet) -> bool:
    """Shape envelope of the fused kernel: N == H (the bottleneck pseudo-
    block stacks with the TCN weight stream), lane-aligned channel dims,
    3-tap depthwise, dilations within the PAD=128 halo (X ≤ 8), and
    non-causal gLN only (the kernel computes global-LN statistics; a
    norm='cLN' config would need causal cumulative stats).

    H ≤ 512 bounds the kernel's VMEM scratch — the f32-resident h plus
    the encoder tile scale as ~(Tpad+256)·H·4 + Tpad·H·2 bytes against
    the 100 MB ``vmem_limit_bytes`` in ``fused_convtasnet_separator``;
    H=512 with 2–4 s clips sits inside that envelope, larger H would
    fail at Mosaic compile time instead of falling back."""
    return (
        model.N == model.H
        and model.N % 128 == 0
        and model.H <= 512
        and model.B % 128 == 0
        and model.P == 3
        and model.X <= 8
        and not model.causal
        and model.norm == "gLN"
        and model.activate in ("relu", "sigmoid")
    )


def fused_forward_eligible(model: ConvTasNet, backend: str | None = None) -> bool:
    """Whether the whole-separator Pallas kernel serves this config."""
    import jax as _jax

    if backend is None:
        backend = _jax.default_backend()
    return backend == "tpu" and _fused_shape_ok(model)


def make_delayed_train_apply(model: ConvTasNet):
    """Training forward in the fused kernel's ALGEBRA, but as pure
    differentiable XLA ops — the round-5 answer to the training-step
    VPU-chain attribution (docs/BENCHMARKS.md, training section).

    The flax forward materializes two normalized [B, T', H] tensors per
    Conv1DBlock (norm1(h) feeding the depthwise, norm2(v) feeding the
    1×1), each a statistics pass + an affine pass over the widest tensor
    in the model.  This formulation applies the two delayed-norm
    identities the Pallas kernel uses (ops/pallas/convtasnet_block.py):

      * gLN-1 folds into the depthwise taps:  dw(norm1 h) =
        Σₖ(dwₖ·sc1)⊙h±d + (Σₖdwₖ)·sh1 + dwb  (+ edge corrections, since
        the reference zero-pads AFTER normalization) — norm1(h) is never
        materialized;
      * gLN-2 commutes with the following 1×1:  norm2(v)@Ws =
        rstd₂·(v@(γ₂⊙Ws)) + (β₂@Ws + bs − μ₂·rstd₂·γ₂@Ws) — the affine
        runs on the C-wide (4× narrower) matmul OUTPUT.

    Both identities are exact; because this is plain XLA, ``jax.grad``
    differentiates it directly — the savings apply to the backward pass
    too, which is where the training step spends most of its time.
    Weight folds run traced per step (pack_convtasnet_full_params_jnp);
    gradients flow THROUGH the folds to the original param tree, so the
    optimizer state and checkpoints are unchanged.

    bf16 activations / f32 statistics, matching the bf16 training path.
    Returns None for configs the packer doesn't serve (causal/cLN or
    kernel_size ≠ 3).  Reference math: look2hear/models/convtasnet.py:28-116.
    """
    if model.causal or model.norm != "gLN" or model.P != 3:
        return None

    from ..ops.conv import frame_signal, overlap_add
    from ..ops.pallas.convtasnet_block import pack_convtasnet_full_params_jnp

    f32 = jnp.float32
    eps = 1e-8
    nspk = model.num_spks
    # the CPU dot backend rejects bf16×bf16→f32; upcast operands there
    # (tests run this path on CPU; TPU keeps bf16 MXU inputs)
    _cpu = jax.default_backend() == "cpu"

    def _dot(eq, a, b):
        if _cpu:
            a, b = a.astype(f32), b.astype(f32)
        return jnp.einsum(eq, a, b, preferred_element_type=f32)

    def _prelu(x, a):
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)

    def _stats(x):
        """Global-LN mean/rstd over (time, channel) per sample, f32."""
        xf = x.astype(f32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - mean * mean
        return mean, jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)

    def apply_fn(params, wav):
        packed = pack_convtasnet_full_params_jnp(
            params, model.R, model.X, nspk
        )
        we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils = packed
        x, was_one_d = normalize_input(wav)
        x = x.astype(jnp.bfloat16)
        win, pad_stride = model.L, model.L // 2
        fb_stride = model.L // 4
        Bsz, T = x.shape
        rest = win - (pad_stride + T % win) % win
        if rest > 0:
            x = jnp.pad(x, ((0, 0), (0, rest)))
        x = jnp.pad(x, ((0, 0), (win - pad_stride, win - pad_stride)))
        frames = frame_signal(x, win, fb_stride)  # [B, T', win]
        times = frames.shape[1]

        enc = _dot("btw,wh->bth", frames, we).astype(jnp.bfloat16)

        # bottleneck gLN + 1×1 as pseudo-block 0 (delayed-norm form)
        mean, rstd = _stats(enc)
        p0 = _dot("bth,hc->btc", enc, wsgs[0])
        y = rstd * p0 + (cs[0, 0] - mean * rstd * cs[0, 1])  # [B, T', C] f32

        for bi, d in enumerate(dils):
            b = bi + 1
            yb = y.astype(jnp.bfloat16)
            z = _dot("btc,ch->bth", yb, w1s[b]) + vecs[b, 0][None, None, :]
            h = _prelu(z, alphas[b, 0]).astype(jnp.bfloat16)
            mean1, rstd1 = _stats(h)
            # folded tap coefficients are [B, 1, H] vector math in f32,
            # then cast once — the [B, T', H] tap chain itself runs in
            # bf16 (XLA-land is HBM-bound, unlike the in-kernel VPU chain
            # where bf16 was the measured-negative tp_bf16)
            sc1 = vecs[b, 2][None, None, :] * rstd1  # [B, 1, H] f32
            sh1 = vecs[b, 3][None, None, :] - mean1 * sc1
            dw0, dw1v, dw2 = vecs[b, 4], vecs[b, 5], vecs[b, 6]
            c0 = (dw0[None, None, :] * sc1).astype(jnp.bfloat16)
            c1 = (dw1v[None, None, :] * sc1).astype(jnp.bfloat16)
            c2 = (dw2[None, None, :] * sc1).astype(jnp.bfloat16)
            cb = (
                vecs[b, 1][None, None, :]
                + (dw0 + dw1v + dw2)[None, None, :] * sh1
            ).astype(jnp.bfloat16)
            down = jnp.pad(h, ((0, 0), (d, 0), (0, 0)))[:, :times]  # h[t−d]
            up = jnp.pad(h, ((0, 0), (0, d), (0, 0)))[:, d:]  # h[t+d]
            t = down * c0 + h * c1 + up * c2 + cb
            # reference zero-pads AFTER normalization: out-of-range taps
            # contribute 0, not sh1 — strip the folded sh1 term at the
            # edges.  Masked subtracts, NOT .at[].add: a dynamic-update-
            # slice here materializes the full [B, T', H] tensor twice per
            # block (and its VJP again in the backward); the row-mask
            # select fuses into the tap chain.
            row = jnp.arange(times)[None, :, None]
            zb = jnp.zeros((), jnp.bfloat16)
            t = t - jnp.where(
                row < d, (dw0[None, None, :] * sh1).astype(jnp.bfloat16), zb
            )
            t = t - jnp.where(
                row >= times - d,
                (dw2[None, None, :] * sh1).astype(jnp.bfloat16),
                zb,
            )
            v = _prelu(t, alphas[b, 1])
            mean2, rstd2 = _stats(v)
            p = _dot("bth,hc->btc", v, wsgs[b])
            y = y + rstd2 * p + (cs[b, 0] - mean2 * rstd2 * cs[b, 1])

        m = _dot("btc,cn->btn", y.astype(jnp.bfloat16), wm) + bm[0][None, None, :]
        if model.activate == "relu":
            m = jnp.maximum(m, 0.0)
        elif model.activate == "sigmoid":
            m = jax.nn.sigmoid(m)
        else:  # softmax — match the channels-last flax path (axis=-1)
            m = jax.nn.softmax(m, axis=-1)
        dsrc = (
            m.astype(jnp.bfloat16).reshape(Bsz, times, nspk, model.N)
            * enc[:, :, None, :]
        )
        dsrc = jnp.swapaxes(dsrc, 1, 2).reshape(Bsz * nspk, times, model.N)
        dec = _dot("btn,nw->btw", dsrc, wd).astype(jnp.bfloat16)
        s = overlap_add(dec, fb_stride)
        s = s[:, win - pad_stride : s.shape[-1] - (rest + win - pad_stride)]
        out = s.reshape(Bsz, nspk, -1)
        return restore_output(out, was_one_d)

    return apply_fn


def make_kernel_train_apply(model: ConvTasNet):
    """Training forward+backward through the fused Pallas kernels.

    The TCN chain — where the round-5 training trace puts ~80 % of the
    step (docs/BENCHMARKS.md, training section) — runs as a custom-VJP
    pair: the whole-chain fused forward (`fused_tcn_separator`, with
    per-block residual snapshots + gLN stats saved) and the fused
    REVERSE-walk backward (`ops/pallas/convtasnet_backward.py`).  The
    encoder/bottleneck/mask/decoder stay plain XLA einsums (cheap, and
    their autodiff is already matmul-shaped).  Gradients flow through
    the traced weight packing to the original flax param tree, so
    optimizer/checkpoint state is unchanged.

    Returns None for configs outside the fused kernel's envelope.
    Reference hot loop: look2hear/system/audio_litmodule.py:73-88.
    """
    if not fused_forward_eligible(model):
        return None

    from ..ops.conv import frame_signal, overlap_add
    from ..ops.pallas.convtasnet_backward import make_tcn_chain
    from ..ops.pallas.convtasnet_block import pack_convtasnet_full_params_jnp

    f32 = jnp.float32
    eps = 1e-8
    nspk = model.num_spks
    dils = tuple(2**i for i in range(model.X)) * model.R
    chain = make_tcn_chain(dils)

    def apply_fn(params, wav):
        packed = pack_convtasnet_full_params_jnp(
            params, model.R, model.X, nspk
        )
        we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, _ = packed
        x, was_one_d = normalize_input(wav)
        x = x.astype(jnp.bfloat16)
        win, pad_stride = model.L, model.L // 2
        fb_stride = model.L // 4
        Bsz, T = x.shape
        rest = win - (pad_stride + T % win) % win
        if rest > 0:
            x = jnp.pad(x, ((0, 0), (0, rest)))
        x = jnp.pad(x, ((0, 0), (win - pad_stride, win - pad_stride)))
        frames = frame_signal(x, win, fb_stride)  # [B, T', win]
        times = frames.shape[1]

        enc = jnp.einsum(
            "btw,wh->bth", frames, we, preferred_element_type=f32
        ).astype(jnp.bfloat16)

        # bottleneck gLN + 1×1 (delayed form, plain XLA — differentiable)
        ef = enc.astype(f32)
        mean = jnp.mean(ef, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(ef), axis=(1, 2), keepdims=True) - mean * mean
        rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
        p0 = jnp.einsum("bth,hc->btc", enc, wsgs[0], preferred_element_type=f32)
        y0 = (rstd * p0 + (cs[0, 0] - mean * rstd * cs[0, 1])).astype(
            jnp.bfloat16
        )

        y = chain(y0, w1s[1:], wsgs[1:], vecs[1:], cs[1:], alphas[1:])

        m = jnp.einsum(
            "btc,cn->btn", y, wm, preferred_element_type=f32
        ) + bm[0][None, None, :]
        if model.activate == "relu":
            m = jnp.maximum(m, 0.0)
        else:  # sigmoid (the only other fused-eligible activation)
            m = jax.nn.sigmoid(m)
        dsrc = (
            m.astype(jnp.bfloat16).reshape(Bsz, times, nspk, model.N)
            * enc[:, :, None, :]
        )
        dsrc = jnp.swapaxes(dsrc, 1, 2).reshape(Bsz * nspk, times, model.N)
        dec = jnp.einsum(
            "btn,nw->btw", dsrc, wd, preferred_element_type=f32
        ).astype(jnp.bfloat16)
        s = overlap_add(dec, fb_stride)
        s = s[:, win - pad_stride : s.shape[-1] - (rest + win - pad_stride)]
        out = s.reshape(Bsz, nspk, -1)
        return restore_output(out, was_one_d)

    return apply_fn


def make_fused_train_apply(model: ConvTasNet):
    """Training forward through the fused separator kernel.

    Primal: the whole-separator Pallas kernel (bf16, ~3.5× the XLA
    forward).  Backward: XLA recompute — ``jax.vjp`` of ``model.apply`` at
    the same (params, mix), the standard efficient-forward/recompute-
    backward pairing (the two forwards agree to bf16 tolerance, validated
    in docs/PALLAS_VALIDATION.json).  Weight packing runs traced
    (``pack_convtasnet_full_params_jnp``) so the primal consumes live
    param tracers; no gradient flows through the pack.

    Returns None when the kernel doesn't serve this config.  ConvTasNet
    has no dropout (reference convtasnet.py:28-116), so train and eval
    forwards coincide and the kernel is train-valid as-is.
    """
    import jax as _jax

    if not fused_forward_eligible(model):
        return None

    from ..ops.pallas.convtasnet_block import (
        fused_convtasnet_separator,
        pack_convtasnet_full_params_jnp,
    )
    from ..ops.conv import frame_signal, overlap_add

    def _primal(params, wav):
        packed = pack_convtasnet_full_params_jnp(
            params, model.R, model.X, model.num_spks
        )
        we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils = packed
        x, was_one_d = normalize_input(wav)
        x = x.astype(jnp.bfloat16)
        win, pad_stride = model.L, model.L // 2
        fb_stride = model.L // 4
        Bsz, T = x.shape
        rest = win - (pad_stride + T % win) % win
        if rest > 0:
            x = jnp.pad(x, ((0, 0), (0, rest)))
        x = jnp.pad(x, ((0, 0), (win - pad_stride, win - pad_stride)))
        frames = frame_signal(x, win, fb_stride)
        times = frames.shape[1]
        dec_frames = fused_convtasnet_separator(
            frames, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd,
            dilations=dils, nspk=model.num_spks,
            sigmoid=model.activate == "sigmoid",
        )
        s = overlap_add(
            dec_frames.reshape(Bsz * model.num_spks, times, win), fb_stride
        )
        s = s[:, win - pad_stride : s.shape[-1] - (rest + win - pad_stride)]
        out = s.reshape(Bsz, model.num_spks, -1)
        return restore_output(out, was_one_d)

    @_jax.custom_vjp
    def fused_apply(params, wav):
        return _primal(params, wav)

    def _fwd(params, wav):
        return _primal(params, wav), (params, wav)

    def _bwd(res, g):
        params, wav = res
        _, vjp = _jax.vjp(lambda p, w: model.apply(p, w), params, wav)
        dp, dw = vjp(g.astype(jnp.bfloat16) if g.dtype != jnp.bfloat16 else g)
        return dp, dw

    fused_apply.defvjp(_fwd, _bwd)
    return fused_apply
