"""Filterbank encoder/decoder and conv wrappers, TPU-first.

The reference uses ``nn.Conv1d(1, N, win, stride=win//2, bias=False)`` as a
learned analysis filterbank and ``nn.ConvTranspose1d(N, 1, win, stride)`` as
the synthesis filterbank (reference: gc3_network.py:49,105;
convtasnet.py:119-145).  A length-`win` conv over a 1-channel signal is just
a framed matmul — we implement it that way so the FLOPs land on the MXU as a
single large [B*n_frames, win] @ [win, N] product instead of a conv with a
tiny spatial kernel.

``frame_signal``/``overlap_add`` use only reshapes/slices when
``win % stride == 0`` (true for every reference config) so XLA lowers them to
layout ops; a gather fallback covers the general case.

Channel-domain convs (1×1, dilated depthwise TCN) wrap ``jax.lax`` convs via
a torch-layout-compatible ``Conv1d`` module operating on [B, C, T].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def frame_signal(x: jnp.ndarray, win: int, stride: int) -> jnp.ndarray:
    """x: [B, T] → frames [B, n_frames, win], n = (T - win)//stride + 1."""
    B, T = x.shape
    n = (T - win) // stride + 1
    if win % stride == 0:
        r = win // stride
        # cover exactly the samples the n frames touch
        usable = (n - 1 + r) * stride
        chunks = x[:, :usable].reshape(B, -1, stride)  # [B, n-1+r, stride]
        parts = [chunks[:, j : j + n] for j in range(r)]  # r × [B, n, stride]
        return jnp.concatenate(parts, axis=2)  # [B, n, win]
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(win)[None, :]
    return x[:, idx]


def overlap_add(frames: jnp.ndarray, stride: int) -> jnp.ndarray:
    """frames: [B, n, win] → signal [B, (n-1)*stride + win] by overlap-add.

    For win % stride == 0 the r = win/stride overlapping contributions are
    summed as PADDED SLICES (out[j:j+n] view of chunk j) instead of
    ``.at[].add`` scatters — XLA fuses the pads+adds into one elementwise
    kernel, where the scatter form lowered to r separate update ops
    (measured on the ConvTasNet bench path: the scatter OA dominated the
    +1.3 ms/iter XLA glue around the fused separator kernel)."""
    B, n, win = frames.shape
    T = (n - 1) * stride + win
    if win % stride == 0:
        r = win // stride
        chunks = frames.reshape(B, n, r, stride)
        out = None
        for j in range(r):
            cj = jnp.pad(chunks[:, :, j], ((0, 0), (j, r - 1 - j), (0, 0)))
            out = cj if out is None else out + cj
        return out.reshape(B, -1)[:, :T]
    out = jnp.zeros((B, T), frames.dtype)
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(win)[None, :]
    return out.at[:, idx].add(frames)


def frame_axis1(x: jnp.ndarray, win: int, stride: int) -> jnp.ndarray:
    """x: [B, T, D] → frames [B, n, win, D] over axis 1 (channels trail).

    Same reshape/concat lowering as ``frame_signal`` when
    ``win % stride == 0`` — no relayout of the D axis, which is the point:
    chunking a channels-last feature tensor costs slices, not a transpose.
    """
    B, T, D = x.shape
    n = (T - win) // stride + 1
    if win % stride == 0:
        r = win // stride
        usable = (n - 1 + r) * stride
        chunks = x[:, :usable].reshape(B, -1, stride, D)
        parts = [chunks[:, j : j + n] for j in range(r)]
        return jnp.concatenate(parts, axis=2)
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(win)[None, :]
    return x[:, idx]


def overlap_add_axis1(frames: jnp.ndarray, stride: int) -> jnp.ndarray:
    """frames: [B, n, win, D] → [B, (n-1)*stride + win, D] overlap-add
    over axis 1 (the channels-last dual of ``overlap_add``, same padded-
    slice lowering)."""
    B, n, win, D = frames.shape
    T = (n - 1) * stride + win
    if win % stride == 0:
        r = win // stride
        chunks = frames.reshape(B, n, r, stride, D)
        out = None
        for j in range(r):
            cj = jnp.pad(
                chunks[:, :, j], ((0, 0), (j, r - 1 - j), (0, 0), (0, 0))
            )
            out = cj if out is None else out + cj
        return out.reshape(B, -1, D)[:, :T]
    out = jnp.zeros((B, T, D), frames.dtype)
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(win)[None, :]
    return out.at[:, idx].add(frames)


class ConvEncoder(nn.Module):
    """Learned analysis filterbank: [B, T] → [B, N, n_frames].

    Torch-equivalent: Conv1d(1, N, win, stride, bias=False) with
    xavier-uniform init (reference gc3_network.py:49-50).
    """

    out_channels: int
    win: int
    stride: int
    use_bias: bool = False
    channels_last: bool = False  # True: return [B, n, N] (no final swap)

    @nn.compact
    def __call__(self, x):  # [B, T]
        w = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (self.win, self.out_channels),
        )
        frames = frame_signal(x, self.win, self.stride)  # [B, n, win]
        y = jnp.einsum(
            "bnw,wc->bnc", frames, w.astype(frames.dtype),
            preferred_element_type=jnp.float32,
        ).astype(frames.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b
        if self.channels_last:
            return y  # [B, n, N]
        return jnp.swapaxes(y, 1, 2)  # [B, N, n]


class ConvDecoder(nn.Module):
    """Learned synthesis filterbank: [B, N, n_frames] → [B, T].

    Torch-equivalent: ConvTranspose1d(N, 1, win, stride, bias=False)
    (reference gc3_network.py:105-106).
    """

    in_channels: int
    win: int
    stride: int
    channels_last: bool = False  # True: input is [B, n, N]

    @nn.compact
    def __call__(self, x):  # [B, N, n] ([B, n, N] when channels_last)
        w = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (self.in_channels, self.win),
        )
        eq = "bnc,cw->bnw" if self.channels_last else "bcn,cw->bnw"
        frames = jnp.einsum(
            eq, x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)  # [B, n, win]
        return overlap_add(frames, self.stride)


class Conv1d(nn.Module):
    """Torch-layout Conv1d on [B, C, T] with explicit symmetric padding.

    Supports dilation and grouped/depthwise convs; weight layout is the flax
    [receptive, in_per_group, out] convention internally, exposed only through
    this module.  ``padding`` is an int (zeros both sides), matching how the
    reference's TCN computes its own padding (reference tcn.py:6-37).

    ``channels_last=True`` switches input/output to [B, T, C] and lowers the
    conv as shifted slices instead of lax conv: depthwise becomes k fused
    elementwise multiplies, dense becomes k MXU matmuls (or ONE matmul when
    C_in == 1, the encoder-filterbank case).  On TPU this avoids both the
    [B, C, T] relayout around every conv and XLA's slow grouped-conv
    lowering, which is where TDANet/AFRCNN lost an order of magnitude.
    The parameter pytree (names, shapes, layout) is IDENTICAL between the
    two modes, so reference-weight import and checkpoints are unaffected.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):  # [B, C, T] (or [B, T, C] when channels_last)
        if self.channels_last:
            # child is named Conv_0 so the param pytree matches the lax path
            return _ShiftedConv(
                self.out_channels,
                self.kernel_size,
                self.stride,
                self.padding,
                self.dilation,
                self.groups,
                self.use_bias,
                name="Conv_0",
            )(x)
        if (
            self.groups == self.out_channels
            and x.shape[1] == self.out_channels
            and self.stride == 1
        ):
            # Depthwise stride-1 on [B, C, T]: k shifted per-channel
            # multiplies along T.  XLA's grouped-conv lowering — and above
            # all its BACKWARD (per-channel weight grads lower to giant
            # reduce-windows) — is far off roofline on TPU; the pad/slice/
            # multiply-add form has an equally cheap VJP (round-4 measured:
            # ConvTasNet train step 86.0 → see docs/BENCHMARKS.md).  Param
            # path/layout identical to the nn.Conv branch (child "Conv_0",
            # kernel [k, 1, C]).
            return _ShiftedDepthwiseCF(
                self.out_channels,
                self.kernel_size,
                self.padding,
                self.dilation,
                self.use_bias,
                name="Conv_0",
            )(x)
        y = jnp.swapaxes(x, 1, 2)  # [B, T, C]
        y = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
        )(y)
        return jnp.swapaxes(y, 1, 2)


class _ShiftedDepthwiseCF(nn.Module):
    """Depthwise stride-1 conv on [B, C, T] as k shifted multiplies.

    Parameter-interchangeable with the nn.Conv lowering in Conv1d (kernel
    [k, 1, C], bias [C], same default inits)."""

    channels: int
    kernel_size: int
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # [B, C, T] → [B, C, T_out]
        B, C, T = x.shape
        k, d, p = self.kernel_size, self.dilation, self.padding
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, 1, self.channels)
        ).astype(x.dtype)
        T_out = T + 2 * p - d * (k - 1)
        xp = jnp.pad(x, ((0, 0), (0, 0), (p, p))) if p else x
        y = None
        for j in range(k):
            yj = xp[:, :, j * d : j * d + T_out] * w[j, 0][None, :, None]
            y = yj if y is None else y + yj
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.channels,))
            y = y + b.astype(x.dtype)[None, :, None]
        return y


class _ShiftedConv(nn.Module):
    """Channels-last conv on [B, T, C] lowered as shifted strided slices.

    Same kernel layout/init as flax nn.Conv ([k, in_per_group, out]), so it
    is parameter-interchangeable with the lax-conv path in Conv1d.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # [B, T, C] → [B, T_out, out]
        B, T, C = x.shape
        k, s, d, p = self.kernel_size, self.stride, self.dilation, self.padding
        in_pg = C // self.groups
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, in_pg, self.out_channels),
        ).astype(x.dtype)
        T_out = (T + 2 * p - d * (k - 1) - 1) // s + 1
        xp = jnp.pad(x, ((0, 0), (p, p), (0, 0))) if p else x

        def tap(j):  # j-th kernel tap as a strided [B, T_out, C] slice
            start = j * d
            return jax.lax.slice(
                xp, (0, start, 0), (B, start + (T_out - 1) * s + 1, C), (1, s, 1)
            )

        if self.groups == C and self.out_channels == C:
            # depthwise: k shifted per-channel multiplies (pure elementwise,
            # fuses with neighboring ops instead of XLA's grouped conv)
            if s == 2 and d == 1:
                # even/odd decomposition: tap(j) = xp[j + 2t] =
                # parity-half(j)[j//2 + t] — 2 strided slices total instead
                # of k (strided slices don't fuse and are real time in the
                # conv-pyramid models)
                halves = (
                    jax.lax.slice(xp, (0, 0, 0), (B, ((xp.shape[1] - 1) // 2) * 2 + 1, C), (1, 2, 1)),
                    jax.lax.slice(xp, (0, 1, 0), (B, ((xp.shape[1] - 2) // 2) * 2 + 2, C), (1, 2, 1)),
                )
                y = None
                for j in range(k):
                    hj = halves[j % 2][:, j // 2 : j // 2 + T_out]
                    yj = hj * w[j, 0]
                    y = yj if y is None else y + yj
            else:
                y = tap(0) * w[0, 0]
                for j in range(1, k):
                    y = y + tap(j) * w[j, 0]
        elif C == 1:
            # single-channel input (learned filterbank): one framed matmul
            frames = jnp.concatenate([tap(j) for j in range(k)], axis=-1)
            y = jnp.einsum(
                "btk,ko->bto", frames, w[:, 0, :],
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        elif self.groups == 1:
            y = None
            for j in range(k):
                yj = jnp.einsum(
                    "btc,co->bto", tap(j), w[j],
                    preferred_element_type=jnp.float32,
                )
                y = yj if y is None else y + yj
            y = y.astype(x.dtype)
        else:
            G = self.groups
            opg = self.out_channels // G
            y = None
            for j in range(k):
                sl = tap(j).reshape(B, T_out, G, in_pg)
                yj = jnp.einsum(
                    "btgc,cgo->btgo", sl, w[j].reshape(in_pg, G, opg),
                    preferred_element_type=jnp.float32,
                )
                y = yj if y is None else y + yj
            y = y.reshape(B, T_out, self.out_channels).astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b.astype(y.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Torch-semantics ConvTranspose1d on [B, C, T].

    out[b, o, i*stride + j] += Σ_c x[b, c, i] · w[c, o, j] — implemented as
    one channel-mixing einsum (MXU) + overlap-add (layout ops), with the
    kernel stored in the torch [in, out, k] layout so reference weights
    import verbatim.  (flax's nn.ConvTranspose uses a different kernel
    convention — fractionally-strided conv without the flip — which does
    NOT match torch; see tests/test_torch_parity.py.)
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):  # [B, C, T] ([B, T, C] when channels_last)
        if self.channels_last:
            B, T, C = x.shape
        else:
            B, C, T = x.shape
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (C, self.out_channels, self.kernel_size),
        )
        eq = "btc,cok->botk" if self.channels_last else "bct,cok->botk"
        frames = jnp.einsum(
            eq, x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)  # [B, out, T, k]
        out = overlap_add(
            frames.reshape(B * self.out_channels, T, self.kernel_size), self.stride
        ).reshape(B, self.out_channels, -1)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b[None, :, None]
        return out


class PointwiseConv(nn.Module):
    """1×1 conv on [B, C, T] — a channel matmul, straight to the MXU.

    ``channels_last=True`` takes/returns [B, T, C]: the contraction axis is
    then minor in both operands, which is the MXU-native layout (no relayout
    inserted by XLA).  Param pytree is identical in both modes.
    """

    out_channels: int
    use_bias: bool = True
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):  # [B, C, T] ([B, T, C] when channels_last)
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1 if self.channels_last else 1], self.out_channels),
        )
        eq = "btc,cd->btd" if self.channels_last else "bct,cd->bdt"
        y = jnp.einsum(
            eq, x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + (b if self.channels_last else b[None, :, None]).astype(y.dtype)
        return y
