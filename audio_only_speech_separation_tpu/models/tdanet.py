"""TDANet — top-down attention encoder-decoder (reference: tdanet.py:407-527).

UConvBlock pyramid (stride-2 depthwise downsampling) → pooled multi-scale
sum → GlobalAttention (MHA + conv-MLP) → sigmoid-gated InjectionMultiSum
fusion back to each scale → weight-shared Recurrent iteration.

TPU mapping: the full model executes channels-last ([B, T, C]) — 1×1 convs
are MXU matmuls with minor contraction axes, depthwise convs are shifted
elementwise multiplies, pooling is reshape-mean and nearest upsampling a
broadcast repeat.  Parameter pytree matches the channels-first modules, so
reference-weight import is unchanged.

Reference quirks preserved exactly:
- MultiHeadAttention adds dropout(output) to *output*, not the input
  (tdanet.py:247) — at eval this doubles the attention output;
- the last_layer collapse at i == depth−2 fuses ``x_fused[i-1]`` (not i+1)
  and never touches the deepest scale (tdanet.py:362-366).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import PReLU
from ..ops.attention import MultiheadAttention, sinusoidal_positions
from ..ops.conv import Conv1d, ConvTranspose1d, PointwiseConv
from ..ops.dropout import DropPath
from ..ops.norms import GlobalLayerNorm
from ..ops.resample import adaptive_avg_pool1d, interpolate_nearest
from . import register_model
from .base import BaseModel
from .blocks.dprnn import DepthwiseGate
from .blocks.sudo import ConvNorm, ConvNormAct, DilatedConvNorm


class Mlp(nn.Module):
    """1×1 → depthwise 5-conv → ReLU → drop → 1×1 → drop (tdanet.py:197-213)."""

    in_features: int
    hidden_size: int
    drop: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, C]
        h = ConvNorm(self.hidden_size, 1, use_bias=False, channels_last=True, name="fc1")(x)
        h = Conv1d(
            self.hidden_size,
            kernel_size=5,
            padding=2,
            groups=self.hidden_size,
            channels_last=True,
            name="dwconv",
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(self.drop, deterministic=not train)(h)
        h = ConvNorm(self.in_features, 1, use_bias=False, channels_last=True, name="fc2")(h)
        return nn.Dropout(self.drop, deterministic=not train)(h)


class TDAAttention(nn.Module):
    """Pos-enc + LayerNorm + MHA + post-norm on [B, T, C] (tdanet.py:232-248).

    Faithful to TWO reference quirks:
    1. the batch-first [B, T, C] tensor is fed to a seq-first torch MHA
       (tdanet.py:246), so attention actually runs over the BATCH axis,
       batched over T (positions are still indexed by T);
    2. the residual is output + dropout(output) — at eval 2×output — not
       input + output (tdanet.py:247).
    """

    channels: int
    n_head: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, C]
        h = nn.LayerNorm(epsilon=1e-5, name="attn_in_norm")(x)
        h = h + sinusoidal_positions(h.shape[1], self.channels, h.dtype)[None]
        # (batch=T, seq=B): reference's seq-first misuse, replicated
        hq = jnp.swapaxes(h, 0, 1)  # [T, B, C]
        out = MultiheadAttention(
            self.channels, self.n_head, dropout=self.dropout, name="attn"
        )(hq, train=train)
        out = jnp.swapaxes(out, 0, 1)  # [B, T, C]
        # residual is output + dropout(output) — identity-doubled at eval
        return nn.LayerNorm(epsilon=1e-5, name="norm")(
            out + nn.Dropout(self.dropout, deterministic=not train)(out)
        )


class GlobalAttention(nn.Module):
    """attn/mlp residuals under DropPath 0.1 (tdanet.py:251-261,329)."""

    in_chan: int
    out_chan: int
    drop_path: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, C]
        dp = DropPath(self.drop_path, name="drop_path")
        x = x + dp(TDAAttention(self.out_chan, name="attn")(x, train=train), train)
        x = x + dp(Mlp(self.out_chan, self.out_chan * 2, name="mlp")(x, train=train), train)
        return x


class InjectionMultiSum(nn.Module):
    """Sigmoid-gated local/global fusion (tdanet.py:264-290), on [B, T, C]."""

    inp: int
    oup: int
    kernel: int = 1

    @nn.compact
    def __call__(self, x_local, x_global):
        groups = self.inp if self.inp == self.oup else 1
        T = x_local.shape[1]
        local_feat = ConvNorm(
            self.oup, self.kernel, groups=groups, use_bias=False,
            channels_last=True, name="local_embedding",
        )(x_local)
        g_act = ConvNorm(
            self.oup, self.kernel, groups=groups, use_bias=False,
            channels_last=True, name="global_act",
        )(x_global)
        sig = interpolate_nearest(nn.sigmoid(g_act), T, axis=1)
        g_feat = ConvNorm(
            self.oup, self.kernel, groups=groups, use_bias=False,
            channels_last=True, name="global_embedding",
        )(x_global)
        g_feat = interpolate_nearest(g_feat, T, axis=1)
        return local_feat * sig + g_feat


class TDAUConvBlock(nn.Module):
    """Pyramid + global attention + injection fusion (tdanet.py:293-368)."""

    out_channels: int = 128
    in_channels: int = 512
    upsampling_depth: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, C]
        residual = x
        y = ConvNormAct(self.in_channels, 1, channels_last=True, name="proj_1x1")(x)
        pyramid = [
            DilatedConvNorm(
                self.in_channels, 5, stride=1, groups=self.in_channels,
                channels_last=True, name="spp_0",
            )(y)
        ]
        for k in range(1, self.upsampling_depth):
            pyramid.append(
                DilatedConvNorm(
                    self.in_channels, 5, stride=2, groups=self.in_channels,
                    channels_last=True, name=f"spp_{k}",
                )(pyramid[-1])
            )
        # global: pooled sum of all scales at the deepest resolution
        T_last = pyramid[-1].shape[1]
        global_f = sum(adaptive_avg_pool1d(f, T_last, axis=1) for f in pyramid)
        global_f = GlobalAttention(
            self.in_channels * self.upsampling_depth, self.in_channels, name="globalatt"
        )(global_f, train=train)

        fused = [
            InjectionMultiSum(self.in_channels, self.in_channels, name=f"fus_{i}")(
                pyramid[i], global_f
            )
            for i in range(self.upsampling_depth)
        ]

        expanded = None
        for i in range(self.upsampling_depth - 2, -1, -1):
            other = fused[i - 1] if i == self.upsampling_depth - 2 else expanded
            expanded = InjectionMultiSum(
                self.in_channels, self.in_channels, 5, name=f"last_{i}"
            )(fused[i], other)
        return (
            PointwiseConv(self.out_channels, channels_last=True, name="res_conv")(expanded)
            + residual
        )


class Recurrent(nn.Module):
    """Weight-shared iterated blocks with input re-injection (tdanet.py:371-404)."""

    out_channels: int
    in_channels: int
    upsampling_depth: int
    iters: int
    unfold: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, C]
        mixture = x
        if self.unfold:
            unet = TDAUConvBlock(
                self.out_channels, self.in_channels, self.upsampling_depth, name="unet"
            )
            gate = DepthwiseGate(self.out_channels, channels_last=True, name="concat_block")
            for i in range(self.iters):
                x = unet(x, train) if i == 0 else unet(gate(mixture + x), train)
        else:
            for i in range(self.iters):
                block = TDAUConvBlock(
                    self.out_channels,
                    self.in_channels,
                    self.upsampling_depth,
                    name=f"unet_{i}",
                )
                if i == 0:
                    x = block(x, train)
                else:
                    g = DepthwiseGate(
                        self.out_channels, channels_last=True, name=f"concat_block_{i-1}"
                    )
                    x = block(g(mixture + x), train)
        return x


@register_model
class TDANet(BaseModel):
    out_channels: int = 128
    in_channels: int = 512
    num_blocks: int = 16
    upsampling_depth: int = 4
    enc_kernel_size: int = 21  # milliseconds (tdanet.py:426)
    num_sources: int = 2
    sample_rate: int = 16000
    unfold: bool = True

    @nn.compact
    def __call__(self, wav, train: bool = False):
        was_one_d = wav.ndim == 1
        if wav.ndim == 1:
            wav = wav[None]
        elif wav.ndim == 3:
            wav = wav[:, 0]

        k = self.enc_kernel_size * self.sample_rate // 1000
        stride = k // 4
        basis = k // 2 + 1
        B, T = wav.shape
        rest = k - (stride + T % k) % k
        if rest > 0:
            wav = jnp.pad(wav, ((0, 0), (0, rest)))
        wav = jnp.pad(wav, ((0, 0), (k - stride, k - stride)))

        # encoder conv(1→basis, k, stride, padding=k//2): framed matmul
        enc = Conv1d(
            basis,
            kernel_size=k,
            stride=stride,
            padding=k // 2,
            use_bias=False,
            channels_last=True,
            name="encoder",
        )(wav[:, :, None])  # [B, T', basis]
        s = enc
        h = GlobalLayerNorm(basis, eps=1e-8, channels_last=True, name="ln")(enc)
        h = PointwiseConv(self.out_channels, channels_last=True, name="bottleneck")(h)
        h = Recurrent(
            self.out_channels,
            self.in_channels,
            self.upsampling_depth,
            self.num_blocks,
            self.unfold,
            name="sm",
        )(h, train=train)
        h = PReLU(name="mask_act")(h)
        h = PointwiseConv(
            self.num_sources * basis, channels_last=True, name="mask_conv"
        )(h)
        # [B, T', spk·basis] → [B, T', spk, basis] (spk-major channel order,
        # same as the channels-first reshape (B, spk, basis, T'))
        mask = nn.relu(h.reshape(B, -1, self.num_sources, basis))
        masked = mask * s[:, :, None, :]  # [B, T', spk, basis]

        # decoder ConvTranspose1d(basis·spk → spk, k, stride, padding=k//2)
        dec = ConvTranspose1d(
            self.num_sources,
            kernel_size=k,
            stride=stride,
            use_bias=False,
            channels_last=True,
            name="decoder",
        )(masked.reshape(B, -1, self.num_sources * basis))
        p = k // 2
        dec = dec[:, :, p : dec.shape[-1] - p]
        crop = k - stride
        out = dec[:, :, crop : dec.shape[-1] - (rest + crop)]
        return out[0] if was_one_d else out


# ---------------------------------------------------------------------------
# Analytic-moment fast inference forward
# ---------------------------------------------------------------------------
#
# The XLA graph of TDAUConvBlock is HBM-traffic-bound: every ConvNorm's gLN
# forces a materialization, and the 9 InjectionMultiSum gates per iteration
# re-read their [B, T, 512]-scale operands (docs/BENCHMARKS.md, TDANet
# roofline).  But almost every one of those materializations is avoidable
# algebraically: a gLN is a per-channel affine once its two scalar statistics
# are known, and an affine composed with a depthwise conv or another gLN is
# still an affine.  Concretely, for per-channel moments mu_c = E_t[x_tc],
# q_c = E_t[x²_tc] of a raw tensor x and any channel-affine y = a⊙x + c:
#
#     gLN stats of y:  mu = mean_c(a_c mu_c + c_c)
#                      E[y²] = mean_c(a_c² q_c + 2 a_c c_c mu_c + c_c²)
#
# so gLN(w ⊙ (a⊙x + c)) — the InjectionMultiSum local_embedding applied to a
# normalized pyramid scale — is *itself* a channel-affine of x, computed from
# [C]-sized vector math with NO pass over the tensor.  The fast forward keeps
# only the raw depthwise-conv outputs d_k per scale (one producing pass +
# one moments reduce each) and folds every norm into:
#   - the next scale's conv taps (with exact zero-pad edge corrections on the
#     folded shift term: rows 0 and T_out−1 only, for stride 2 / k=5 / pad 2),
#   - the adaptive-pool contribution (pool commutes with affine),
#   - the fused_i combine pass (one read of d_k total).
# Statistics math runs in f32; tensors stay in the input dtype.
#
# Reference parity: same params, same math as TDANet.__call__ (reference
# tdanet.py:293-368) — pinned by tests/test_tdanet_fast.py in f32 on CPU.


def _f32(v):
    return jnp.asarray(v, jnp.float32)


def _prelu_s(x, alpha):
    return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def _gln_real(x, norm_p, eps):
    """Materialized gLN over (T, C) of [B, T, C] (GlobalLayerNorm parity)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2), keepdims=True)
    y = (xf - mu) / jnp.sqrt(var + eps)
    g, b = _f32(norm_p["gamma"]), _f32(norm_p["beta"])
    return (y * g[None, None, :] + b[None, None, :]).astype(x.dtype)


def _ln_last(x, p, eps=1e-5):
    """flax LayerNorm over the last axis (scale/bias params)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) / jnp.sqrt(var + eps)
    return (y * _f32(p["scale"]) + _f32(p["bias"])).astype(x.dtype)


def _dw5(x, w5, stride):
    """Depthwise k=5 conv on [B, T, C], zero pad 2, shifted-slice lowering
    (same lowering as ops.conv._ShiftedConv, including the even/odd
    decomposition for stride 2)."""
    B, T, C = x.shape
    w = w5.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
    T_out = (T - 1) // stride + 1
    if stride == 1:
        y = xp[:, 0:T_out] * w[0]
        for j in range(1, 5):
            y = y + xp[:, j : j + T_out] * w[j]
        return y
    assert stride == 2
    Tp = xp.shape[1]
    halves = (
        jax.lax.slice(xp, (0, 0, 0), (B, ((Tp - 1) // 2) * 2 + 1, C), (1, 2, 1)),
        jax.lax.slice(xp, (0, 1, 0), (B, ((Tp - 2) // 2) * 2 + 2, C), (1, 2, 1)),
    )
    y = None
    for j in range(5):
        hj = halves[j % 2][:, j // 2 : j // 2 + T_out]
        yj = hj * w[j]
        y = yj if y is None else y + yj
    return y


def _moments_tc(x):
    """Per-(batch, channel) mean and second moment over time, f32: [B, C]."""
    xf = x.astype(jnp.float32)
    return jnp.mean(xf, axis=1), jnp.mean(jnp.square(xf), axis=1)


def _gln_affine(mu_c, q_c, norm_p, eps):
    """gLN as a per-channel affine from per-channel moments: a, c [B, 1, C].

    The E[x²] − μ² form can go slightly negative in f32 when μ² ≫ var
    (the cancellation ops/norms.py::_moments avoids by shifting); clamp
    before rsqrt so bf16 activations can't produce NaN."""
    mu = jnp.mean(mu_c, axis=-1)[:, None, None]  # [B,1,1]
    var = jnp.maximum(jnp.mean(q_c, axis=-1)[:, None, None] - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a = _f32(norm_p["gamma"])[None, None, :] * rstd
    c = _f32(norm_p["beta"])[None, None, :] - mu * a
    return a, c


def _mha_eval(x, p, n_head):
    """Plain-path MultiheadAttention parity on [B, S, E] (self-attention)."""
    E = x.shape[-1]
    dh = E // n_head
    w_in = p["in_proj_weight"].astype(x.dtype)
    b_in = p["in_proj_bias"].astype(x.dtype)
    wq, wk, wv = jnp.split(w_in, 3, axis=0)
    bq, bk, bv = jnp.split(b_in, 3)
    B, S, _ = x.shape

    def proj(w, b):
        y = jnp.einsum("bte,fe->btf", x, w, preferred_element_type=x.dtype) + b
        return y.reshape(B, S, n_head, dh)

    q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / float(dh) ** 0.5)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=v.dtype)
    o = o.reshape(B, S, E)
    out = jnp.einsum(
        "bte,ef->btf", o, p["out_proj"]["kernel"].astype(o.dtype),
        preferred_element_type=jnp.float32,
    ).astype(o.dtype)
    return out + p["out_proj"]["bias"].astype(out.dtype)


def _globalatt_eval(u, x, n_head=8):
    """GlobalAttention at eval on [B, Tl, C] (DropPath/Dropout identity;
    the reference's output+dropout(output) quirk doubles the MHA output)."""
    from ..ops.attention import sinusoidal_positions

    q = u["attn"]
    h = _ln_last(x, q["attn_in_norm"])
    h = h + sinusoidal_positions(h.shape[1], h.shape[2], h.dtype)[None]
    # reference quirk: seq-first MHA fed batch-first → attends over BATCH
    o = _mha_eval(jnp.swapaxes(h, 0, 1), q["attn"], n_head)
    o = jnp.swapaxes(o, 0, 1)
    x = x + _ln_last(o + o, q["norm"])

    m = u["mlp"]
    w1 = m["fc1"]["conv"]["Conv_0"]["kernel"][0].astype(x.dtype)
    m1 = jnp.einsum("btc,cd->btd", x, w1, preferred_element_type=jnp.float32)
    m1 = _gln_real(m1.astype(x.dtype), m["fc1"]["norm"], 1e-8)
    w5 = m["dwconv"]["Conv_0"]["kernel"][:, 0, :]
    m2 = _dw5(m1, w5, 1) + m["dwconv"]["Conv_0"]["bias"].astype(x.dtype)
    m2 = nn.relu(m2)
    w2 = m["fc2"]["conv"]["Conv_0"]["kernel"][0].astype(x.dtype)
    m3 = jnp.einsum("btc,cd->btd", m2, w2, preferred_element_type=jnp.float32)
    m3 = _gln_real(m3.astype(x.dtype), m["fc2"]["norm"], 1e-8)
    return x + m3


def _uconv_fast(u, xin, depth):
    """One TDAUConvBlock forward with analytic moment propagation."""
    from ..ops.resample import adaptive_avg_pool1d, interpolate_nearest

    dt = xin.dtype
    eps = 1e-8
    # proj_1x1 (ConvNormAct)
    wp = u["proj_1x1"]["conv"]["Conv_0"]["kernel"][0].astype(dt)
    bp = u["proj_1x1"]["conv"]["Conv_0"]["bias"].astype(dt)
    m = jnp.einsum("btc,cd->btd", xin, wp, preferred_element_type=jnp.float32)
    m = m.astype(dt) + bp
    mu_c, q_c = _moments_tc(m)
    a, c = _gln_affine(mu_c, q_c, u["proj_1x1"]["norm"], eps)
    y = _prelu_s(
        m * a.astype(dt) + c.astype(dt), _f32(u["proj_1x1"]["act"]["alpha"][0])
    )

    # pyramid: keep RAW pre-norm conv outputs + their per-channel moments;
    # fold the previous scale's gLN into the conv as a⊙conv(d) + cterm, with
    # zero-pad edge fixes on rows 0 / T_out−1 (the only clipped rows for
    # stride 2, k=5, pad 2: taps 0,1 at the head; tap 4 — and tap 3 iff T_in
    # is odd — at the tail)
    ds, affs, mus, qs = [], [], [], []
    d = _dw5(y, u["spp_0"]["conv"]["Conv_0"]["kernel"][:, 0, :], 1)
    d = d + u["spp_0"]["conv"]["Conv_0"]["bias"].astype(dt)
    for kk in range(depth):
        if kk > 0:
            w5 = _f32(u[f"spp_{kk}"]["conv"]["Conv_0"]["kernel"][:, 0, :])
            bias = _f32(u[f"spp_{kk}"]["conv"]["Conv_0"]["bias"])
            a_p, c_p = affs[-1]  # [B,1,C] f32
            T_in = d.shape[1]
            raw = _dw5(d, w5, 2)
            T_out = raw.shape[1]
            base = jnp.sum(w5, axis=0)[None, None, :] * c_p + bias[None, None, :]
            dn = a_p.astype(dt) * raw + base.astype(dt)
            row = jax.lax.broadcasted_iota(jnp.int32, (1, T_out, 1), 1)
            head = ((w5[0] + w5[1])[None, None, :] * c_p).astype(dt)
            dn = dn - jnp.where(row == 0, head, jnp.zeros((), dt))
            tailw = w5[4] + (w5[3] if T_in % 2 == 1 else 0.0)
            tail = (tailw[None, None, :] * c_p).astype(dt)
            dn = dn - jnp.where(row == T_out - 1, tail, jnp.zeros((), dt))
            d = dn
        mu_c, q_c = _moments_tc(d)
        ds.append(d)
        mus.append(mu_c)
        qs.append(q_c)
        affs.append(_gln_affine(mu_c, q_c, u[f"spp_{kk}"]["norm"], eps))

    # pooled global sum at the deepest resolution (pool commutes with affine)
    Tl = ds[-1].shape[1]
    g = None
    for kk in range(depth):
        a_k, c_k = affs[kk]
        pk = adaptive_avg_pool1d(ds[kk], Tl, axis=1)
        term = a_k.astype(dt) * pk + c_k.astype(dt)
        g = term if g is None else g + term
    g = _globalatt_eval(u["globalatt"], g)

    # fus_i: the local branch (depthwise-1×1 ConvNorm of the normalized
    # scale) collapses to an affine of the raw d_i via moment propagation
    fused = []
    for i in range(depth):
        qf = u[f"fus_{i}"]
        wl = _f32(qf["local_embedding"]["conv"]["Conv_0"]["kernel"][0, 0])
        a2, c2 = affs[i][0][:, 0, :], affs[i][1][:, 0, :]  # [B,C] f32
        mv = wl[None, :] * (a2 * mus[i] + c2)
        qv = jnp.square(wl)[None, :] * (
            jnp.square(a2) * qs[i] + 2.0 * a2 * c2 * mus[i] + jnp.square(c2)
        )
        muv = jnp.mean(mv, axis=-1)[:, None]
        varv = jnp.maximum(
            jnp.mean(qv, axis=-1)[:, None] - jnp.square(muv), 0.0
        )  # E[x²]−μ² cancellation guard (see _gln_affine)
        rstd = jax.lax.rsqrt(varv + eps)
        g_l = _f32(qf["local_embedding"]["norm"]["gamma"])[None, :]
        b_l = _f32(qf["local_embedding"]["norm"]["beta"])[None, :]
        A = g_l * rstd * wl[None, :] * a2
        C = g_l * rstd * (wl[None, :] * c2 - muv) + b_l
        w_a = qf["global_act"]["conv"]["Conv_0"]["kernel"][0, 0].astype(dt)
        sig = jax.nn.sigmoid(_gln_real(g * w_a, qf["global_act"]["norm"], eps))
        w_e = qf["global_embedding"]["conv"]["Conv_0"]["kernel"][0, 0].astype(dt)
        gf = _gln_real(g * w_e, qf["global_embedding"]["norm"], eps)
        T_i = ds[i].shape[1]
        sig_up = interpolate_nearest(sig, T_i, axis=1)
        gf_up = interpolate_nearest(gf, T_i, axis=1)
        fused.append(
            (A[:, None, :].astype(dt) * ds[i] + C[:, None, :].astype(dt))
            * sig_up
            + gf_up
        )

    # top-down last chain (kernel=5 InjectionMultiSum; reference's
    # other-selection quirk: fused[i-1] at i == depth-2, incl. the Python
    # negative index at depth == 2)
    expanded = None
    for i in range(depth - 2, -1, -1):
        other = fused[i - 1] if i == depth - 2 else expanded
        ql = u[f"last_{i}"]
        l_raw = _dw5(fused[i], ql["local_embedding"]["conv"]["Conv_0"]["kernel"][:, 0, :], 1)
        mu_c, q_c = _moments_tc(l_raw)
        al, cl = _gln_affine(mu_c, q_c, ql["local_embedding"]["norm"], eps)
        a_raw = _dw5(other, ql["global_act"]["conv"]["Conv_0"]["kernel"][:, 0, :], 1)
        sig = jax.nn.sigmoid(_gln_real(a_raw, ql["global_act"]["norm"], eps))
        e_raw = _dw5(other, ql["global_embedding"]["conv"]["Conv_0"]["kernel"][:, 0, :], 1)
        gf = _gln_real(e_raw, ql["global_embedding"]["norm"], eps)
        T_i = fused[i].shape[1]
        sig_up = interpolate_nearest(sig, T_i, axis=1)
        gf_up = interpolate_nearest(gf, T_i, axis=1)
        expanded = (al.astype(dt) * l_raw + cl.astype(dt)) * sig_up + gf_up

    wr = u["res_conv"]["kernel"].astype(dt)
    br = u["res_conv"]["bias"].astype(dt)
    out = jnp.einsum(
        "btc,cd->btd", expanded, wr, preferred_element_type=jnp.float32
    ).astype(dt)
    return out + br + xin


def fast_forward_eligible(model: TDANet) -> bool:
    """The analytic fast path serves the standard weight-shared configs."""
    return model.unfold and model.upsampling_depth >= 2


def fast_inference_forward(model: TDANet, params, wav):
    """TDANet inference forward with analytic moment propagation (eval-only
    math — dropout/DropPath are identity; training uses ``model.apply``).
    Falls back to ``model.apply`` for non-unfold configs."""
    if not fast_forward_eligible(model):
        return model.apply(params, wav)
    from ..ops.conv import frame_signal, overlap_add

    p = params["params"] if "params" in params else params
    was_one_d = wav.ndim == 1
    if wav.ndim == 1:
        wav = wav[None]
    elif wav.ndim == 3:
        wav = wav[:, 0]

    k = model.enc_kernel_size * model.sample_rate // 1000
    stride = k // 4
    basis = k // 2 + 1
    B, T = wav.shape
    rest = k - (stride + T % k) % k
    if rest > 0:
        wav = jnp.pad(wav, ((0, 0), (0, rest)))
    wav = jnp.pad(wav, ((0, 0), (k - stride, k - stride)))

    dt = wav.dtype
    xp = jnp.pad(wav, ((0, 0), (k // 2, k // 2)))
    frames = frame_signal(xp, k, stride)  # [B, T', k]
    we = p["encoder"]["Conv_0"]["kernel"][:, 0, :].astype(dt)
    enc = jnp.einsum(
        "btk,kn->btn", frames, we, preferred_element_type=jnp.float32
    ).astype(dt)
    s_enc = enc
    h = _gln_real(enc, p["ln"], 1e-8)
    h = jnp.einsum(
        "btc,cd->btd", h, p["bottleneck"]["kernel"].astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(dt) + p["bottleneck"]["bias"].astype(dt)

    sm = p["sm"]
    if model.num_blocks > 1:  # the gate exists only when iterated
        gw = sm["concat_block"]["weight"].astype(dt)
        gb = sm["concat_block"]["bias"].astype(dt)
        ga = _f32(sm["concat_block"]["act"]["alpha"][0])
    mixture = h
    x = _uconv_fast(sm["unet"], h, model.upsampling_depth)
    for _ in range(1, model.num_blocks):
        g = (mixture + x) * gw + gb
        x = _uconv_fast(sm["unet"], _prelu_s(g, ga), model.upsampling_depth)

    h = _prelu_s(x, _f32(p["mask_act"]["alpha"][0]))
    h = jnp.einsum(
        "btc,cd->btd", h, p["mask_conv"]["kernel"].astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(dt) + p["mask_conv"]["bias"].astype(dt)
    mask = nn.relu(h.reshape(B, -1, model.num_sources, basis))
    masked = mask * s_enc[:, :, None, :]

    dec_in = masked.reshape(B, -1, model.num_sources * basis)
    Tp = dec_in.shape[1]
    wd = p["decoder"]["kernel"].astype(dt)  # [spk·basis, spk, k]
    dframes = jnp.einsum(
        "btc,cok->botk", dec_in, wd, preferred_element_type=jnp.float32
    ).astype(dt)
    dec = overlap_add(
        dframes.reshape(B * model.num_sources, Tp, k), stride
    ).reshape(B, model.num_sources, -1)
    pd = k // 2
    dec = dec[:, :, pd : dec.shape[-1] - pd]
    crop = k - stride
    out = dec[:, :, crop : dec.shape[-1] - (rest + crop)]
    return out[0] if was_one_d else out
