"""Fused backward for the ConvTasNet TCN chain — one Pallas kernel for the
reverse pass over all R×X blocks.

Why: the round-5 training trace (docs/BENCHMARKS.md, training section)
shows the XLA backward of the block chain spends its time in ~48 separate
per-block fusions (gLN statistic-gradient reductions, depthwise-tap
transposes, PReLU masks), each re-reading its [T', 512]-scale operands
from HBM — the same traffic structure the fused FORWARD kernel
(convtasnet_block.py) eliminated for inference.  This kernel walks the
blocks in REVERSE inside one program: the cotangent stream dy stays
VMEM-resident across all blocks, each block's wide activations (h, u, v,
du) are recomputed into VMEM scratch from the forward-saved block input
y_b, and HBM traffic is one [T', C] y_b read + one weight stream per
block plus the final weight-gradient writes.

Forward state it consumes (emitted by ``fused_tcn_separator(...,
save_state=True)``):
  y_hist [B, nb, Tpad, C] bf16 — each block's INPUT y_b (bf16-rounded,
    exactly the values the forward used), y_hist[:, 0] = x;
  stats  [B, nb, 4] f32 — per-block (μ1, r1, μ2, r2) gLN scalars;
  y_fin  [B, Tpad, C] bf16 — the chain output (used to recover each
    block's pending matmul P = (y_{b+1} − y_b − shift_b)/r2_b without
    re-running the [T,H]·[H,C] dot).

Backward math (per block, all stats are per-sample SCALARS — gLN reduces
over time AND channel; reference look2hear/models/convtasnet.py:28-69):

  forward:  z = y@W1 + b1;        h = prelu(z, a1)
            (μ1, r1) = stats(h);  sc1 = γ1·r1;  sh1 = β1 − μ1·sc1
            u[t] = Σₖ h[t±d]·(dwₖ·sc1) + dwb + (Σdwₖ)·sh1  (edge-corrected)
            v = prelu(u, a2);     (μ2, r2) = stats(v)
            y' = y + r2·(v@Wsg) + (c0 − μ2·r2·c1)

  reverse, given g = ∂L/∂y':
    A = Σ g⊙P,  S_g = Σ_t g;          dc0 = S_g,  dc1 = −μ2·r2·S_g
    dr2 = A − μ2·(S_g·c1);  dμ2 = −r2·(S_g·c1) + dr2·μ2·r2³;  dq2 = −½dr2·r2³
    dv = r2·(g@Wsgᵀ) + dμ2/(TH) + v·(2dq2/(TH));   dWsg = r2·(vᵀ@g)
    du = prelu'(u, a2)⊙dv;   da2 = Σ dv⊙min(u, 0)
    Tₖ = Σ_t du⊙h[t±d];  S_u = Σ_t du  (S_u^head/S_u^tail over the edge rows)
    ddwₖ = sc1⊙Tₖ + sh1⊙(S_u − S_u^edge_k);   ddwb = S_u
    dsh1 = (Σdwₖ)⊙S_u − dw₀⊙S_u^head − dw₂⊙S_u^tail
    dsc1 = Σₖ dwₖ⊙Tₖ;  dβ1 = dsh1;  dγ1 = r1·(dsc1 − μ1·dsh1)
    dr1 = γ1·(dsc1 − μ1·dsh1);  dμ1 = −sc1·dsh1 + dr1·μ1·r1³;  dq1 = −½dr1·r1³
    dh[t] = Σₖ du[t∓d]·(dwₖ·sc1) + dμ1/(TH) + h·(2dq1/(TH))
    dz = prelu'(z, a1)⊙dh;  da1 = Σ dh⊙min(z, 0);  db1 = Σ_t dz
    dW1 = yᵀ@dz;   dy = g + dz@W1ᵀ      (→ g for block b−1)

Gradients are returned in the PACKED layout (dw1s/dwsgs/dvecs/dcs, with
the per-block PReLU-alpha grads in dvecs row 7 lanes 0/1); the caller's
jnp packing (pack_convtasnet_full_params_jnp) is differentiable, so
autodiff carries these to the original flax param tree.  Weight grads
accumulate across the sample grid in revisited f32 output blocks.

Numerics: recompute uses the same dtype policy as the forward kernel
(bf16 matmul operands, f32 elementwise/stats); parity vs
``jax.vjp(tcn_chain_xla)`` is gated in interpret mode
(tests/test_tcn_backward.py) and on-chip (scripts/validate_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convtasnet_block import PAD, TILE, _B1, _BT1, _DW0, _DW1, _DW2, _DWB, _G1

_EPS = 1e-8


# ---------------------------------------------------------------------------
# XLA oracle: the packed chain with the kernel's exact dtype policy.
# jax.vjp of this is the parity reference for the backward kernel.
# ---------------------------------------------------------------------------


def tcn_chain_xla(x, w1s, wsgs, vecs, cs, alphas, dilations):
    """[B, T, C] bf16 → [B, T, C] bf16; mirrors the fused forward kernel's
    math (bf16 dots / f32 chain / f32 stats, y bf16-rounded per block)."""
    B, T, C = x.shape
    H = w1s.shape[2]
    f32 = jnp.float32
    inv = 1.0 / (T * H)
    cpu = jax.default_backend() == "cpu"  # DotThunk rejects bf16×bf16→f32

    def dot(a, b, dims):
        if cpu:
            a, b = a.astype(f32), b.astype(f32)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=f32,
        )

    y = x.astype(jnp.bfloat16)
    for bi, d in enumerate(dilations):
        a1, a2 = alphas[bi, 0], alphas[bi, 1]
        z = jax.vmap(lambda yt: dot(yt, w1s[bi], ((1,), (0,))))(y)
        z = z + vecs[bi, _B1][None, None, :]
        h = jnp.where(z >= 0, z, a1 * z)  # f32
        mu1 = jnp.sum(h, axis=(1, 2), keepdims=True) * inv
        r1 = jax.lax.rsqrt(
            jnp.sum(h * h, axis=(1, 2), keepdims=True) * inv - mu1 * mu1 + _EPS
        )
        sc1 = vecs[bi, _G1][None, None, :] * r1
        sh1 = vecs[bi, _BT1][None, None, :] - mu1 * sc1
        d0, d1v, d2 = vecs[bi, _DW0], vecs[bi, _DW1], vecs[bi, _DW2]
        down = jnp.pad(h, ((0, 0), (d, 0), (0, 0)))[:, :T]  # h[t−d]
        up = jnp.pad(h, ((0, 0), (0, d), (0, 0)))[:, d:]  # h[t+d]
        u = (
            down * (d0[None, None, :] * sc1)
            + h * (d1v[None, None, :] * sc1)
            + up * (d2[None, None, :] * sc1)
            + vecs[bi, _DWB][None, None, :]
            + (d0 + d1v + d2)[None, None, :] * sh1
        )
        row = jnp.arange(T)[None, :, None]
        u = u - jnp.where(row < d, d0[None, None, :] * sh1, 0.0)
        u = u - jnp.where(row >= T - d, d2[None, None, :] * sh1, 0.0)
        v = jnp.where(u >= 0, u, a2 * u)  # f32
        mu2 = jnp.sum(v, axis=(1, 2), keepdims=True) * inv
        r2 = jax.lax.rsqrt(
            jnp.sum(v * v, axis=(1, 2), keepdims=True) * inv - mu2 * mu2 + _EPS
        )
        p = jax.vmap(
            lambda vt: dot(vt.astype(jnp.bfloat16), wsgs[bi], ((1,), (0,)))
        )(v)
        shift = (
            cs[bi, 0][None, None, :]
            - mu2 * r2 * cs[bi, 1][None, None, :]
        )
        y = (y.astype(f32) + r2 * p + shift).astype(jnp.bfloat16)
    return y


# ---------------------------------------------------------------------------
# The backward kernel.
# ---------------------------------------------------------------------------


def _bwd_kernel(
    a_ref,  # SMEM prefetch [nb, 2] f32 alphas
    # inputs
    g_ref,  # [1, Tpad, C] bf16 (cotangent of the chain output)
    yfin_ref,  # [1, Tpad, C] bf16 (forward chain output)
    stats_ref,  # SMEM [1, nb, 4] f32
    w1_hbm,  # ANY [nb, C, H] bf16
    wsg_hbm,  # ANY [nb, H, C] bf16
    vec_hbm,  # ANY [nb, 8, H] f32
    c_ref,  # VMEM [nb, 2, C] f32
    yh_hbm,  # ANY [B, nb, Tpad, C] bf16
    # outputs
    dx_ref,  # [1, Tpad, C] bf16
    dw1s_ref,  # [nb, C, H] f32, revisited (accumulates over the grid)
    dwsgs_ref,  # [nb, H, C] f32, revisited
    dvecs_ref,  # [nb, 8, H] f32, revisited; row 7 lanes 0/1 = da1/da2
    dcs_ref,  # [nb, 2, C] f32, revisited
    # scratch
    h_ref,  # [PAD + Tpad + PAD, H] f32
    du_ref,  # [PAD + Tpad + PAD, H] f32
    z_ref,  # [Tpad, H] bf16
    g_scr,  # [Tpad, C] f32 (the live cotangent stream)
    y_buf,  # [3, Tpad, C] bf16 revolving y_b windows
    w1_buf,  # [2, C, H] bf16
    wsg_buf,  # [2, H, C] bf16
    vec_buf,  # [2, 8, H] f32
    sem_w,  # DMA (2, 3)
    sem_y,  # DMA (3,)
    *,
    dilations: Sequence[int],
    T: int,
    Tpad: int,
    H: int,
    C: int,
):
    nb = len(dilations)
    n_tiles = Tpad // TILE
    inv = 1.0 / (float(T) * float(H))
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        for b in range(nb):
            dw1s_ref[b] = jnp.zeros((C, H), jnp.float32)
            dwsgs_ref[b] = jnp.zeros((H, C), jnp.float32)
            dvecs_ref[b] = jnp.zeros((8, H), jnp.float32)
            dcs_ref[b] = jnp.zeros((2, C), jnp.float32)

    # zero halos once (blocks only write [PAD, PAD + Tpad))
    h_ref[0:PAD, :] = jnp.zeros((PAD, H), jnp.float32)
    h_ref[PAD + Tpad :, :] = jnp.zeros((PAD, H), jnp.float32)
    du_ref[0:PAD, :] = jnp.zeros((PAD, H), jnp.float32)
    du_ref[PAD + Tpad :, :] = jnp.zeros((PAD, H), jnp.float32)

    # live cotangent: pad rows of g are zero by construction (wrapper pads)
    def _g_init(i, _):
        sl = pl.ds(pl.multiple_of(i * TILE, TILE), TILE)
        g_scr[sl, :] = g_ref[0, sl, :].astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_tiles, _g_init, 0)

    def start_w(b):
        slot = b % 2
        copies = (
            pltpu.make_async_copy(w1_hbm.at[b], w1_buf.at[slot], sem_w.at[slot, 0]),
            pltpu.make_async_copy(wsg_hbm.at[b], wsg_buf.at[slot], sem_w.at[slot, 1]),
            pltpu.make_async_copy(vec_hbm.at[b], vec_buf.at[slot], sem_w.at[slot, 2]),
        )
        for cp in copies:
            cp.start()
        return copies

    def start_y(b):
        slot = b % 3
        cp = pltpu.make_async_copy(
            yh_hbm.at[pid, b], y_buf.at[slot], sem_y.at[slot]
        )
        cp.start()
        return (cp,)

    inflight_w = {nb - 1: start_w(nb - 1)}
    inflight_y = {nb - 1: start_y(nb - 1)}

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
    oh0 = (iota_h == 0).astype(jnp.float32)[0]
    oh1 = (iota_h == 1).astype(jnp.float32)[0]

    def needs_tail(i):
        return (i + 1) * TILE > T - PAD

    first_tail = next(i for i in range(n_tiles) if needs_tail(i))

    for b in range(nb - 1, -1, -1):
        d = dilations[b]
        wslot = b % 2
        yslot = b % 3
        for cp in inflight_w.pop(b):
            cp.wait()
        for cp in inflight_y.pop(b):
            cp.wait()
        if b > 0:
            inflight_w[b - 1] = start_w(b - 1)
            inflight_y[b - 1] = start_y(b - 1)

        a1 = a_ref[b, 0]
        a2 = a_ref[b, 1]
        mu1 = stats_ref[0, b, 0]
        r1 = stats_ref[0, b, 1]
        mu2 = stats_ref[0, b, 2]
        r2 = stats_ref[0, b, 3]
        g1v = vec_buf[wslot, _G1, :]
        bt1 = vec_buf[wslot, _BT1, :]
        b1v = vec_buf[wslot, _B1, :]
        d0 = vec_buf[wslot, _DW0, :]
        d1v = vec_buf[wslot, _DW1, :]
        d2 = vec_buf[wslot, _DW2, :]
        sc1 = g1v * r1
        sh1 = bt1 - mu1 * sc1
        c0v = d0 * sc1
        c1v = d1v * sc1
        c2v = d2 * sc1
        cbv = vec_buf[wslot, _DWB, :] + (d0 + d1v + d2) * sh1
        corr_l = d0 * sh1
        corr_r = d2 * sh1
        shift = c_ref[b, 0, :] - mu2 * r2 * c_ref[b, 1, :]  # [C]
        inv_r2 = 1.0 / r2

        # ---- B0: narrow pass — A = Σ g⊙P, S_g = Σ_t g ---------------------
        def b0_tile(i, carry):
            A, Sg = carry
            sl = pl.ds(pl.multiple_of(i * TILE, TILE), TILE)
            gt = g_scr[sl, :]
            ycur = y_buf[yslot, sl, :].astype(jnp.float32)
            if b == nb - 1:
                ynext = yfin_ref[0, sl, :].astype(jnp.float32)
            else:
                ynext = y_buf[(b + 1) % 3, sl, :].astype(jnp.float32)
            # dead rows: y's are 0 there but shift isn't — g is 0, so the
            # wrong P rows contribute nothing to A
            pt = (ynext - ycur - shift[None, :]) * inv_r2
            return A + jnp.sum(gt * pt, dtype=jnp.float32), Sg + jnp.sum(
                gt, axis=0, dtype=jnp.float32
            )

        A, Sg = jax.lax.fori_loop(
            0, n_tiles, b0_tile, (jnp.float32(0.0), jnp.zeros((C,), jnp.float32))
        )
        dcs_ref[b, 0, :] = dcs_ref[b, 0, :] + Sg
        dcs_ref[b, 1, :] = dcs_ref[b, 1, :] + (-mu2 * r2) * Sg
        sgc1 = jnp.sum(Sg * c_ref[b, 1, :], dtype=jnp.float32)
        dr2t = A - mu2 * sgc1
        r2c = r2 * r2 * r2
        dmu2 = -r2 * sgc1 + dr2t * mu2 * r2c
        dq2 = -0.5 * dr2t * r2c
        al2 = dmu2 * inv
        be2 = 2.0 * dq2 * inv

        # ---- B1: recompute z (bf16 stored) and h (f32, zero dead rows) ----
        def b1_tile(i, masked: bool):
            sl = pl.ds(pl.multiple_of(i * TILE, TILE), TILE)
            yt = y_buf[yslot, sl, :]
            zt = jax.lax.dot_general(
                yt, w1_buf[wslot],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1v[None, :]
            z_ref[sl, :] = zt.astype(jnp.bfloat16)
            ht = jnp.where(zt >= 0, zt, a1 * zt)
            if masked:
                row = jax.lax.broadcasted_iota(jnp.int32, (TILE, H), 0) + i * TILE
                ht = jnp.where(row < T, ht, 0.0)
            h_ref[pl.ds(pl.multiple_of(PAD + i * TILE, PAD), TILE), :] = ht
            return 0

        if n_tiles > 1:
            jax.lax.fori_loop(0, n_tiles - 1, lambda i, _: b1_tile(i, False), 0)
        b1_tile(n_tiles - 1, True)

        # ---- B2: recompute u/v; dv, du; tap/stat reductions; dWsg ---------
        def b2_tile(i, carry, first: bool, tail: bool):
            T0, T1, T2, Su, Suh, Sut, da2 = carry
            sl = pl.ds(pl.multiple_of(i * TILE, TILE), TILE)
            midf = h_ref[pl.ds(pl.multiple_of(PAD + i * TILE, PAD), TILE), :]
            prevf = h_ref[pl.ds(pl.multiple_of(i * TILE, PAD), PAD), :]
            nxtf = h_ref[pl.ds(pl.multiple_of(PAD + (i + 1) * TILE, PAD), PAD), :]
            left = jnp.concatenate([prevf[PAD - d :], midf[: TILE - d]], axis=0)
            right = jnp.concatenate([midf[d:], nxtf[:d]], axis=0)
            u = left * c0v[None, :] + (
                midf * c1v[None, :] + (right * c2v[None, :] + cbv[None, :])
            )
            if first or tail:
                rowv = jax.lax.broadcasted_iota(jnp.int32, (TILE, H), 0) + i * TILE
            if first:
                u = u - jnp.where(rowv < d, corr_l[None, :], 0.0)
            if tail:
                u = u - jnp.where(rowv >= T - d, corr_r[None, :], 0.0)
            v = jnp.where(u >= 0, u, a2 * u)
            if tail:
                v = jnp.where(rowv < T, v, 0.0)
            gt = g_scr[sl, :]
            gb = gt.astype(jnp.bfloat16)
            dvt = r2 * jax.lax.dot_general(
                gb, wsg_buf[wslot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + al2 + be2 * v
            if tail:
                dvt = jnp.where(rowv < T, dvt, 0.0)
            dut = jnp.where(u >= 0, dvt, a2 * dvt)
            du_ref[pl.ds(pl.multiple_of(PAD + i * TILE, PAD), TILE), :] = dut
            da2 = da2 + jnp.sum(dvt * jnp.minimum(u, 0.0), dtype=jnp.float32)
            T0 = T0 + jnp.sum(dut * left, axis=0, dtype=jnp.float32)
            T1 = T1 + jnp.sum(dut * midf, axis=0, dtype=jnp.float32)
            T2 = T2 + jnp.sum(dut * right, axis=0, dtype=jnp.float32)
            Su = Su + jnp.sum(dut, axis=0, dtype=jnp.float32)
            if first:
                Suh = Suh + jnp.sum(
                    jnp.where(rowv < d, dut, 0.0), axis=0, dtype=jnp.float32
                )
            if tail:
                Sut = Sut + jnp.sum(
                    jnp.where(rowv >= T - d, dut, 0.0), axis=0, dtype=jnp.float32
                )
            dwsgs_ref[b] = dwsgs_ref[b] + r2 * jax.lax.dot_general(
                v.astype(jnp.bfloat16), gb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return T0, T1, T2, Su, Suh, Sut, da2

        zH = jnp.zeros((H,), jnp.float32)
        acc = (zH, zH, zH, zH, zH, zH, jnp.float32(0.0))
        for i in range(min(first_tail, 1)):
            acc = b2_tile(i, acc, first=True, tail=False)
        if first_tail > 1:
            acc = jax.lax.fori_loop(
                1, first_tail,
                lambda i, c: b2_tile(i, c, first=False, tail=False), acc,
            )
        for i in range(first_tail, n_tiles):
            acc = b2_tile(i, acc, first=(i == 0), tail=True)
        T0, T1, T2, Su, Suh, Sut, da2 = acc

        dsh1 = (d0 + d1v + d2) * Su - d0 * Suh - d2 * Sut
        dvecs_ref[b, _DWB, :] = dvecs_ref[b, _DWB, :] + Su
        dvecs_ref[b, _DW0, :] = (
            dvecs_ref[b, _DW0, :] + sc1 * T0 + sh1 * (Su - Suh)
        )
        dvecs_ref[b, _DW1, :] = dvecs_ref[b, _DW1, :] + sc1 * T1 + sh1 * Su
        dvecs_ref[b, _DW2, :] = (
            dvecs_ref[b, _DW2, :] + sc1 * T2 + sh1 * (Su - Sut)
        )
        dsc1t = (d0 * T0 + d1v * T1 + d2 * T2) - mu1 * dsh1
        dvecs_ref[b, _BT1, :] = dvecs_ref[b, _BT1, :] + dsh1
        dvecs_ref[b, _G1, :] = dvecs_ref[b, _G1, :] + r1 * dsc1t
        dr1 = jnp.sum(g1v * dsc1t, dtype=jnp.float32)
        r1c = r1 * r1 * r1
        dmu1 = -jnp.sum(sc1 * dsh1, dtype=jnp.float32) + dr1 * mu1 * r1c
        dq1 = -0.5 * dr1 * r1c
        al1 = dmu1 * inv
        be1 = 2.0 * dq1 * inv

        # ---- B3: dh (tap transpose + stat feedback), dz, dW1, db1, dy -----
        def b3_tile(i, carry, tail: bool):
            db1, da1 = carry
            sl = pl.ds(pl.multiple_of(i * TILE, TILE), TILE)
            mid_du = du_ref[pl.ds(pl.multiple_of(PAD + i * TILE, PAD), TILE), :]
            prev_du = du_ref[pl.ds(pl.multiple_of(i * TILE, PAD), PAD), :]
            nxt_du = du_ref[
                pl.ds(pl.multiple_of(PAD + (i + 1) * TILE, PAD), PAD), :
            ]
            # dh[t] = du[t+d]·c0 + du[t]·c1 + du[t−d]·c2
            left_du = jnp.concatenate(
                [prev_du[PAD - d :], mid_du[: TILE - d]], axis=0
            )  # du[t−d]
            right_du = jnp.concatenate([mid_du[d:], nxt_du[:d]], axis=0)  # du[t+d]
            ht = h_ref[pl.ds(pl.multiple_of(PAD + i * TILE, PAD), TILE), :]
            dh = right_du * c0v[None, :] + (
                mid_du * c1v[None, :] + left_du * c2v[None, :]
            )
            dh = dh + al1 + be1 * ht
            if tail:
                rowv = jax.lax.broadcasted_iota(jnp.int32, (TILE, H), 0) + i * TILE
                dh = jnp.where(rowv < T, dh, 0.0)
            zt = z_ref[sl, :].astype(jnp.float32)
            dz = jnp.where(zt >= 0, dh, a1 * dh)
            da1 = da1 + jnp.sum(dh * jnp.minimum(zt, 0.0), dtype=jnp.float32)
            db1 = db1 + jnp.sum(dz, axis=0, dtype=jnp.float32)
            dzb = dz.astype(jnp.bfloat16)
            yt = y_buf[yslot, sl, :]
            dw1s_ref[b] = dw1s_ref[b] + jax.lax.dot_general(
                yt, dzb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dyt = g_scr[sl, :] + jax.lax.dot_general(
                dzb, w1_buf[wslot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g_scr[sl, :] = dyt
            return db1, da1

        acc3 = (zH, jnp.float32(0.0))
        if first_tail > 0:
            acc3 = jax.lax.fori_loop(
                0, first_tail, lambda i, c: b3_tile(i, c, tail=False), acc3
            )
        for i in range(first_tail, n_tiles):
            acc3 = b3_tile(i, acc3, tail=True)
        db1, da1 = acc3
        dvecs_ref[b, _B1, :] = dvecs_ref[b, _B1, :] + db1
        dvecs_ref[b, 7, :] = dvecs_ref[b, 7, :] + da1 * oh0 + da2 * oh1

    # ---- dx ---------------------------------------------------------------
    def _dx_tile(i, _):
        sl = pl.ds(pl.multiple_of(i * TILE, TILE), TILE)
        dx_ref[0, sl, :] = g_scr[sl, :].astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, n_tiles, _dx_tile, 0)


@functools.partial(jax.jit, static_argnames=("dilations", "T_valid"))
def fused_tcn_backward(
    g: jnp.ndarray,  # [B, T, C] (cotangent of the chain output)
    yh: jnp.ndarray,  # [B, nb, Tpad, C] bf16 (forward-saved block inputs)
    yfin: jnp.ndarray,  # [B, T, C] bf16 (forward chain output)
    stats: jnp.ndarray,  # [B, nb, 4] f32
    w1s: jnp.ndarray,  # [nb, C, H] bf16
    wsgs: jnp.ndarray,  # [nb, H, C] bf16
    vecs: jnp.ndarray,  # [nb, 8, H] f32
    cs: jnp.ndarray,  # [nb, 2, C] f32
    alphas: jnp.ndarray,  # [nb, 2] f32
    dilations: Sequence[int],
    T_valid: int | None = None,
):
    """Returns (dx [B,T,C] bf16, dw1s f32, dwsgs f32, dvecs f32, dcs f32,
    dalphas [nb,2] f32).  dvecs row 7 is zeroed into dalphas."""
    B, T, C = g.shape
    nb, _, H = w1s.shape
    T_valid = T if T_valid is None else T_valid
    Tpad = yh.shape[2]
    assert Tpad == -(-T // TILE) * TILE
    if Tpad != T:
        g = jnp.pad(g, ((0, 0), (0, Tpad - T), (0, 0)))
        yfin = jnp.pad(yfin, ((0, 0), (0, Tpad - T), (0, 0)))

    kernel = functools.partial(
        _bwd_kernel, dilations=tuple(dilations), T=T_valid, Tpad=Tpad,
        H=H, C=C,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # alphas
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tpad, C), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tpad, C), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, 4), lambda b, *_: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # w1s
            pl.BlockSpec(memory_space=pltpu.ANY),  # wsgs
            pl.BlockSpec(memory_space=pltpu.ANY),  # vecs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cs
            pl.BlockSpec(memory_space=pltpu.ANY),  # yh
        ],
        out_specs=[
            pl.BlockSpec((1, Tpad, C), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, C, H), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, H, C), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 8, H), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 2, C), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((PAD + Tpad + PAD, H), jnp.float32),  # h
            pltpu.VMEM((PAD + Tpad + PAD, H), jnp.float32),  # du
            pltpu.VMEM((Tpad, H), jnp.bfloat16),  # z
            pltpu.VMEM((Tpad, C), jnp.float32),  # g (live cotangent)
            pltpu.VMEM((3, Tpad, C), jnp.bfloat16),  # y_b windows
            pltpu.VMEM((2, C, H), jnp.bfloat16),
            pltpu.VMEM((2, H, C), jnp.bfloat16),
            pltpu.VMEM((2, 8, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    dx, dw1s, dwsgs, dvecs, dcs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, Tpad, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((nb, C, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, C), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, 2, C), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(alphas, g.astype(jnp.bfloat16), yfin.astype(jnp.bfloat16), stats,
      w1s, wsgs, vecs, cs, yh)
    dalphas = dvecs[:, 7, :2]
    dvecs = dvecs.at[:, 7, :].set(0.0)
    return dx[:, :T], dw1s, dwsgs, dvecs, dcs, dalphas


# ---------------------------------------------------------------------------
# custom_vjp wrapper: fused forward (with state) + fused backward.
# ---------------------------------------------------------------------------


def make_tcn_chain(dilations: Sequence[int]):
    """Returns chain(x, w1s, wsgs, vecs, cs, alphas) -> y with the fused
    Pallas forward AND the fused Pallas backward wired as its custom VJP.
    Cotangent dtypes match the primals (bf16 weight grads are f32-
    accumulated in-kernel, rounded once on exit)."""
    from .convtasnet_block import fused_tcn_separator

    dils = tuple(dilations)

    @jax.custom_vjp
    def chain(x, w1s, wsgs, vecs, cs, alphas):
        return fused_tcn_separator(x, w1s, wsgs, vecs, cs, alphas, dils)

    def _fwd(x, w1s, wsgs, vecs, cs, alphas):
        y, yh, stats = fused_tcn_separator(
            x, w1s, wsgs, vecs, cs, alphas, dils, save_state=True
        )
        return y, (yh, y, stats, w1s, wsgs, vecs, cs, alphas)

    def _bwd(res, g):
        yh, y, stats, w1s, wsgs, vecs, cs, alphas = res
        dx, dw1s, dwsgs, dvecs, dcs, dalphas = fused_tcn_backward(
            g, yh, y, stats, w1s, wsgs, vecs, cs, alphas, dils
        )
        return (
            dx.astype(jnp.bfloat16),
            dw1s.astype(w1s.dtype),
            dwsgs.astype(wsgs.dtype),
            dvecs.astype(vecs.dtype),
            dcs.astype(cs.dtype),
            dalphas.astype(alphas.dtype),
        )

    chain.defvjp(_fwd, _bwd)
    return chain
