"""Fused ConvTasNet TCN separator — one Pallas kernel for all R×X blocks.

Reference behavior being re-provided: the R×X dilated ``Conv1D_Block`` stack
of ConvTasNet (`/root/reference/look2hear/models/convtasnet.py:28-116`,
composed at :148-219).  The torch version launches ~8 cuDNN/elementwise
kernels per block, round-tripping every [B, 512, T] activation through
device memory.  Here the whole 24-block body is ONE kernel: the [T, 128]
block input stays resident in VMEM for an entire sample and the [T, 512]
hidden state never leaves VMEM at all, so HBM sees only x once in, weights
once per block (double-buffered DMA), and y once out.

Two passes per block (v2 design — measured 2.0× over the three-pass v1):

  P1  apply the previous block's pending residual update to y (see below),
      then h = PReLU(y @ W1 + b1) on [TILE, 128]·[128, 512] MXU tiles,
      accumulating Σh, Σh² for gLN-1.
  --  gLN-1 is an affine per-channel map given the stats; it is FOLDED into
      the depthwise taps (dw'ₖ = dwₖ·scale, bias folds the shift), so no
      normalization pass over h is ever materialized.
  P2  v = PReLU(dw'(h)) from 3 statically shifted reads; accumulate gLN-2
      stats; immediately matmul the RAW v into a pending accumulator
      P = v @ (γ₂⊙Ws)  — gLN-2 is applied LATE, exploiting that the scalar
      rstd₂ commutes with the matmul once γ₂ is folded into the weights:

        norm₂(v) @ Ws = rstd₂ · (v @ (γ₂⊙Ws)) + (β₂ − μ₂·rstd₂·γ₂) @ Ws

      so P2 needs neither the stats it is still computing nor a third pass;
      the next block's P1 (or the epilogue) applies y += rstd₂·P + shift
      while it has y in registers anyway.

v1 ran a separate P3 (normalize-by-fold + matmul + residual) and therefore
had to store v to VMEM and re-read it; eliminating that store/re-read and
the whole third traversal halved kernel time (8.45 → 4.29 ms at the bench
shape, B=8 × 2 s × 16 kHz).  A p2-in-bf16 variant was measured SLOWER
(5.78 ms — conversion traffic beats the 1.34× packed-VPU gain); P2 stays
f32.  The kernel is VPU/VMEM-traffic-bound, not MXU-bound, so boundary work
is peeled: row masking (rows ≥ T) and padding corrections only run in the
statically known edge tiles.

Mosaic requires dynamically indexed VMEM loads to be tile-aligned, so the
dilated depthwise conv loads the aligned mid tile plus two aligned 128-row
neighbor strips and builds the ±d shifts with STATIC in-register slices
(dilations are compile-time constants; halo PAD = 128 ≥ 2^7).  gLN
statistics are computed in f32.  The h scratch is f32-resident (round 3b:
storing h bf16 saved VMEM but cost a convert on the P1 store and another
on every P2 read — dropping them was worth ~4 % of the kernel; the ±8.7 MB
sits comfortably in v5e VMEM).  y and enc stay bf16 (they feed MXU dots
directly).  PReLU lowers to max(x, a·x) when every alpha ≤ 1 — checked at
pack time (``prelu_max``); the compare+select general form otherwise.

Numerical contract matches models.convtasnet.Conv1DBlock (gLN, torch PReLU
single-alpha, eps 1e-8) to bf16 tolerance — verified on-chip by
scripts/validate_pallas.py (docs/PALLAS_VALIDATION.json).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 128  # halo ≥ max dilation (2^7 for X=8); also the alignment quantum
TILE = 2048

# vecs packing rows (f32 [nb, 8, 512]):
_B1, _DWB, _G1, _BT1, _DW0, _DW1, _DW2 = range(7)


def _kernel(
    # scalar prefetch
    a_ref,  # SMEM [nb(+1), 2] f32: prelu alphas (a1, a2)
    # positional refs; layout depends on the static ``nspk`` flag:
    #
    #   TCN-only mode (nspk == 0, fused_tcn_separator):
    #     inputs : x_ref [1,Tpad,128] bf16, w1_hbm [nb,128,512] bf16,
    #              wsg_hbm [nb,512,128] bf16, vec_hbm [nb,8,512] f32,
    #              c_ref [nb,2,128] f32 (c0 = β₂@Ws + bs, c1 = γ₂@Ws)
    #     outputs: y_ref [1,Tpad,128] bf16
    #     scratch: h_ref, p_ref, w1_buf, wsg_buf, vec_buf, sem
    #
    #   full-separator mode (nspk > 0, fused_convtasnet_separator):
    #     inputs : f_ref [1,Tpad,win] bf16 (encoder frames),
    #              we_ref [win,512] bf16 (encoder filterbank),
    #              w1/wsg/vec/c arrays with ONE EXTRA leading entry —
    #              index 0 is the bottleneck pseudo-block (wsg₀ = γbn⊙Wbn,
    #              c₀ = (βbn@Wbn + bbn, γbn@Wbn); w1₀/vec₀ unused zeros),
    #              wm_ref [128, nspk·512] bf16 (mask 1×1), bm_ref [1,
    #              nspk·512] f32, wd_ref [512,win] bf16 (decoder filterbank)
    #     outputs: o_ref [1,nspk,Tpad,win] bf16 (masked decoder frames)
    #     scratch: enc_ref [Tpad,512] bf16, y_scr [Tpad,128] bf16,
    #              h_ref, p_ref, w1_buf, wsg_buf, vec_buf, sem
    *refs,
    dilations: Sequence[int],
    T: int,
    Tpad: int,
    nspk: int = 0,
    sigmoid: bool = False,
    prelu_max: bool = False,
    mxu_stats: Sequence[str] = (),
    ablate: Sequence[str] = (),
    H: int = 512,  # hidden/encoder channels (N == H); multiple of 128
    C: int = 128,  # bottleneck channels; multiple of 128
    streams: int = 1,  # samples co-resident per program (see below)
    dw_p1: bool = False,  # compute raw depthwise taps in P1 (see below)
    tp_bf16: bool = False,  # bf16 elementwise chain (requires dw_p1)
    sum_dot: bool = False,  # Σt rides a widened P2 dot (see below)
    save_state: bool = False,  # emit y_hist + per-block gLN stats (see below)
):
    # ``save_state`` (round 5, TCN-only mode): after each block's P1 the
    # y accumulator holds that block's INPUT y_b — DMA it to the y_hist
    # HBM output (the copy hides under P2, which never touches y) and
    # record the block's (μ1, r1, μ2, r2) into an SMEM stats output.
    # This is the forward side of the fused training backward
    # (ops/pallas/convtasnet_backward.py): the backward kernel recomputes
    # h/u/v per block from y_b instead of storing the wide activations.
    # ``dw_p1`` (round 4, MEASURED NEGATIVE — kept as a re-measurement
    # knob): the depthwise conv is LINEAR, so the gLN-1 affine fold
    # commutes with it —
    #     dw(norm1 h) = sc1 ⊙ dw_raw(h) + (Σₖdwₖ)⊙sh1 + dwb
    # so the three shifted taps can be combined on RAW h in P1 while ht is
    # in registers (P1 stores tp = dw_raw(ht) instead of h; the h scratch
    # is replaced by a halo-free tp scratch; P2 collapses to load tp →
    # t = sc1·tp + shv → PReLU → stats → convert → dot).  Cross-tile
    # boundary terms: the previous tile's bottom d rows arrive via a
    # [PAD, H] carry strip added to the tile head, and the NEXT tile's top
    # d rows are patched into the previous tile's tail with a [PAD, H]
    # read-modify-write.  Measured 4.10 ms vs 4.0 baseline at the headline
    # shape: the round-4 probe ablations (p1alu3/p1alu6/p2alu3,
    # kernel_ablation.py) show P1 and P2 have the SAME marginal VPU op
    # cost (~0.25 ms per [TILE, H] op) — the kernel is VPU-issue-bound in
    # BOTH passes, so moving ops between passes is a wash and the carry/fix
    # strips are pure overhead.  Math validated (interpret + on-chip).
    # ``tp_bf16`` (round 4, MEASURED NEGATIVE — 7.79 ms vs 4.0, kept as a
    # knob for future TPU generations): runs the whole elementwise chain in
    # bf16 on top of dw_p1 (bias/PReLU/taps/affine in bf16, tp stored bf16,
    # no convert before the P2 dot, f32-accumulated stats).  On v5e the
    # VPU has no native bf16 arithmetic win for this pattern — every bf16
    # op pays converts, roughly DOUBLING the chain.  Consistent with the
    # round-3 "p2-in-bf16" negative (5.78 ms).
    # ``sum_dot`` (round 5): obtain the gLN-2 Σv statistic from P2's
    # EXISTING pending matmul instead of a VPU tree reduction, by widening
    # the weight operand from [H, C] to [H, C+128] with a single ones
    # column at lane C (pack side: ``widen_wsgs_for_sum_dot``) — output
    # lane C is then the per-row sum Σ_c v_tc, and Σv collapses to a
    # [TILE, 128] quarter-size reduce over the extra lane block (zeros
    # except lane C).  Differs from the measured-negative ``mxu_stats``
    # exactly where that experiment said the cost was: no SECOND dot is
    # issued — the widened dot is the same instruction, 2× the N tiles.
    # Σv² still needs the square + reduce on the VPU (v² is not an MXU
    # operand of any existing dot).  Stats precision: Σv is computed from
    # the bf16-rounded tb instead of f32 t (same class of rounding the
    # mxu_stats validation bounded at rstd error ~1e-5).
    # ``streams`` > 1 processes that many SAMPLES inside one grid step, with
    # every per-tile op emitted for all streams in the same loop body.  The
    # streams share weights and have no data dependencies, so Mosaic's
    # scheduler can fill one stream's stall cycles (MXU-dot latency in P1,
    # load waits) with another stream's VPU ops.  The per-iteration phase
    # attribution (scripts/kernel_ablation.py) showed P1's marginal VPU op
    # costs ~0.03 ms vs P2's ~0.14 ms — i.e. P1 idles most of its ALU —
    # which is exactly the bubble this pairing fills.  Costs S× the
    # activation VMEM (gated by the caller's envelope check).
    # ``ablate`` is a perf-diagnosis knob (scripts/kernel_ablation.py ONLY —
    # ablated kernels compute garbage): each token statically removes one
    # phase of work so on-chip timing deltas attribute the kernel's cost.
    #   p1stats / p2stats — skip the gLN reductions (constant mean/rstd)
    #   dw                — skip the shifted taps (t = mid only)
    #   mm2               — skip P2's pending matmul (slice-copy instead)
    #   prelu             — skip both PReLU selects
    # Probe tokens (ADD synthetic work instead of removing it — they measure
    # each pass's marginal absorption capacity, i.e. how much of the added
    # work hides under the pass's existing stalls):
    #   p1alu3 / p1alu6   — 3 / 6 extra f32 FMA-class ops on ht in P1
    #   p1ld              — one extra full-tile f32 load (+add) in P1
    #   p1st              — one extra full-tile f32 store in P1
    #   p2alu3            — 3 extra f32 FMA-class ops on t in P2
    # PReLU lowering: the general form is compare+select+mul (3 VPU ops);
    # when every alpha ≤ 1 (checked at pack time from concrete weights),
    # prelu(x) = max(x, a·x) — mul+max, one op fewer per activation pass.
    def _prelu(x, a):
        if prelu_max:
            return jnp.maximum(x, a * x)
        return jnp.where(x >= 0, x, a * x)

    # ``mxu_stats`` ("p1"/"p2" tokens): compute the gLN Σx/Σx² reductions as
    # rowsum DOTS against an all-ones [H, 128] matrix instead of VPU tree
    # reductions (math parity validated; stats ride bf16 inputs, rstd error
    # ~1e-5).  MEASURED NEGATIVE on v5e (scripts/bench_mxu_stats.py):
    # baseline 3.94 ms vs 5.99 ("p2") / 6.62 ("p1") — the extra
    # [TILE, H]·[H, 128] dots serialize with the pass's VPU chain instead of
    # hiding under it, costing far more than the 0.67 ms the reductions take
    # (kernel_ablation.py).  Kept OFF by default; the knob + script form a
    # re-measurement harness for other TPU generations.
    ones_mx = jnp.ones((H, 128), jnp.bfloat16) if mxu_stats else None

    def _mxu_sums(xb, x2b):
        rs = jax.lax.dot_general(
            xb, ones_mx,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rq = jax.lax.dot_general(
            x2b, ones_mx,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(rs[:, 0:1]), jnp.sum(rq[:, 0:1])

    full = nspk > 0
    # when dw_p1: h_ref holds tp = dw_raw(h) (halo-free [S, Tpad, H]) and a
    # [S, PAD, H] carry strip cst_ref follows it in the scratch list
    if full:
        if dw_p1:
            (f_ref, we_ref, w1_hbm, wsg_hbm, vec_hbm, c_ref, wm_ref, bm_ref,
             wd_ref, o_ref, enc_ref, y_scr, h_ref, cst_ref, p_ref, w1_buf,
             wsg_buf, vec_buf, sem) = refs
        else:
            (f_ref, we_ref, w1_hbm, wsg_hbm, vec_hbm, c_ref, wm_ref, bm_ref,
             wd_ref, o_ref, enc_ref, y_scr, h_ref, p_ref, w1_buf, wsg_buf,
             vec_buf, sem) = refs
    else:
        if save_state:
            (x_ref, w1_hbm, wsg_hbm, vec_hbm, c_ref, y_ref, yh_hbm,
             stats_ref, h_ref, p_ref, w1_buf, wsg_buf, vec_buf, sem,
             sem_yh) = refs
        elif dw_p1:
            (x_ref, w1_hbm, wsg_hbm, vec_hbm, c_ref, y_ref, h_ref, cst_ref,
             p_ref, w1_buf, wsg_buf, vec_buf, sem) = refs
        else:
            (x_ref, w1_hbm, wsg_hbm, vec_hbm, c_ref, y_ref, h_ref, p_ref,
             w1_buf, wsg_buf, vec_buf, sem) = refs

    n_tiles = Tpad // TILE
    inv_count = 1.0 / (float(T) * float(H))
    eps = 1e-8
    S = streams
    SS = range(S)
    assert not (tp_bf16 and not dw_p1), "tp_bf16 requires dw_p1"
    assert not (tp_bf16 and (ablate or mxu_stats)), (
        "ablation/probe tokens are f32-path diagnostics"
    )
    assert not (sum_dot and (ablate or mxu_stats or tp_bf16)), (
        "sum_dot composes only with the production f32 chain"
    )
    assert not (
        save_state
        and (full or dw_p1 or tp_bf16 or sum_dot or ablate or mxu_stats or S > 1)
    ), "save_state serves the plain TCN-only training forward"
    yh_pending: list = []

    def _wait_yh():
        if save_state and yh_pending:
            yh_pending.pop().wait()
    cdt = jnp.bfloat16 if tp_bf16 else jnp.float32  # elementwise-chain dtype

    # Mosaic cannot relayout an i1 mask born from an i32 iota ((8, 128)
    # sublane tiling) onto bf16 operands ((16, 128) tiling) — "Invalid
    # relayout … vector<…xi1>".  For the bf16 chain, boundary masks are
    # therefore built as f32 selects (native mask layout) and CONVERTED,
    # which only edge tiles pay for.
    def _mask_rows(x, keep_cond):
        """Zero the rows where ``keep_cond`` (an i32-iota comparison) is
        False, in x's dtype."""
        if x.dtype == jnp.float32:
            return jnp.where(keep_cond, x, 0.0)
        return x * jnp.where(keep_cond, 1.0, 0.0).astype(x.dtype)

    def _sub_where(x, cond, vec_f32):
        """x − 1[cond]·vec (broadcast [H] vector) in x's dtype."""
        if x.dtype == jnp.float32:
            return x - jnp.where(cond, vec_f32[None, :], 0.0)
        return x - jnp.where(cond, vec_f32[None, :], 0.0).astype(x.dtype)

    def y_get(s, sl):
        return y_scr[s, sl, :] if full else y_ref[s, sl, :]

    def y_set(s, sl, v):
        if full:
            y_scr[s, sl, :] = v
        else:
            y_ref[s, sl, :] = v

    # zero the halos once per sample; the tail rows [T, Tpad) are written as
    # zeros by P1's row mask every block.  (dw_p1 has no halos: tile shifts
    # bring in zeros at the sequence ends by construction.)
    if not dw_p1:
        for s in SS:
            h_ref[s, 0:PAD, :] = jnp.zeros((PAD, H), jnp.float32)
            h_ref[s, PAD + Tpad : PAD + Tpad + PAD, :] = jnp.zeros(
                (PAD, H), jnp.float32
            )

    if not full:
        # y starts as x (the residual accumulator lives in y)
        for s in SS:
            y_ref[s, :, :] = x_ref[s, :, :]

    n_blocks = len(dilations)
    n_entries = n_blocks + (1 if full else 0)  # weight-array entries

    def start_weight_dma(b, slot):
        copies = (
            pltpu.make_async_copy(w1_hbm.at[b], w1_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(wsg_hbm.at[b], wsg_buf.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(vec_hbm.at[b], vec_buf.at[slot], sem.at[slot, 2]),
        )
        for c in copies:
            c.start()
        return copies

    inflight = {0: start_weight_dma(0, 0)}
    rstd2_prev = [jnp.float32(0.0) for _ in SS]
    shift_prev = [jnp.zeros((C,), jnp.float32) for _ in SS]

    if full:
        # ---- prologue: encoder matmul + bottleneck as pending block 0.
        # enc = frames @ We stays VMEM-resident for the epilogue's mask
        # multiply; the bottleneck gLN+1×1 rides the SAME delayed-norm
        # pending mechanism as every TCN block: P = enc @ (γbn⊙Wbn) now,
        # y = rstd·P + shift applied by block 1's P1.
        for c in inflight.pop(0):
            c.wait()
        if n_entries > 1:
            inflight[1] = start_weight_dma(1, 1)

        def pro_tile(i, carry):
            sl = pl.ds(pl.multiple_of(i * TILE, TILE), TILE)
            acc = list(carry)
            for s in SS:
                ft = f_ref[s, sl, :]
                et = jax.lax.dot_general(
                    ft, we_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                etb = et.astype(jnp.bfloat16)
                enc_ref[s, sl, :] = etb
                r0 = jax.lax.dot_general(
                    etb, wsg_buf[0],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                etf = etb.astype(jnp.float32)
                if sum_dot:
                    p_ref[s, sl, :] = r0[:, :C]
                    acc[s] = acc[s] + jnp.sum(r0[:, C:])
                else:
                    p_ref[s, sl, :] = r0
                    acc[s] = acc[s] + jnp.sum(etf)
                acc[S + s] = acc[S + s] + jnp.sum(etf * etf)
            return tuple(acc)

        # frame rows ≥ T are zero → contribute nothing to the gLN sums or
        # to P, so no row masking is needed anywhere in the prologue
        acc = jax.lax.fori_loop(
            0, n_tiles, pro_tile, (jnp.float32(0.0),) * (2 * S)
        )
        for s in SS:
            mean_e = acc[s] * inv_count
            rstd2_prev[s] = jax.lax.rsqrt(
                acc[S + s] * inv_count - mean_e * mean_e + eps
            )
            shift_prev[s] = c_ref[0, 0, :] - mean_e * rstd2_prev[s] * c_ref[0, 1, :]

    base = 1 if full else 0
    for bi, d in enumerate(dilations):
        b = base + bi
        slot = b % 2
        for c in inflight.pop(b):
            c.wait()
        if b + 1 < n_entries:
            inflight[b + 1] = start_weight_dma(b + 1, (b + 1) % 2)
        w1_ref = w1_buf.at[slot]
        wsg_ref = wsg_buf.at[slot]
        vec_ref = vec_buf.at[slot]
        a1 = a_ref[b, 0]
        a2 = a_ref[b, 1]

        # ---- P1: y += rstd₂·P + shift (pending update), h = prelu(y@W1+b1)
        # Row masking (zeroing rows ≥ T) is only live in the LAST tile — the
        # boundary tile is peeled so the hot middle tiles run maskless.
        # With dw_p1 the raw-tap combination + carry/fix also live here.
        b1v = vec_ref[_B1, :]
        if dw_p1:
            for s in SS:
                cst_ref[s] = jnp.zeros((PAD, H), cdt)

        def p1_tile(s, i, masked: bool, fix: bool = False):
            sl = pl.ds(pl.multiple_of(i * TILE, TILE), TILE)
            if b > 0:
                if full and b == 1:
                    # first pending apply in full mode: y is uninitialized
                    # scratch — the bottleneck output IS the initial y
                    ytf = rstd2_prev[s] * p_ref[s, sl, :] + shift_prev[s][None, :]
                else:
                    ytf = (
                        y_get(s, sl).astype(jnp.float32)
                        + rstd2_prev[s] * p_ref[s, sl, :]
                        + shift_prev[s][None, :]
                    )
                if masked:
                    # the shift term is nonzero in the dead rows ≥ T
                    r128 = jax.lax.broadcasted_iota(jnp.int32, (TILE, C), 0) + i * TILE
                    ytf = jnp.where(r128 < T, ytf, 0.0)
                yt = ytf.astype(jnp.bfloat16)
                y_set(s, sl, yt)
            else:
                yt = y_get(s, sl)
            ht = jax.lax.dot_general(
                yt, w1_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,  # Mosaic: acc must be 32-bit
            ).astype(cdt)
            ht = ht + b1v[None, :].astype(cdt)
            if "prelu" not in ablate:
                ht = _prelu(ht, a1.astype(cdt))
            if "p1alu3" in ablate or "p1alu6" in ablate:
                n_extra = 6 if "p1alu6" in ablate else 3
                for _ in range(n_extra):
                    ht = ht * jnp.float32(1.0000001) + jnp.float32(1e-30)
            if "p1ld" in ablate:
                ht = ht + h_ref[s, pl.ds(pl.multiple_of(i * TILE, PAD), TILE), :]
            if masked:
                row = jax.lax.broadcasted_iota(jnp.int32, (TILE, H), 0) + i * TILE
                ht = _mask_rows(ht, row < T)
            if dw_p1:
                # raw depthwise taps on in-register ht (gLN-1 fold applied
                # later in P2 as an affine); zeros shift in at tile edges,
                # matching the zero halos of the two-pass layout
                w0 = vec_ref[_DW0, :][None, :].astype(cdt)
                w1v = vec_ref[_DW1, :][None, :].astype(cdt)
                w2 = vec_ref[_DW2, :][None, :].astype(cdt)
                zd = jnp.zeros((d, H), cdt)
                up = jnp.concatenate([ht[d:], zd], axis=0)  # ht[r+d]
                down = jnp.concatenate([zd, ht[: TILE - d]], axis=0)  # ht[r−d]
                tp = down * w0 + ht * w1v + up * w2
                # head rows [0, d) take the previous tile's w0-weighted
                # bottom spill from the carry strip (rows [d, PAD) are zero)
                tp = jnp.concatenate([tp[:PAD] + cst_ref[s], tp[PAD:]], axis=0)
                h_ref[s, pl.ds(pl.multiple_of(i * TILE, TILE), TILE), :] = tp
                if fix:
                    # patch w2·ht[:d] into the PREVIOUS tile's last d rows
                    fx = ht[:d] * w2
                    if d < PAD:
                        fx = jnp.concatenate(
                            [jnp.zeros((PAD - d, H), cdt), fx], axis=0
                        )
                    win_ = pl.ds(pl.multiple_of(i * TILE - PAD, PAD), PAD)
                    h_ref[s, win_, :] = h_ref[s, win_, :] + fx
                cr = ht[TILE - d :] * w0
                if d < PAD:
                    cr = jnp.concatenate(
                        [cr, jnp.zeros((PAD - d, H), cdt)], axis=0
                    )
                cst_ref[s] = cr
            else:
                h_ref[s, pl.ds(pl.multiple_of(PAD + i * TILE, PAD), TILE), :] = ht
            if "p1st" in ablate:
                h_ref[s, pl.ds(pl.multiple_of(i * TILE, PAD), TILE), :] = (
                    ht * jnp.float32(1.0000001)
                )
            if "p1stats" in ablate:
                return jnp.float32(0.0), jnp.float32(0.0)
            if "p1" in mxu_stats:
                return _mxu_sums(
                    ht.astype(jnp.bfloat16), (ht * ht).astype(jnp.bfloat16)
                )
            return (
                jnp.sum(ht, dtype=jnp.float32),
                jnp.sum(ht * ht, dtype=jnp.float32),
            )

        def p1_body(i, carry, masked=False, fix=False):
            acc = list(carry)
            for s in SS:
                ds_, dq = p1_tile(s, i, masked=masked, fix=fix)
                acc[s] = acc[s] + ds_
                acc[S + s] = acc[S + s] + dq
            return tuple(acc)

        # tile 0 is peeled (no fix window exists below it); the last tile is
        # peeled for the ≥T row mask; middle tiles run in a fori_loop
        if b > 0:
            _wait_yh()  # y_{b-1}'s history copy must land before P1 rewrites y
        acc1 = (jnp.float32(0.0),) * (2 * S)
        if n_tiles == 1:
            acc1 = list(p1_body(0, acc1, masked=True))
        else:
            acc1 = p1_body(0, acc1)
            if n_tiles > 2:
                acc1 = jax.lax.fori_loop(
                    1, n_tiles - 1,
                    lambda i, c: p1_body(i, c, fix=dw_p1), acc1,
                )
            acc1 = list(p1_body(n_tiles - 1, acc1, masked=True, fix=dw_p1))
        if save_state:
            # y now holds this block's INPUT y_b; the copy overlaps P2
            cp = pltpu.make_async_copy(
                y_ref.at[0], yh_hbm.at[pl.program_id(0), bi], sem_yh
            )
            cp.start()
            yh_pending.append(cp)
        # per-stream gLN-1 folds into the depthwise taps:
        # norm1(h) = h·sc1 + sh1;  dw(norm1 h) = Σₖ(dwₖ·sc1)⊙h_±d + (Σₖdwₖ)·sh1 + dwb
        # (dw_p1: the taps are already combined on raw h, so only the affine
        #  pair (sc1, shv) is needed — t = sc1⊙tp + shv.)
        dw0, dw1, dw2, dwb, corr_l, corr_r = [], [], [], [], [], []
        sc1s, shvs = [], []
        for s in SS:
            if "p1stats" in ablate:
                mean1, rstd1 = jnp.float32(0.0), jnp.float32(1.0)
            else:
                mean1 = acc1[s] * inv_count
                rstd1 = jax.lax.rsqrt(
                    acc1[S + s] * inv_count - mean1 * mean1 + eps
                )
            if save_state:
                stats_ref[s, bi, 0] = mean1
                stats_ref[s, bi, 1] = rstd1
            sc1 = vec_ref[_G1, :] * rstd1  # [512]
            sh1 = vec_ref[_BT1, :] - mean1 * sc1
            if dw_p1:
                sc1s.append(sc1)
                shvs.append(
                    vec_ref[_DWB, :]
                    + (vec_ref[_DW0, :] + vec_ref[_DW1, :] + vec_ref[_DW2, :])
                    * sh1
                )
            else:
                dw0.append(vec_ref[_DW0, :] * sc1)
                dw1.append(vec_ref[_DW1, :] * sc1)
                dw2.append(vec_ref[_DW2, :] * sc1)
                dwb.append(
                    vec_ref[_DWB, :]
                    + (vec_ref[_DW0, :] + vec_ref[_DW1, :] + vec_ref[_DW2, :])
                    * sh1
                )
            # Boundary correction: the reference zero-pads AFTER
            # normalization, so the folded sh1 term must not be contributed
            # by out-of-range taps (first d rows: left; last d rows: right).
            corr_l.append(vec_ref[_DW0, :] * sh1)
            corr_r.append(vec_ref[_DW2, :] * sh1)

        # ---- P2 (+ fused former P3): v = prelu(dw'(h)); stats; P = v @ Wsg
        # h is never overwritten (v flows straight into the dot), so halo
        # reads see original data and no backup strip is needed.
        def p2_tile(s, i, first: bool, tail_corr: bool):
            # static flags: ``first`` applies corr_l (rows < d, tile 0 only
            # since d ≤ PAD ≤ TILE); ``tail_corr`` applies corr_r + the ≥T
            # zero mask (rows ≥ T−d).  Tiles with neither flag skip the
            # iota/select work entirely.
            if dw_p1:
                tpf = h_ref[s, pl.ds(pl.multiple_of(i * TILE, TILE), TILE), :]
                t = (
                    tpf * sc1s[s][None, :].astype(cdt)
                    + shvs[s][None, :].astype(cdt)
                )
            elif "dw" in ablate:
                midf = h_ref[s, pl.ds(pl.multiple_of(PAD + i * TILE, PAD), TILE), :]
                t = midf * dw1[s][None, :] + dwb[s][None, :]
            else:
                midf = h_ref[s, pl.ds(pl.multiple_of(PAD + i * TILE, PAD), TILE), :]
                # NOTE (measured negative result): replacing the concat-built
                # shifts with direct sublane-aligned h_ref loads at ±d for
                # d % 8 == 0 is ~3 % SLOWER — the concats lower to vreg
                # selection over already-loaded data, while direct loads add
                # two full-tile load+convert streams.
                prevf = h_ref[s, pl.ds(pl.multiple_of(i * TILE, PAD), PAD), :]
                nxtf = h_ref[
                    s, pl.ds(pl.multiple_of(PAD + (i + 1) * TILE, PAD), PAD), :
                ]
                left = jnp.concatenate([prevf[PAD - d :], midf[: TILE - d]], axis=0)
                right = jnp.concatenate([midf[d:], nxtf[:d]], axis=0)
                # nested so every step is an a·b+c FMA (the flat form emits
                # mul+mul+add+mul+add+add; this form is 1 mul + 3 FMA)
                t = left * dw0[s][None, :] + (
                    midf * dw1[s][None, :]
                    + (right * dw2[s][None, :] + dwb[s][None, :])
                )
            if first or tail_corr:
                rowv = jax.lax.broadcasted_iota(jnp.int32, (TILE, H), 0) + i * TILE
            if first:
                t = _sub_where(t, rowv < d, corr_l[s])
            if tail_corr:
                t = _sub_where(t, rowv >= T - d, corr_r[s])
            if "prelu" not in ablate:
                t = _prelu(t, a2.astype(cdt))
            if "p2alu3" in ablate:
                for _ in range(3):
                    t = t * jnp.float32(1.0000001) + jnp.float32(1e-30)
            if tail_corr:
                t = _mask_rows(t, rowv < T)
            tb = t.astype(jnp.bfloat16)
            if "mm2" in ablate:
                p_ref[s, pl.ds(pl.multiple_of(i * TILE, TILE), TILE), :] = t[:, :C]
            else:
                r = jax.lax.dot_general(
                    tb, wsg_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                p_ref[s, pl.ds(pl.multiple_of(i * TILE, TILE), TILE), :] = (
                    r[:, :C] if sum_dot else r
                )
            if "p2stats" in ablate:
                return jnp.float32(0.0), jnp.float32(0.0)
            if "p2" in mxu_stats:
                return _mxu_sums(tb, (t * t).astype(jnp.bfloat16))
            if sum_dot:
                # Σv from the widened dot's extra lane block (zeros except
                # lane C); Σv² stays a VPU square + reduce
                return jnp.sum(r[:, C:]), jnp.sum(t * t, dtype=jnp.float32)
            return (
                jnp.sum(t, dtype=jnp.float32),
                jnp.sum(t * t, dtype=jnp.float32),
            )

        # exact static extents: corr_l lives in rows < d (tile 0 only, since
        # d ≤ PAD ≤ TILE); corr_r/zero-mask live in rows ≥ T − d
        def needs_tail(i):
            return (i + 1) * TILE > T - PAD  # d ≤ PAD: conservative, static

        def p2_body_at(i, carry, first, tail_corr):
            acc = list(carry)
            for s in SS:
                ds_, dq = p2_tile(s, i, first=first, tail_corr=tail_corr)
                acc[s] = acc[s] + ds_
                acc[S + s] = acc[S + s] + dq
            return tuple(acc)

        acc2 = (jnp.float32(0.0),) * (2 * S)
        first_tail = next(i for i in range(n_tiles) if needs_tail(i))
        for i in range(min(first_tail, 1)):
            acc2 = p2_body_at(i, acc2, first=True, tail_corr=False)
        if first_tail > 1:
            acc2 = jax.lax.fori_loop(
                1, first_tail,
                lambda i, c: p2_body_at(i, c, first=False, tail_corr=False),
                acc2,
            )
        for i in range(first_tail, n_tiles):
            acc2 = p2_body_at(i, acc2, first=(i == 0), tail_corr=True)
        for s in SS:
            if "p2stats" in ablate:
                mean2, rstd2_prev[s] = jnp.float32(0.0), jnp.float32(1.0)
            else:
                mean2 = acc2[s] * inv_count
                rstd2_prev[s] = jax.lax.rsqrt(
                    acc2[S + s] * inv_count - mean2 * mean2 + eps
                )
            if save_state:
                stats_ref[s, bi, 2] = mean2
                stats_ref[s, bi, 3] = rstd2_prev[s]
            shift_prev[s] = c_ref[b, 0, :] - mean2 * rstd2_prev[s] * c_ref[b, 1, :]

    if full:
        # ---- epilogue (full): last pending update → mask head → mask×enc
        # → decoder frames, all without touching HBM.  No dead-row masking
        # is needed: enc rows ≥ T are zero, so the mask multiply zeroes the
        # decoder frames there regardless of y's tail content.
        def epi_tile_full(i, _):
            sl = pl.ds(pl.multiple_of(i * TILE, TILE), TILE)
            for s in SS:
                ytf = (
                    y_scr[s, sl, :].astype(jnp.float32)
                    + rstd2_prev[s] * p_ref[s, sl, :]
                    + shift_prev[s][None, :]
                )
                yb = ytf.astype(jnp.bfloat16)
                et = enc_ref[s, sl, :]
                for k in range(nspk):
                    mt = jax.lax.dot_general(
                        yb, wm_ref[:, k * H : (k + 1) * H],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + bm_ref[0, k * H : (k + 1) * H][None, :]
                    mt = jax.nn.sigmoid(mt) if sigmoid else jnp.maximum(mt, 0.0)
                    db = mt.astype(jnp.bfloat16) * et
                    dec = jax.lax.dot_general(
                        db, wd_ref[:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    o_ref[s, k, sl, :] = dec.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, n_tiles, epi_tile_full, 0)
    else:
        # ---- epilogue: apply the last block's pending update ---------------
        _wait_yh()  # the last y_hist copy must land before y is overwritten

        def epi_tile(i, masked: bool):
            sl = pl.ds(pl.multiple_of(i * TILE, TILE), TILE)
            for s in SS:
                ytf = (
                    y_ref[s, sl, :].astype(jnp.float32)
                    + rstd2_prev[s] * p_ref[s, sl, :]
                    + shift_prev[s][None, :]
                )
                if masked:
                    r128 = jax.lax.broadcasted_iota(jnp.int32, (TILE, C), 0) + i * TILE
                    ytf = jnp.where(r128 < T, ytf, 0.0)
                y_ref[s, sl, :] = ytf.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, n_tiles - 1, lambda i, _: epi_tile(i, False), 0)
        epi_tile(n_tiles - 1, True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dilations", "T_valid", "mxu_stats", "streams", "dw_p1", "tp_bf16",
        "sum_dot", "save_state",
    ),
)
def fused_tcn_separator(
    x: jnp.ndarray,  # [B, T, 128] bf16 (channels-last)
    w1s: jnp.ndarray,  # [nb, 128, 512] bf16
    wsgs: jnp.ndarray,  # [nb, 512, 128] bf16 (γ₂-scaled sconv weights)
    vecs: jnp.ndarray,  # [nb, 8, 512] f32 (packed per-block vectors)
    cs: jnp.ndarray,  # [nb, 2, 128] f32 (delayed-norm constants)
    alphas: jnp.ndarray,  # [nb, 2] f32
    dilations: Sequence[int],
    T_valid: int | None = None,
    mxu_stats: Sequence[str] = (),
    streams: int = 1,
    dw_p1: bool = False,
    tp_bf16: bool = False,
    sum_dot: bool = False,  # wsgs must be widened (widen_wsgs_for_sum_dot)
    save_state: bool = False,  # also return (y_hist, stats) for the backward
):
    B, T, Cb = x.shape
    _, Cw, Hh = w1s.shape
    nb = w1s.shape[0]
    assert Cb == Cw and Cb % 128 == 0 and Hh % 128 == 0, "lane-aligned only"
    assert wsgs.shape[1:] == (Hh, Cb + (128 if sum_dot else 0))
    assert B % streams == 0, "batch must tile into stream groups"
    T_valid = T if T_valid is None else T_valid
    Tpad = -(-T // TILE) * TILE
    if Tpad != T:
        x = jnp.pad(x, ((0, 0), (0, Tpad - T), (0, 0)))

    S = streams
    kernel = functools.partial(
        _kernel, dilations=tuple(dilations), T=T_valid, Tpad=Tpad,
        mxu_stats=tuple(mxu_stats), H=Hh, C=Cb, streams=S, dw_p1=dw_p1,
        tp_bf16=tp_bf16, sum_dot=sum_dot, save_state=save_state,
    )
    cdt = jnp.bfloat16 if tp_bf16 else jnp.float32
    h_scr = (
        [pltpu.VMEM((S, Tpad, Hh), cdt),  # tp (halo-free)
         pltpu.VMEM((S, PAD, Hh), cdt)]  # carry strip
        if dw_p1
        else [pltpu.VMEM((S, PAD + Tpad + PAD, Hh), jnp.float32)]
    )
    out_specs = pl.BlockSpec(
        (S, Tpad, Cb), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((B, Tpad, Cb), jnp.bfloat16)
    extra_scr = []
    if save_state:
        out_specs = [
            out_specs,
            pl.BlockSpec(memory_space=pltpu.ANY),  # y_hist (DMA'd per block)
            pl.BlockSpec(
                (S, nb, 4), lambda b, *_: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((B, nb, Tpad, Cb), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, nb, 4), jnp.float32),
        ]
        extra_scr = [pltpu.SemaphoreType.DMA]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # alphas
        grid=(B // S,),
        in_specs=[
            pl.BlockSpec((S, Tpad, Cb), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=h_scr + [
            pltpu.VMEM((S, Tpad, Cb), jnp.float32),
            pltpu.VMEM((2, Cb, Hh), jnp.bfloat16),
            pltpu.VMEM(
                (2, Hh, Cb + (128 if sum_dot else 0)), jnp.bfloat16
            ),
            pltpu.VMEM((2, 8, Hh), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ] + extra_scr,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # the peeled f32 boundary tiles push scoped stack slightly past
            # the 16 MB default; v5e has VMEM headroom beyond that
            vmem_limit_bytes=(64 + 32 * (S - 1)) * 1024 * 1024,
        ),
    )(alphas, x.astype(jnp.bfloat16), w1s, wsgs, vecs, cs)
    if save_state:
        y, yh, stats = out
        return y[:, :T, :], yh, stats
    return out[:, :T, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "dilations", "nspk", "sigmoid", "T_valid", "prelu_max", "mxu_stats",
        "ablate", "streams", "dw_p1", "tp_bf16", "sum_dot",
    ),
)
def fused_convtasnet_separator(
    frames: jnp.ndarray,  # [B, T', win] bf16 encoder frames
    we: jnp.ndarray,  # [win, 512] bf16 encoder filterbank
    w1s: jnp.ndarray,  # [nb+1, 128, 512] bf16 (entry 0 unused zeros)
    wsgs: jnp.ndarray,  # [nb+1, 512, 128] bf16 (entry 0 = γbn⊙Wbn)
    vecs: jnp.ndarray,  # [nb+1, 8, 512] f32 (entry 0 unused zeros)
    cs: jnp.ndarray,  # [nb+1, 2, 128] f32 (entry 0 = bottleneck consts)
    alphas: jnp.ndarray,  # [nb+1, 2] f32 (row 0 unused zeros)
    wm: jnp.ndarray,  # [128, nspk·512] bf16 mask 1×1
    bm: jnp.ndarray,  # [1, nspk·512] f32 mask bias
    wd: jnp.ndarray,  # [512, win] bf16 decoder filterbank
    dilations: Sequence[int],
    nspk: int,
    sigmoid: bool = False,
    T_valid: int | None = None,
    prelu_max: bool = False,
    mxu_stats: Sequence[str] = (),
    ablate: Sequence[str] = (),
    streams: int = 1,
    dw_p1: bool = False,
    tp_bf16: bool = False,
    sum_dot: bool = False,  # wsgs must be widened (widen_wsgs_for_sum_dot)
):
    """Whole-separator fused forward: encoder matmul → bottleneck gLN+1×1 →
    R×X TCN blocks → mask head → mask×enc → decoder frames, ONE kernel.
    HBM sees only the [B, T', win] frames in and [B, nspk, T', win] masked
    decoder frames out (plus one weight stream); every [T', 512]-scale
    activation — enc, h, v, y, the mask — lives and dies in VMEM.

    ``streams`` co-resides that many samples per grid step so their
    independent instruction streams interleave (see ``_kernel``); the
    caller must check the VMEM envelope (``fused_vmem_bytes``).

    Returns [B, nspk, T', win] bf16 frames for ``overlap_add``."""
    B, T, W = frames.shape
    _, Hh, Cw = wsgs.shape
    Cb = Cw - 128 if sum_dot else Cw
    assert Hh % 128 == 0 and Cb % 128 == 0, "lane-aligned only (N == H)"
    assert we.shape == (W, Hh) and w1s.shape[1:] == (Cb, Hh)
    assert B % streams == 0, "batch must tile into stream groups"
    T_valid = T if T_valid is None else T_valid
    Tpad = -(-T // TILE) * TILE
    if Tpad != T:
        frames = jnp.pad(frames, ((0, 0), (0, Tpad - T), (0, 0)))

    S = streams
    kernel = functools.partial(
        _kernel, dilations=tuple(dilations), T=T_valid, Tpad=Tpad,
        nspk=nspk, sigmoid=sigmoid, prelu_max=prelu_max,
        mxu_stats=tuple(mxu_stats), ablate=tuple(ablate), H=Hh, C=Cb,
        streams=S, dw_p1=dw_p1, tp_bf16=tp_bf16, sum_dot=sum_dot,
    )
    cdt = jnp.bfloat16 if tp_bf16 else jnp.float32
    h_scr = (
        [pltpu.VMEM((S, Tpad, Hh), cdt),  # tp (halo-free)
         pltpu.VMEM((S, PAD, Hh), cdt)]  # carry strip
        if dw_p1
        else [pltpu.VMEM((S, PAD + Tpad + PAD, Hh), jnp.float32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # alphas
        grid=(B // S,),
        in_specs=[
            pl.BlockSpec((S, Tpad, W), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # we
            pl.BlockSpec(memory_space=pltpu.ANY),  # w1s
            pl.BlockSpec(memory_space=pltpu.ANY),  # wsgs
            pl.BlockSpec(memory_space=pltpu.ANY),  # vecs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wd
        ],
        out_specs=pl.BlockSpec(
            (S, nspk, Tpad, W), lambda b, *_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((S, Tpad, Hh), jnp.bfloat16),  # enc
            pltpu.VMEM((S, Tpad, Cb), jnp.bfloat16),  # y
        ] + h_scr + [
            pltpu.VMEM((S, Tpad, Cb), jnp.float32),  # p
            pltpu.VMEM((2, Cb, Hh), jnp.bfloat16),
            pltpu.VMEM((2, Hh, Cw), jnp.bfloat16),
            pltpu.VMEM((2, 8, Hh), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nspk, Tpad, W), jnp.bfloat16),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(110, 100 + 10 * (S - 1)) * 1024 * 1024,
        ),
    )(alphas, frames.astype(jnp.bfloat16), we, w1s, wsgs, vecs, cs, wm, bm, wd)
    return out[:, :, :T, :]


def widen_wsgs_for_sum_dot(wsgs: jnp.ndarray) -> jnp.ndarray:
    """Append the ``sum_dot`` ones-column block to packed wsgs
    [nb, H, C] → [nb, H, C+128]: lane C is all-ones (the Σv rowsum
    column), lanes C+1.. are zeros so the quarter-size reduce over the
    extra block equals Σv exactly."""
    nb, H, _ = wsgs.shape
    extra = jnp.zeros((nb, H, 128), wsgs.dtype)
    extra = extra.at[:, :, 0].set(jnp.ones((nb, H), wsgs.dtype))
    return jnp.concatenate([wsgs, extra], axis=2)


def fused_vmem_bytes(Tpad: int, H: int, C: int, nspk: int, W: int, S: int) -> int:
    """Analytic VMEM footprint of ``fused_convtasnet_separator`` scratch +
    in/out blocks, used by the dispatch gate to pick ``streams``."""
    per_stream = (
        Tpad * H * 2  # enc bf16
        + Tpad * C * 2  # y bf16
        + (PAD + Tpad + PAD) * H * 4  # h f32
        + Tpad * C * 4  # p f32
        + Tpad * W * 2  # frames in
        + nspk * Tpad * W * 2  # decoder frames out
    )
    weights = 2 * (C * H * 2 + H * C * 2 + 8 * H * 4) + W * H * 2 + C * nspk * H * 2
    return S * per_stream + weights


def pack_convtasnet_full_params(
    params, R: int, X: int, num_spks: int, sum_dot: bool = False
):
    """Pack the WHOLE ConvTasNet param tree (encoder, bottleneck, tcn_{r}_{i}
    blocks, mask head, decoder) for ``fused_convtasnet_separator``.  The
    bottleneck gLN+1×1 is folded into pseudo-block 0 of the wsgs/cs arrays
    (same delayed-norm identity as the block sconvs), in f64, once.
    ``sum_dot=True`` widens wsgs with the ones column the kernel's
    ``sum_dot`` mode consumes."""
    p = params["params"] if "params" in params else params
    w1s, wsgs, vecs, cs, alphas, dils = pack_convtasnet_tcn_params(params, R, X)

    g = np.asarray(p["bn_norm"]["gamma"], np.float64)
    bt = np.asarray(p["bn_norm"]["beta"], np.float64)
    wbn = np.asarray(p["bn_conv"]["kernel"], np.float64)  # [N, C]
    bbn = np.asarray(p["bn_conv"]["bias"], np.float64)
    N, C = wbn.shape
    Hh = w1s.shape[2]
    c0 = np.zeros((1, 2, C), np.float32)
    c0[0, 0] = (bt @ wbn + bbn).astype(np.float32)
    c0[0, 1] = (g @ wbn).astype(np.float32)

    w1s = jnp.concatenate([jnp.zeros((1, C, Hh), w1s.dtype), w1s])
    wsgs = jnp.concatenate(
        [jnp.asarray((wbn * g[:, None]).astype(np.float32), wsgs.dtype)[None], wsgs]
    )
    vecs = jnp.concatenate([jnp.zeros((1, 8, Hh), vecs.dtype), vecs])
    cs = jnp.concatenate([jnp.asarray(c0), cs])
    alphas = jnp.concatenate([jnp.zeros((1, 2), alphas.dtype), alphas])

    we = jnp.asarray(np.asarray(p["encoder"]["kernel"]), jnp.bfloat16)
    wm = jnp.asarray(np.asarray(p["mask_conv"]["kernel"]), jnp.bfloat16)
    bm = jnp.asarray(
        np.asarray(p["mask_conv"]["bias"], np.float32)[None, :]
    )
    wd = jnp.asarray(np.asarray(p["decoder"]["kernel"]), jnp.bfloat16)
    assert wm.shape == (C, num_spks * N), wm.shape
    if sum_dot:
        wsgs = widen_wsgs_for_sum_dot(wsgs)
    return we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils


def pack_convtasnet_full_params_jnp(params, R: int, X: int, num_spks: int):
    """Traced (jnp, f32) variant of ``pack_convtasnet_full_params`` for use
    INSIDE jit — the training-forward path packs per step from live param
    tracers (the folds are ~50 tiny contractions, negligible next to the
    separator).  The offline packer folds in f64; this folds in f32, which
    stays well inside the kernel's bf16 output tolerance (validated by
    tests/test_pallas_kernels.py on-chip and the pack-parity CPU test)."""
    p = params["params"] if "params" in params else params
    f32 = jnp.float32

    w1s, wsgs, vecs, cs, alphas, dils = [], [], [], [], [], []
    for r in range(R):
        for i in range(X):
            blk = p[f"tcn_{r}_{i}"]
            w1s.append(blk["conv1x1"]["kernel"].astype(f32))
            ws = blk["sconv"]["kernel"].astype(f32)  # [512, 128]
            g2 = blk["norm2"]["gamma"].astype(f32)
            b2 = blk["norm2"]["beta"].astype(f32)
            bs = blk["sconv"]["bias"].astype(f32)
            wsgs.append(ws * g2[:, None])
            cs.append(jnp.stack([b2 @ ws + bs, g2 @ ws]))
            dw = blk["dwconv"]["Conv_0"]["kernel"].astype(f32)  # [3, 1, H]
            # rows in _B1/_DWB/_G1/_BT1/_DW0/_DW1/_DW2 order (row 7 unused)
            vecs.append(
                jnp.stack([
                    blk["conv1x1"]["bias"].astype(f32),
                    blk["dwconv"]["Conv_0"]["bias"].astype(f32),
                    blk["norm1"]["gamma"].astype(f32),
                    blk["norm1"]["beta"].astype(f32),
                    dw[0, 0], dw[1, 0], dw[2, 0],
                    jnp.zeros((dw.shape[2],), f32),
                ])
            )
            alphas.append(
                jnp.stack([blk["act1"]["alpha"][0], blk["act2"]["alpha"][0]])
            )
            dils.append(2**i)

    g = p["bn_norm"]["gamma"].astype(f32)
    bt = p["bn_norm"]["beta"].astype(f32)
    wbn = p["bn_conv"]["kernel"].astype(f32)  # [N, C]
    bbn = p["bn_conv"]["bias"].astype(f32)

    Cb, Hh = w1s[0].shape
    w1s = jnp.concatenate(
        [jnp.zeros((1, Cb, Hh), f32), jnp.stack(w1s)]
    ).astype(jnp.bfloat16)
    wsgs = jnp.concatenate(
        [(wbn * g[:, None])[None], jnp.stack(wsgs)]
    ).astype(jnp.bfloat16)
    vecs = jnp.concatenate([jnp.zeros((1, 8, Hh), f32), jnp.stack(vecs)])
    cs = jnp.concatenate(
        [jnp.stack([bt @ wbn + bbn, g @ wbn])[None], jnp.stack(cs)]
    )
    alphas = jnp.concatenate(
        [jnp.zeros((1, 2), f32), jnp.stack(alphas).astype(f32)]
    )
    we = p["encoder"]["kernel"].astype(jnp.bfloat16)
    wm = p["mask_conv"]["kernel"].astype(jnp.bfloat16)
    bm = p["mask_conv"]["bias"].astype(f32)[None, :]
    wd = p["decoder"]["kernel"].astype(jnp.bfloat16)
    return we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, tuple(dils)


def pack_convtasnet_tcn_params(params, R: int, X: int):
    """Extract + pack the tcn_{r}_{i} params from a ConvTasNet param tree
    into the stacked arrays the fused kernel consumes.  The delayed-norm
    constants (γ₂⊙Ws, β₂@Ws + bs, γ₂@Ws) are folded here, in f64, once."""
    p = params["params"] if "params" in params else params
    w1s, wsgs, vecs, cs, alphas, dils = [], [], [], [], [], []
    for r in range(R):
        for i in range(X):
            blk = p[f"tcn_{r}_{i}"]
            w1s.append(np.asarray(blk["conv1x1"]["kernel"]))  # [C, H]
            ws = np.asarray(blk["sconv"]["kernel"], np.float64)  # [H, C]
            g2 = np.asarray(blk["norm2"]["gamma"], np.float64)
            b2 = np.asarray(blk["norm2"]["beta"], np.float64)
            bs = np.asarray(blk["sconv"]["bias"], np.float64)
            wsgs.append((ws * g2[:, None]).astype(np.float32))
            c = np.zeros((2, ws.shape[1]), np.float32)
            c[0] = (b2 @ ws + bs).astype(np.float32)
            c[1] = (g2 @ ws).astype(np.float32)
            cs.append(c)
            v = np.zeros((8, ws.shape[0]), np.float32)
            v[_B1] = np.asarray(blk["conv1x1"]["bias"])
            v[_DWB] = np.asarray(blk["dwconv"]["Conv_0"]["bias"])
            v[_G1] = np.asarray(blk["norm1"]["gamma"])
            v[_BT1] = np.asarray(blk["norm1"]["beta"])
            dw = np.asarray(blk["dwconv"]["Conv_0"]["kernel"])  # [3, 1, 512]
            v[_DW0], v[_DW1], v[_DW2] = dw[0, 0], dw[1, 0], dw[2, 0]
            vecs.append(v)
            alphas.append(
                [float(blk["act1"]["alpha"][0]), float(blk["act2"]["alpha"][0])]
            )
            dils.append(2**i)
    return (
        jnp.asarray(np.stack(w1s), jnp.bfloat16),
        jnp.asarray(np.stack(wsgs), jnp.bfloat16),
        jnp.asarray(np.stack(vecs), jnp.float32),
        jnp.asarray(np.stack(cs), jnp.float32),
        jnp.asarray(np.asarray(alphas, np.float32)),
        tuple(dils),
    )
