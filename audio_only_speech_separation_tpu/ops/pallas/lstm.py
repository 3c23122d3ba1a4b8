"""Fused (bi)LSTM scan — the recurrence as one Pallas kernel.

Why: the XLA ``lax.scan`` LSTM costs ~30 µs per step at dual-path shapes
(batch ≈ 1000, hidden 128): each step's [2, B, 4H] input-projection slice
is DMA'd from HBM, the tiny hidden matmul runs, and the output slice is
written back — all strictly serialized, because an XLA while loop cannot
prefetch iteration t+1 while computing t.  This kernel double-buffers both
the input DMA and the output write-back, so the per-step HBM traffic
overlaps the recurrence compute; the [2, B, H] hidden/cell state lives in
VMEM for the whole sequence.

Contract: consumes the PRE-PROJECTED gate inputs xw [T, 2, B, 4H]
(x·W_ih + b, both directions stacked, time already reversed for the
backward direction — exactly what ops/rnn.bilstm_scan builds), returns all
hidden states [T, 2, B, H].  Gate math identical to ops/rnn.bilstm_scan
(torch gate order i, f, g, o; bf16 state like the XLA path) — the XLA scan
is the parity oracle and the custom-VJP backward.

Batch is tiled across the grid (independent rows), so large dual-path
batches pipeline across grid steps as well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_BT = 512  # batch rows per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


CHUNK = 8  # time steps per DMA transfer — amortizes per-copy latency


def _kernel(
    xw_hbm,  # ANY [Tc, CHUNK, D, Bp, 4H] bf16 (D = #directions)
    whh_ref,  # VMEM [D, H, 4H] bf16
    o_hbm,  # ANY [Tc, CHUNK, D, Bp, H] bf16 (output)
    xbuf,  # VMEM [2, CHUNK, D, BT, 4H] bf16 (double-buffered input stage)
    obuf,  # VMEM [2, CHUNK, D, BT, H] bf16 (double-buffered output stage)
    h_ref,  # VMEM [D, BT, H] bf16
    c_ref,  # VMEM [D, BT, H] bf16
    in_sem,  # DMA (2,)
    out_sem,  # DMA (2,)
    *,
    Tc: int,
    H: int,
    BT: int,
    D: int,
):
    b = pl.program_id(0)
    row0 = b * BT

    def in_copy(tc, slot):
        return pltpu.make_async_copy(
            xw_hbm.at[tc, :, :, pl.ds(row0, BT), :], xbuf.at[slot], in_sem.at[slot]
        )

    def out_copy(tc, slot):
        return pltpu.make_async_copy(
            obuf.at[slot], o_hbm.at[tc, :, :, pl.ds(row0, BT), :], out_sem.at[slot]
        )

    h_ref[:, :, :] = jnp.zeros((D, BT, H), jnp.bfloat16)
    c_ref[:, :, :] = jnp.zeros((D, BT, H), jnp.bfloat16)
    in_copy(0, 0).start()

    def chunk_body(tc, carry):
        slot = jax.lax.rem(tc, 2)
        nxt = jax.lax.rem(tc + 1, 2)

        @pl.when(tc + 1 < Tc)
        def _():
            in_copy(tc + 1, nxt).start()

        in_copy(tc, slot).wait()
        # wait for this slot's previous output write before overwriting
        @pl.when(tc >= 2)
        def _():
            out_copy(tc - 2, slot).wait()

        h = h_ref[:, :, :]
        c = c_ref[:, :, :]
        for ch in range(xbuf.shape[1]):  # static inner loop over the chunk
            xt = xbuf[slot, ch]  # [D, BT, 4H]
            # gate inputs rounded to bf16 exactly like the XLA scan, but
            # the transcendentals run in f32 — Mosaic miscompiles bf16
            # sigmoid (f32-scalar broadcast into a bf16 vector)
            gates = (
                xt
                + jax.lax.dot_general(
                    h,
                    whh_ref[:, :, :],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            ).astype(jnp.float32)
            i = jax.nn.sigmoid(gates[:, :, 0 * H : 1 * H])
            f = jax.nn.sigmoid(gates[:, :, 1 * H : 2 * H])
            g = jnp.tanh(gates[:, :, 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[:, :, 3 * H : 4 * H])
            c32 = f * c.astype(jnp.float32) + i * g
            h = (o * jnp.tanh(c32)).astype(jnp.bfloat16)
            c = c32.astype(jnp.bfloat16)
            obuf[slot, ch] = h
        h_ref[:, :, :] = h
        c_ref[:, :, :] = c
        out_copy(tc, slot).start()
        return carry

    jax.lax.fori_loop(0, Tc, chunk_body, 0)
    # drain the in-flight output copies
    @pl.when(Tc >= 2)
    def _():
        out_copy(Tc - 2, jax.lax.rem(Tc - 2, 2)).wait()

    out_copy(Tc - 1, jax.lax.rem(Tc - 1, 2)).wait()


def _pallas_bilstm(xw, w_hh):
    T, D, B, H4 = xw.shape
    H = H4 // 4
    # tile the batch with minimal padding waste
    n_bt = -(-B // MAX_BT)
    BT = _round_up(-(-B // n_bt), 8)
    Bp = BT * n_bt
    Tp = _round_up(T, CHUNK)
    pad_t = Tp - T
    if Bp != B or pad_t:
        # zero-padded tail steps run after every valid step, so they cannot
        # corrupt valid outputs (the recurrence flows forward)
        xw = jnp.pad(xw, ((0, pad_t), (0, 0), (0, Bp - B), (0, 0)))
    xw5 = xw.reshape(Tp // CHUNK, CHUNK, D, Bp, H4)
    out = pl.pallas_call(
        functools.partial(_kernel, Tc=Tp // CHUNK, H=H, BT=BT, D=D),
        grid=(Bp // BT,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((Tp // CHUNK, CHUNK, D, Bp, H), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, D, BT, H4), jnp.bfloat16),
            pltpu.VMEM((2, CHUNK, D, BT, H), jnp.bfloat16),
            pltpu.VMEM((D, BT, H), jnp.bfloat16),
            pltpu.VMEM((D, BT, H), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(xw5.astype(jnp.bfloat16), w_hh.astype(jnp.bfloat16))
    out = out.reshape(Tp, D, Bp, H)
    if Bp != B or pad_t:
        out = out[:T, :, :B]
    return out


def _xla_bilstm(xw, w_hh):
    """The lax.scan formulation (parity oracle + VJP backward)."""

    def step(carry, xt):
        h, c = carry
        gates = xt + jax.lax.dot_general(
            h, w_hh.astype(h.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    D, B, H4 = xw.shape[1], xw.shape[2], xw.shape[3]
    H = H4 // 4
    init = (
        jnp.zeros((D, B, H), xw.dtype),
        jnp.zeros((D, B, H), xw.dtype),
    )
    _, hs = jax.lax.scan(step, init, xw)
    return hs


@jax.custom_vjp
def fused_bilstm(xw: jnp.ndarray, w_hh: jnp.ndarray) -> jnp.ndarray:
    """[T, D, B, 4H] pre-projected gates → [T, D, B, H] hidden states
    (D = number of directions; backward direction pre-reversed in time)."""
    return _pallas_bilstm(xw, w_hh)


def _fb_fwd(xw, w_hh):
    return _pallas_bilstm(xw, w_hh), (xw, w_hh)


def _fb_bwd(res, g):
    xw, w_hh = res
    _, vjp = jax.vjp(_xla_bilstm, xw, w_hh)
    return vjp(g)


fused_bilstm.defvjp(_fb_fwd, _fb_bwd)


def _res_kernel(
    x_ref,  # VMEM [BT, T, Din] bf16 (BATCH-major — the caller's layout)
    wih_ref,  # VMEM [D, Din, 4H] bf16
    whh_ref,  # VMEM [D, H, 4H] bf16
    b_ref,  # VMEM [D, 4H] f32 (zeros when the layer has no bias)
    o_ref,  # VMEM [T, D, Bp, H] bf16 — time-ALIGNED for both directions
    h_scr,  # VMEM [D, Bp, H] bf16
    c_scr,  # VMEM [D, Bp, H] bf16
    xs_scr,  # VMEM [T, Bp, Din] bf16 — time-major transposed copy of x
    *,
    T: int,
    H: int,
    D: int,
):
    h_scr[...] = jnp.zeros_like(h_scr)
    c_scr[...] = jnp.zeros_like(c_scr)

    # Transpose x to time-major IN VMEM (statically unrolled slices — every
    # index is a Python int, so no alignment constraints apply).  Before
    # round 3b the caller did this with jnp.swapaxes + batch-pad in XLA: two
    # full HBM round-trips of the big chunk tensor per block (~0.8 ms each
    # at Sandglasset's 67 MB shapes); in-VMEM the same movement rides the
    # ~20× VMEM bandwidth and the HBM DMA reads the natural [B, T, D]
    # layout contiguously.
    for j in range((T + 7) // 8):
        hi = min(8 * j + 8, T)
        tile = x_ref[:, 8 * j : hi, :]  # [BT, <=8, Din]
        for k in range(hi - 8 * j):
            xs_scr[8 * j + k] = tile[:, k, :]

    def step(t, _):
        # the input projection runs per step IN-KERNEL ([B,Din]·[Din,4H] is
        # tiny MXU work), so the [T,D,B,4H] xw tensor never exists — not in
        # HBM, not in VMEM.  The backward direction reads x at T-1-t and
        # writes its output at T-1-t: outputs come out time-aligned.
        # Directions are statically unrolled: Mosaic's batched-dot lowering
        # chokes on concat operands (vector_extract_slice check failure).
        for d in range(D):
            ti = t if d == 0 else T - 1 - t
            xt = xs_scr[ti]  # [B, Din]
            xw = jax.lax.dot_general(
                xt, wih_ref[d],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xwb = (xw + b_ref[d, :][None, :]).astype(jnp.bfloat16)
            hw = jax.lax.dot_general(
                h_scr[d], whh_ref[d],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            # bf16 gate values, f32 transcendentals (same policy as _kernel)
            gates = (xwb + hw).astype(jnp.float32)
            i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
            f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
            c32 = f * c_scr[d].astype(jnp.float32) + i * g
            hn = (o * jnp.tanh(c32)).astype(jnp.bfloat16)
            h_scr[d] = hn
            c_scr[d] = c32.astype(jnp.bfloat16)
            o_ref[ti, d] = hn
        return 0

    jax.lax.fori_loop(0, T, step, 0)


def _res_batch_tile(T: int, B: int, Din: int, H: int, D: int) -> int:
    """Largest batch-tile (multiple of 8) whose x-block + out-block fit the
    VMEM budget — ×2 because the grid pipeline DOUBLE-BUFFERS both windows.
    The grid runs ceil(B/BT) tiles sequentially, each scanning the full
    sequence on its tile; BT is then shrunk to equalize tiles (minimal
    padding waste)."""
    lane = lambda n: _round_up(n, 128)  # noqa: E731
    # x block + out block double-buffered by the grid pipeline, plus the
    # single-buffered time-major xs scratch
    per_row = T * 2 * (lane(Din) + D * lane(H) + 1) * 2 + T * 2 * lane(Din)
    bt_max = (RES_VMEM_BUDGET // per_row) // 8 * 8
    Bp = _round_up(B, 8)
    if bt_max <= 8:
        return 8
    if bt_max >= Bp:
        return Bp
    n_tiles = -(-Bp // bt_max)
    return _round_up(-(-Bp // n_tiles), 8)


def _pallas_resident_bilstm(x, w_ih, w_hh, bias):
    """x [B, T, Din] (BATCH-major — the caller's natural layout) → hidden
    states [T, D, B, H], both directions aligned to input time order.
    Batches larger than the VMEM budget are tiled across a sequential grid.

    Round 3b: the kernel used to take time-major [T, B, Din], so every call
    site paid a full-tensor swapaxes copy plus a batch-pad copy in XLA
    (~0.8 ms per Sandglasset block).  Now the x block DMAs straight from
    the batch-major tensor (contiguous rows) and the time-major transpose
    happens in VMEM inside the kernel."""
    B, T, Din = x.shape
    D, H4 = w_hh.shape[0], w_hh.shape[2]
    H = H4 // 4
    BT = _res_batch_tile(T, B, Din, H, D)
    # B need not be a multiple of BT: Mosaic masks the partial trailing
    # block (reads give unspecified rows, writes of those rows are
    # discarded), and LSTM rows are batch-independent, so no padding is
    # required.  The explicit pad+slice this replaces cost ~0.84 ms per
    # call at Sandglasset's B=2072 (pad to 2080 + out slice), ×6 blocks.
    if bias is None:
        bias = jnp.zeros((D, H4), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_res_kernel, T=T, H=H, D=D),
        grid=(-(-B // BT),),
        in_specs=[
            pl.BlockSpec((BT, T, Din), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, D, BT, H), lambda b: (0, 0, b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, D, B, H), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((D, BT, H), jnp.bfloat16),
            pltpu.VMEM((D, BT, H), jnp.bfloat16),
            pltpu.VMEM((T, BT, Din), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(
        x.astype(jnp.bfloat16),
        w_ih.astype(jnp.bfloat16),
        w_hh.astype(jnp.bfloat16),
        bias.astype(jnp.float32),
    )
    return out


def _xla_resident_ref(x, w_ih, w_hh, bias):
    """XLA formulation of resident_bilstm (parity oracle + VJP backward):
    identical math to ops/rnn.bilstm_scan, x BATCH-major [B, T, Din],
    returning [T, D, B, H] time-aligned."""
    D = w_hh.shape[0]
    if D == 2:
        xx = jnp.stack([x, x[:, ::-1]], axis=0)  # [2, B, T, Din]
    else:
        xx = x[None]
    # pure contraction (the CPU backend rejects bf16 dots with transposed
    # output); this path is the parity oracle / VJP backward, so the
    # explicit transpose copy is acceptable
    xw = jnp.einsum(
        "kbtd,kdg->kbtg", xx, w_ih.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    xw = jnp.transpose(xw, (2, 0, 1, 3))  # [T, D, B, 4H]
    if bias is not None:
        xw = xw + bias[None, :, None, :].astype(x.dtype)
    hs = _xla_bilstm(xw, w_hh)  # [T, D, B, H]
    if D == 2:
        hs = jnp.stack([hs[:, 0], hs[::-1, 1]], axis=1)
    return hs


@jax.custom_vjp
def resident_bilstm(x, w_ih, w_hh, bias):
    """Whole-sequence VMEM-resident (bi)LSTM: x [B, T, Din] → [T, D, B, H].

    Unlike ``fused_bilstm`` this consumes the UNPROJECTED input — the
    [Din → 4H] projection happens per step in-kernel, so the [T, D, B, 4H]
    gate tensor never touches HBM.  For the large-batch/short-sequence
    dual-path regime (where the chunked-DMA kernel measured 2× slower than
    the XLA scan) this removes both the serial batch grid and all per-step
    HBM traffic.  Both directions' outputs are time-aligned to the input.
    """
    return _pallas_resident_bilstm(x, w_ih, w_hh, bias)


def _rb_fwd(x, w_ih, w_hh, bias):
    return _pallas_resident_bilstm(x, w_ih, w_hh, bias), (x, w_ih, w_hh, bias)


def _rb_bwd(res, g):
    x, w_ih, w_hh, bias = res
    if bias is None:
        _, vjp = jax.vjp(lambda a, b, c: _xla_resident_ref(a, b, c, None), x, w_ih, w_hh)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(_xla_resident_ref, x, w_ih, w_hh, bias)
    return vjp(g)


resident_bilstm.defvjp(_rb_fwd, _rb_bwd)

# 98 MB: the batch-major variant adds a single-buffered [T, BT, Din] xs
# scratch on top of the double-buffered x/out blocks; v5e VMEM holds ~128 MB
# and the convtasnet kernel already runs at a 100 MB limit.  At Sandglasset's
# intra shape (T=250, B=1048, Din=128, H=128) this keeps BT at 216 (5 tiles),
# ≥ the 192 eligibility floor.
RES_VMEM_BUDGET = 98 * 1024 * 1024


def resident_eligible(
    T: int, B: int, Din: int, H: int, D: int, dtype, backend: str | None = None
) -> bool:
    """Gate for the VMEM-resident whole-sequence kernel: TPU, bf16,
    lane-aligned gate slices, the LARGE-batch regime the chunked kernel
    loses in (B > 128 — below that ``bilstm_eligible`` owns the decision),
    LONG sequences (in-model A/B on TPU v5e: DPRNN's T=100/41 scans run
    ~190 µs with this kernel vs ~140 µs on the XLA scan path — XLA's rnn
    lowering wins at short T, so those stay on lax.scan), and the whole
    x + output footprint fitting in VMEM."""
    if backend is None:
        backend = jax.default_backend()
    return (
        backend == "tpu"
        and dtype == jnp.bfloat16
        and H % 128 == 0
        and T >= 200
        and B > 128
        # batch tiles must stay wide enough to amortize the per-step
        # control overhead (the grid serializes tiles)
        and _res_batch_tile(T, B, Din, H, D) >= 192
    )


def bilstm_eligible(T: int, B: int, H: int, dtype, backend: str | None = None) -> bool:
    """Kernel gate: TPU, bf16, lane-aligned gate slices, and the regime the
    kernel actually wins in — long sequences with a SMALL batch, where the
    XLA scan is dominated by per-step DMA latency (BSRNN's per-band time
    RNN: T≈250, B≈64 → 11 % whole-model win).  At dual-path shapes with
    batch ≥ a few hundred the per-step compute hides the DMA and the
    kernel's serial grid + f32 transcendentals LOSE to the XLA scan
    (DPRNN measured 2× slower with the kernel forced on) — those stay on
    lax.scan."""
    if backend is None:
        backend = jax.default_backend()
    return (
        backend == "tpu"
        and dtype == jnp.bfloat16
        and H % 128 == 0
        and T >= 128
        and 8 <= B <= 128
    )
