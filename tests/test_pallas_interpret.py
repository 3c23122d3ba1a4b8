"""CPU (interpret-mode) parity gate for every Pallas kernel.

``pl.pallas_call(interpret=True)`` executes the kernel body — including the
manual double-buffered weight DMA — with pure-JAX semantics, so the SAME
comparisons ``scripts/validate_pallas.py`` runs on-chip can gate kernel
edits in CI on a CPU host.  This closes the round-2 verdict's weak #4
("kernel validation is manual, not per-round-enforced") from the CPU side:
an edit that breaks kernel math now fails the suite, not just the next
on-chip revalidation.  (Mosaic lowering bugs — layouts, alignment — are
still only caught on-chip; this gates the math.)

The ConvTasNet validators' bf16-XLA *tolerance-scale* forwards cannot run
on this CPU backend (DotThunk rejects bf16×bf16→f32), so those two kernels
are compared against the f32 XLA model directly with fixed bf16-scale
tolerances calibrated from docs/PALLAS_VALIDATION.json on-chip numbers.
"""

import functools
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

pytestmark = pytest.mark.slow  # interpret-mode kernels are minutes-scale

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def interpret_mode():
    """Patch pallas_call to interpret for the duration of one test."""
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        yield
    finally:
        pl.pallas_call = orig


@pytest.fixture()
def validator(interpret_mode):
    """scripts/validate_pallas.py loaded under the interpret patch."""
    spec = importlib.util.spec_from_file_location(
        "validate_pallas", os.path.join(_REPO, "scripts", "validate_pallas.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_attention_kernel_interpret_parity(validator):
    out = validator.validate_attention()
    assert out["ok"], out


def test_mha_axis1_interpret_parity(validator):
    out = validator.validate_mha_axis1()
    assert out["ok"], out


def test_bilstm_kernel_interpret_parity(validator):
    out = validator.validate_bilstm()
    assert out["ok"], out


def test_resident_bilstm_interpret_parity(validator):
    out = validator.validate_resident_bilstm()
    assert out["ok"], out


def test_full_separator_interpret_parity(interpret_mode):
    # end-to-end: encoder → bottleneck → TCN → mask → decoder in one kernel
    # vs the f32 XLA forward; bf16-scale tolerance (kernel stores bf16)
    from audio_only_speech_separation_tpu.models import ConvTasNet
    from audio_only_speech_separation_tpu.models.convtasnet import (
        fused_inference_forward,
    )
    from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
        pack_convtasnet_full_params,
    )

    model = ConvTasNet(
        N=512, L=16, B=128, H=512, P=3, X=2, R=1, num_spks=2,
        sample_rate=8000,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4000)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    packed = pack_convtasnet_full_params(params, 1, 2, 2)
    ref = model.apply(params, x)
    got = fused_inference_forward(model, params, x, packed=packed).astype(
        jnp.float32
    )
    rel = jnp.abs(ref - got) / (jnp.abs(ref).mean() + 1e-8)
    assert float(rel.max()) < 0.15, float(rel.max())
    assert float(rel.mean()) < 0.02, float(rel.mean())


def test_full_separator_dwp1_multitile_interpret_parity(interpret_mode):
    """Multi-tile coverage for the dw_p1 (taps-in-P1) layout: ≥3 T-tiles
    exercise the peeled first tile (carry init), the fori-loop middle tile
    (carry strip + fix RMW into the previous tile), and the masked last
    tile.  Also pins dw_p1=True ≡ dw_p1=False (same math, different
    schedule) at the kernel-output level."""
    from audio_only_speech_separation_tpu.models import ConvTasNet
    from audio_only_speech_separation_tpu.models.convtasnet import (
        fused_inference_forward,
    )
    from audio_only_speech_separation_tpu.ops.conv import frame_signal
    from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
        fused_convtasnet_separator,
        pack_convtasnet_full_params,
    )

    model = ConvTasNet(
        N=512, L=16, B=128, H=512, P=3, X=2, R=1, num_spks=2,
        sample_rate=8000,
    )
    # 20 000 samples @ stride 4 → ~5 000 frames → Tpad = 3 × TILE
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 20000)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    packed = pack_convtasnet_full_params(params, 1, 2, 2)
    ref = model.apply(params, x)
    got = fused_inference_forward(model, params, x, packed=packed).astype(
        jnp.float32
    )
    rel = jnp.abs(ref - got) / (jnp.abs(ref).mean() + 1e-8)
    assert float(rel.max()) < 0.15, float(rel.max())
    assert float(rel.mean()) < 0.02, float(rel.mean())

    # two-layout agreement at the raw kernel output (decoder frames)
    we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils = packed
    xb = x.astype(jnp.bfloat16)
    win, pad_stride, fb_stride = model.L, model.L // 2, model.L // 4
    rest = win - (pad_stride + x.shape[1] % win) % win
    if rest > 0:
        xb = jnp.pad(xb, ((0, 0), (0, rest)))
    xb = jnp.pad(xb, ((0, 0), (win - pad_stride, win - pad_stride)))
    frames = frame_signal(xb, win, fb_stride)
    assert frames.shape[1] > 4096, frames.shape  # ≥ 3 T-tiles
    kw = dict(dilations=dils, nspk=2, sigmoid=False, prelu_max=True)
    o_new = fused_convtasnet_separator(
        frames, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dw_p1=True, **kw
    ).astype(jnp.float32)
    o_old = fused_convtasnet_separator(
        frames, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dw_p1=False, **kw
    ).astype(jnp.float32)
    d = jnp.abs(o_new - o_old) / (jnp.abs(o_old).mean() + 1e-8)
    assert float(d.max()) < 0.05, float(d.max())
    # the bf16-chain knob (measured negative on v5e, kept for other gens)
    o_bf = fused_convtasnet_separator(
        frames, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd,
        dw_p1=True, tp_bf16=True, **kw
    ).astype(jnp.float32)
    db = jnp.abs(o_bf - o_old) / (jnp.abs(o_old).mean() + 1e-8)
    assert float(db.mean()) < 0.02, float(db.mean())


def test_full_separator_generalized_shape_interpret_parity(interpret_mode):
    # round-3 shape generalization: the kernel serves any lane-aligned
    # (N == H, C) — here N=H=256, C=256 (vs the headline's 512/128)
    from audio_only_speech_separation_tpu.models import ConvTasNet
    from audio_only_speech_separation_tpu.models.convtasnet import (
        fused_forward_eligible,
        fused_inference_forward,
    )
    from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
        pack_convtasnet_full_params,
    )

    model = ConvTasNet(
        N=256, L=16, B=256, H=256, P=3, X=2, R=1, num_spks=2,
        sample_rate=8000,
    )
    assert fused_forward_eligible(model, backend="tpu")
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 4000)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    packed = pack_convtasnet_full_params(params, 1, 2, 2)
    ref = model.apply(params, x)
    got = fused_inference_forward(model, params, x, packed=packed).astype(
        jnp.float32
    )
    rel = jnp.abs(ref - got) / (jnp.abs(ref).mean() + 1e-8)
    assert float(rel.max()) < 0.15, float(rel.max())
    assert float(rel.mean()) < 0.02, float(rel.mean())


def test_full_separator_streams_interpret_parity(interpret_mode):
    # streams=2 co-residency must be bit-identical to streams=1 — the
    # streams only share weights, never data (ops/pallas/convtasnet_block.py)
    from audio_only_speech_separation_tpu.models import ConvTasNet
    from audio_only_speech_separation_tpu.ops.conv import frame_signal
    from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
        fused_convtasnet_separator,
        pack_convtasnet_full_params,
    )

    model = ConvTasNet(
        N=512, L=16, B=128, H=512, P=3, X=2, R=1, num_spks=2,
        sample_rate=8000,
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 4000)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(2), x)
    we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils = (
        pack_convtasnet_full_params(params, 1, 2, 2)
    )
    win, pad_stride, fb_stride = model.L, model.L // 2, model.L // 4
    xb = x.astype(jnp.bfloat16)
    rest = win - (pad_stride + x.shape[1] % win) % win
    if rest > 0:
        xb = jnp.pad(xb, ((0, 0), (0, rest)))
    xb = jnp.pad(xb, ((0, 0), (win - pad_stride, win - pad_stride)))
    frames = frame_signal(xb, win, fb_stride)

    def run(S):
        return np.asarray(
            fused_convtasnet_separator(
                frames, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd,
                dilations=dils, nspk=2, sigmoid=False, prelu_max=True,
                streams=S,
            ).astype(jnp.float32)
        )

    ref, got = run(1), run(2)
    np.testing.assert_array_equal(ref, got)


def test_full_separator_sum_dot_interpret_parity(interpret_mode):
    """sum_dot: Σv from the widened P2 dot's ones column (round-5 stats
    experiment).  Only the gLN-2 mean's summation differs from baseline —
    bf16-rounded rowsums instead of an f32 tree reduce — so outputs must
    agree to well under the kernel's own bf16 output tolerance."""
    from audio_only_speech_separation_tpu.models import ConvTasNet
    from audio_only_speech_separation_tpu.ops.conv import frame_signal
    from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
        fused_convtasnet_separator,
        pack_convtasnet_full_params,
        widen_wsgs_for_sum_dot,
    )

    model = ConvTasNet(
        N=512, L=16, B=128, H=512, P=3, X=2, R=1, num_spks=2,
        sample_rate=8000,
    )
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 4000)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(3), x)
    we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, dils = (
        pack_convtasnet_full_params(params, 1, 2, 2)
    )
    win, pad_stride, fb_stride = model.L, model.L // 2, model.L // 4
    xb = x.astype(jnp.bfloat16)
    rest = win - (pad_stride + x.shape[1] % win) % win
    if rest > 0:
        xb = jnp.pad(xb, ((0, 0), (0, rest)))
    xb = jnp.pad(xb, ((0, 0), (win - pad_stride, win - pad_stride)))
    frames = frame_signal(xb, win, fb_stride)

    kw = dict(dilations=dils, nspk=2, sigmoid=False, prelu_max=True)
    base = np.asarray(
        fused_convtasnet_separator(
            frames, we, w1s, wsgs, vecs, cs, alphas, wm, bm, wd, **kw
        ).astype(jnp.float32)
    )
    wide = np.asarray(
        fused_convtasnet_separator(
            frames, we, w1s, widen_wsgs_for_sum_dot(wsgs), vecs, cs,
            alphas, wm, bm, wd, sum_dot=True, **kw
        ).astype(jnp.float32)
    )
    d = np.abs(wide - base) / (np.abs(base).mean() + 1e-8)
    # outputs are bf16: a single ULP flip on a large element shows up as a
    # few % of mean |base| (same 0.05 bound the dw_p1 two-layout agreement
    # uses); the mean bound is what pins the stats path
    assert float(d.max()) < 0.05, float(d.max())
    assert float(d.mean()) < 0.005, float(d.mean())


def test_tcn_kernel_interpret_parity(interpret_mode):
    # the TCN-only kernel vs the f32 XLA Conv1DBlock stack
    from audio_only_speech_separation_tpu.models.convtasnet import Conv1DBlock
    from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
        fused_tcn_separator,
        pack_convtasnet_tcn_params,
    )

    rng = np.random.default_rng(0)
    B, T, X = 1, 2048, 3
    x = rng.normal(size=(B, 128, T)).astype(np.float32) * 0.5
    params = {"params": {}}
    key = jax.random.PRNGKey(0)
    w = jnp.asarray(x)
    for i in range(X):
        blk = Conv1DBlock(128, 512, 3, dilation=2**i)
        key, k = jax.random.split(key)
        p = blk.init(k, w)
        params["params"][f"tcn_0_{i}"] = p["params"]
        w = blk.apply(p, w)
    ref = np.asarray(w)
    w1s, wsgs, vecs, cs, alphas, dils = pack_convtasnet_tcn_params(params, 1, X)
    y = fused_tcn_separator(
        jnp.asarray(np.swapaxes(x, 1, 2)).astype(jnp.bfloat16),
        w1s, wsgs, vecs, cs, alphas, dils,
    )
    got = np.swapaxes(np.asarray(y.astype(jnp.float32)), 1, 2)
    scale = np.abs(ref).mean() + 1e-8
    rel = np.abs(ref - got) / scale
    assert float(rel.max()) < 0.15, float(rel.max())
    assert float(rel.mean()) < 0.02, float(rel.mean())
