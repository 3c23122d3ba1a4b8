"""Interpret-mode parity gate for the fused TCN backward kernel.

The oracle is ``jax.vjp`` of ``tcn_chain_xla`` — a jnp transcription of the
fused forward's exact math and dtype policy (bf16 dots, f32 chain/stats,
bf16-rounded y per block).  The kernel backward recomputes with the same
policy, so grads must agree to bf16-rounding tolerance.  Reference math
being differentiated: look2hear/models/convtasnet.py:28-69.
"""

import functools
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

pytestmark = pytest.mark.slow  # interpret-mode kernels are minutes-scale


@pytest.fixture()
def interpret_mode():
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        yield
    finally:
        pl.pallas_call = orig


def _setup(nb=4, C=128, H=256, B=2, T=300, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w1s = jnp.asarray(
        rng.normal(size=(nb, C, H)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    wsgs = jnp.asarray(
        rng.normal(size=(nb, H, C)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    vecs = jnp.asarray(rng.normal(size=(nb, 8, H)).astype(np.float32) * 0.3)
    vecs = vecs.at[:, 7, :].set(0.0)  # row 7 is unused padding in the pack
    cs = jnp.asarray(rng.normal(size=(nb, 2, C)).astype(np.float32) * 0.1)
    alphas = jnp.asarray(
        np.abs(rng.normal(size=(nb, 2))).astype(np.float32) * 0.3 + 0.05
    )
    dils = tuple(2**i for i in range(nb))
    return x, w1s, wsgs, vecs, cs, alphas, dils


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    den = np.linalg.norm(a) + 1e-9
    return np.linalg.norm(a - b) / den


def test_tcn_backward_matches_xla_vjp(interpret_mode):
    from audio_only_speech_separation_tpu.ops.pallas.convtasnet_backward import (
        make_tcn_chain,
        tcn_chain_xla,
    )

    x, w1s, wsgs, vecs, cs, alphas, dils = _setup()
    chain = make_tcn_chain(dils)

    y_k = chain(x, w1s, wsgs, vecs, cs, alphas)
    y_o = tcn_chain_xla(x, w1s, wsgs, vecs, cs, alphas, dils)
    np.testing.assert_allclose(
        np.asarray(y_k, np.float32), np.asarray(y_o, np.float32),
        atol=5e-2, rtol=2e-2,  # bf16 ulp-scale rounding-order differences
    )

    g = jnp.asarray(
        np.random.default_rng(1).normal(size=y_o.shape).astype(np.float32)
    ).astype(jnp.bfloat16)

    def run_k(*args):
        return (chain(*args).astype(jnp.float32) * g.astype(jnp.float32)).sum()

    def run_o(*args):
        return (
            tcn_chain_xla(*args, dils).astype(jnp.float32)
            * g.astype(jnp.float32)
        ).sum()

    gk = jax.grad(run_k, argnums=(0, 1, 2, 3, 4, 5))(
        x, w1s, wsgs, vecs, cs, alphas
    )
    go = jax.grad(run_o, argnums=(0, 1, 2, 3, 4, 5))(
        x, w1s, wsgs, vecs, cs, alphas
    )
    names = ["dx", "dw1s", "dwsgs", "dvecs", "dcs", "dalphas"]
    for nm, a, b in zip(names, go, gk):
        r = _rel(a, b)
        assert r < 6e-2, f"{nm}: rel l2 {r}"
    # dvecs row 7 (the padding row) must stay exactly zero
    assert np.all(np.asarray(gk[3])[:, 7, :] == 0.0)


def test_kernel_train_apply_grads_match_delayed(interpret_mode):
    """End-to-end: make_kernel_train_apply (fused fwd + fused bwd around
    the chain) must produce the same flax-tree gradients as the delayed
    XLA formulation (itself parity-gated against model.apply)."""
    from audio_only_speech_separation_tpu.models import ConvTasNet
    from audio_only_speech_separation_tpu.models.convtasnet import (
        make_delayed_train_apply,
        make_kernel_train_apply,
    )

    model = ConvTasNet(
        N=128, L=16, B=128, H=128, P=3, X=2, R=1, num_spks=2,
        sample_rate=8000,
    )
    # eligibility gate is backend-sensitive; build the path directly here
    import audio_only_speech_separation_tpu.models.convtasnet as ctn

    orig = ctn.fused_forward_eligible
    ctn.fused_forward_eligible = lambda m, backend=None: ctn._fused_shape_ok(m)
    try:
        fn_k = make_kernel_train_apply(model)
    finally:
        ctn.fused_forward_eligible = orig
    fn_d = make_delayed_train_apply(model)
    assert fn_k is not None and fn_d is not None

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3210)).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x)
    pb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p
    )
    tgt = jnp.asarray(rng.normal(size=(2, 2, 3210)).astype(np.float32))

    def loss(fn):
        def f(pp):
            est = fn(pp, x.astype(jnp.bfloat16)).astype(jnp.float32)
            return jnp.mean((est - tgt) ** 2)
        return f

    lk = float(loss(fn_k)(pb))
    ld = float(loss(fn_d)(pb))
    assert abs(lk - ld) < 5e-3 * max(1.0, abs(ld)), (lk, ld)

    gk = jax.grad(loss(fn_k))(pb)
    gd = jax.grad(loss(fn_d))(pb)
    flat_k = sorted(
        jax.tree_util.tree_flatten_with_path(gk)[0], key=lambda kv: str(kv[0])
    )
    flat_d = sorted(
        jax.tree_util.tree_flatten_with_path(gd)[0], key=lambda kv: str(kv[0])
    )
    for (k1, a), (k2, b) in zip(flat_d, flat_k):
        assert str(k1) == str(k2)
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.isfinite(b).all(), str(k1)
        na = np.linalg.norm(a)
        if na < 1e-9:
            continue
        rel = np.linalg.norm(a - b) / na
        if a.size <= 2:
            # scalar PReLU alphas: Σ dv·min(u,0) flips terms wherever bf16
            # rounding moves u across 0, so formulations disagree up to
            # tens of percent (the delayed-vs-flax check shows the same);
            # gate sign + magnitude class instead
            assert np.sign(a.sum()) == np.sign(b.sum()), f"{k1}: sign"
            assert rel < 0.5, f"{k1}: rel {rel}"
        else:
            assert rel < 0.1, f"{k1}: rel {rel}"
