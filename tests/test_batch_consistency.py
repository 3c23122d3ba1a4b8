"""Batch independence: model(stack(x0, x1))[i] == model(x_i) per family.

Speech separation forwards must be per-sample: no statistic, reshape, or
attention may couple batch rows.  Most reference-parity tests run batch 1,
so a batch-scrambling reshape passes them silently — exactly the bug the
REFERENCE itself has in Sepformer (`/root/reference/look2hear/models/
sepformer.py:1004`: ``sep_h.reshape(spks * B, N, L)`` on a [spks, B, N, L]
tensor followed by ``.reshape(B, spks, -1)`` reassigns (batch, speaker)
slots whenever B > 1).  Our Sepformer deliberately does NOT replicate that
quirk (it is a correctness bug that breaks batched training, not a modeling
choice); this suite pins per-sample correctness for every family.
"""

import numpy as np
import pytest


def _models():
    from audio_only_speech_separation_tpu import models as M

    toy = [
        ("convtasnet", lambda: M.ConvTasNet(
            N=32, L=16, B=16, H=32, P=3, X=2, R=1, num_spks=2, sample_rate=8000)),
        ("tasnet_dprnn", lambda: M.TasNet(
            enc_dim=32, bn_dim=16, hidden_dim=16, win=16, layer=1, num_spk=2,
            module="DPRNN", group_size=1, block_size=24, sample_rate=8000)),
        ("tasnet_dptnet", lambda: M.TasNet(
            enc_dim=32, bn_dim=16, hidden_dim=16, win=16, layer=1, num_spk=2,
            module="DPTNet", group_size=1, block_size=24, sample_rate=8000)),
        ("bsrnn", lambda: M.BSRNN(
            win=256, stride=64, feature_dim=8, num_spks=2, num_layer=1,
            num_repeat=1, sample_rate=8000)),
        ("sepformer", lambda: M.Sepformer(
            encoder_kernel_size=16, encoder_in_nchannels=1,
            encoder_out_nchannels=16, masknet_chunksize=24,
            masknet_numlayers=1, masknet_norm="gLN", masknet_numspks=2,
            intra_numlayers=1, inter_numlayers=1, intra_nhead=2,
            inter_nhead=2, intra_dffn=32, inter_dffn=32,
            intra_use_positional=True, inter_use_positional=True,
            intra_norm_before=True, inter_norm_before=True,
            intra_causal=False, inter_causal=False, sample_rate=8000)),
        # TDANet is xfail BY DESIGN: the reference feeds a batch-first
        # [B, T, C] tensor to a seq-first torch MHA (tdanet.py:246), so its
        # global attention runs over the BATCH axis; we replicate that quirk
        # for weight-import parity (models/tdanet.py docstring), so batched
        # and single-sample forwards legitimately differ for B > 1 — in the
        # reference too (measured: ~5e-2 max abs diff at eval).
        ("tdanet", lambda: M.TDANet(
            out_channels=16, in_channels=32, num_blocks=2, upsampling_depth=3,
            enc_kernel_size=4, num_sources=2, sample_rate=8000)),
        ("afrcnn", lambda: M.AFRCNN(
            out_channels=16, in_channels=32, num_blocks=2, upsampling_depth=3,
            enc_kernel_size=4, num_sources=2, sample_rate=8000)),
        ("dprnn_old", lambda: M.DPRNNTasNet(
            feature_dim=16, hidden_dim=8, win=4, layer=1, segment_size=20,
            num_spk=2, sample_rate=8000)),
        ("sandglasset", lambda: M.Sandglasset(
            n_feats=16, bn_chan=32, hid_size=16, chunk_size=24, n_repeats=2,
            n_head=2, kernel_size=2, sample_rate=8000)),
    ]
    return toy


@pytest.mark.parametrize("name,ctor", _models(), ids=[n for n, _ in _models()])
def test_forward_is_per_sample(name, ctor, rng):
    import jax
    import jax.numpy as jnp

    if name == "tdanet":
        pytest.xfail(
            "TDANet replicates the reference's batch-axis attention "
            "(seq-first MHA misuse, tdanet.py:246) — not per-sample by design"
        )
    model = ctor()
    T = 1600
    x = rng.normal(size=(3, T)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    batched = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))
    for i in range(x.shape[0]):
        single = np.asarray(model.apply(params, jnp.asarray(x[i : i + 1])))
        np.testing.assert_allclose(
            batched[i : i + 1], single, rtol=2e-4, atol=2e-4,
            err_msg=f"{name}: batched row {i} != single-sample forward",
        )
