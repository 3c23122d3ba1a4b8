"""Eligibility gates for the Pallas kernels (pure host logic, CPU-testable).

The kernels themselves can only execute on TPU (validated on-chip by
scripts/validate_pallas.py → docs/PALLAS_VALIDATION.json); these tests pin
the measured dispatch policy so a refactor can't silently change which
path a deployment takes.
"""

import jax.numpy as jnp

from audio_only_speech_separation_tpu.ops.pallas.attention import attention_eligible
from audio_only_speech_separation_tpu.ops.pallas.lstm import bilstm_eligible


class TestAttentionGate:
    def test_off_tpu_never(self):
        assert not attention_eligible(250, 32, 512, backend="cpu")

    def test_low_padding_waste_eligible(self):
        # Sepformer intra: T=250 → Tp=256, ratio 1.02
        assert attention_eligible(250, 32, 528, backend="tpu")
        # DPTNet rows: T=100 → Tp=128, ratio 1.28
        assert attention_eligible(100, 32, 1280, backend="tpu")

    def test_tiny_T_small_traffic_stays_einsum(self):
        # Sepformer inter: T=33, ratio 3.9, logits ≈ 17 MB — einsum wins
        assert not attention_eligible(33, 32, 4000, backend="tpu")

    def test_high_traffic_overrides_padding(self):
        # Sandglasset chunk attention: T=131, ratio 1.96 but ≈ 1 GB logits
        assert attention_eligible(131, 16, 16000, backend="tpu")
        # same shape, small head count → small logits → einsum
        assert not attention_eligible(131, 16, 64, backend="tpu")

    def test_vmem_bound(self):
        assert not attention_eligible(2000, 32, 512, backend="tpu")  # Tp > 1024


class TestBilstmGate:
    def test_off_tpu_never(self):
        assert not bilstm_eligible(251, 64, 256, jnp.bfloat16, backend="cpu")

    def test_f32_never(self):
        assert not bilstm_eligible(251, 64, 256, jnp.float32, backend="tpu")

    def test_bsrnn_band_rnn_regime(self):
        # the measured-win regime: long T, small B (BSRNN per-band RNN)
        assert bilstm_eligible(251, 64, 256, jnp.bfloat16, backend="tpu")

    def test_large_batch_dual_path_stays_on_scan(self):
        # DPRNN intra (B=320) and Sandglasset intra (B=1048): measured
        # slower with the kernel — must stay on lax.scan
        assert not bilstm_eligible(100, 320, 128, jnp.bfloat16, backend="tpu")
        assert not bilstm_eligible(250, 1048, 128, jnp.bfloat16, backend="tpu")

    def test_unaligned_hidden_stays_on_scan(self):
        assert not bilstm_eligible(251, 64, 96, jnp.bfloat16, backend="tpu")


class TestResidentGate:
    def test_off_tpu_never(self):
        from audio_only_speech_separation_tpu.ops.pallas.lstm import resident_eligible

        assert not resident_eligible(100, 328, 64, 128, 2, jnp.bfloat16, backend="cpu")

    def test_long_sequence_large_batch_eligible(self):
        from audio_only_speech_separation_tpu.ops.pallas.lstm import resident_eligible

        # Sandglasset intra (T=250, B=8·131): long T, large B
        assert resident_eligible(250, 1048, 128, 128, 2, jnp.bfloat16, backend="tpu")

    def test_short_sequences_stay_on_xla_scan(self):
        from audio_only_speech_separation_tpu.ops.pallas.lstm import resident_eligible

        # DPRNN row (T=100) and col (T=41): measured ~190 µs kernel vs
        # ~140 µs XLA rnn in-model — XLA wins at short T
        assert not resident_eligible(100, 328, 64, 128, 2, jnp.bfloat16, backend="tpu")
        assert not resident_eligible(41, 800, 64, 128, 2, jnp.bfloat16, backend="tpu")

    def test_small_batch_owned_by_chunked_kernel(self):
        from audio_only_speech_separation_tpu.ops.pallas.lstm import resident_eligible

        # BSRNN band RNN (B=64): bilstm_eligible's measured domain
        assert not resident_eligible(251, 64, 128, 256, 2, jnp.bfloat16, backend="tpu")

    def test_vmem_budget_bound(self):
        from audio_only_speech_separation_tpu.ops.pallas.lstm import resident_eligible

        # a full-utterance batch that cannot fit x + hs in VMEM
        assert not resident_eligible(4000, 512, 64, 128, 2, jnp.bfloat16, backend="tpu")

    def test_f32_and_unaligned_never(self):
        from audio_only_speech_separation_tpu.ops.pallas.lstm import resident_eligible

        assert not resident_eligible(100, 328, 64, 128, 2, jnp.float32, backend="tpu")
        assert not resident_eligible(100, 328, 64, 96, 2, jnp.bfloat16, backend="tpu")


class TestEvalDispatchGate:
    """audio_test.py's forward dispatch must flow through the single
    source of truth (models.convtasnet.fused_forward_eligible /
    models.tdanet.fast_forward_eligible), never an inline copy of the
    conditions — round-4 regression: a hand-copied gate omitted the
    norm == "gLN" check and sent a cLN non-causal ConvTasNet to the gLN
    fused kernel (silently wrong waveforms)."""

    @staticmethod
    def _choose(model, use_bf16, backend):
        import os
        import sys

        root = os.path.join(os.path.dirname(__file__), "..")
        if root not in sys.path:
            sys.path.insert(0, root)
        import audio_test

        return audio_test.choose_dispatch(model, use_bf16, backend=backend)

    def test_cln_noncausal_never_fused(self):
        import audio_only_speech_separation_tpu.models as M

        # valid per the ctor: blocks become causal-cLN internally but the
        # kernel computes global-LN stats — must fall back to apply
        model = M.ConvTasNet(
            N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3,
            norm="cLN", causal=False,
        )
        assert self._choose(model, True, "tpu") == "apply"

    def test_standard_gln_fused_on_tpu_only(self):
        import audio_only_speech_separation_tpu.models as M

        model = M.ConvTasNet(
            N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3,
        )
        assert self._choose(model, True, "tpu") == "fused"
        assert self._choose(model, True, "cpu") == "apply"
        assert self._choose(model, False, "tpu") == "apply"  # f32 eval

    def test_tdanet_fast_path_dispatch(self):
        import audio_only_speech_separation_tpu.models as M

        model = M.TDANet(
            out_channels=128, in_channels=512, num_blocks=16,
            upsampling_depth=5, enc_kernel_size=4, num_sources=2,
        )
        assert self._choose(model, False, "cpu") == "fast_tdanet"
        folded = M.TDANet(
            out_channels=128, in_channels=512, num_blocks=16,
            upsampling_depth=5, enc_kernel_size=4, num_sources=2,
            unfold=False,
        )
        assert self._choose(folded, False, "cpu") == "apply"


class TestValidationFreshness:
    """bench.py refuses its headline unless PALLAS_VALIDATION.json passed on
    the current kernel sources (hash binding, round-2 verdict weak #4)."""

    def test_hashes_cover_all_kernel_sources(self):
        from audio_only_speech_separation_tpu.utils.kernel_hashes import (
            kernel_source_hashes,
        )

        h = kernel_source_hashes()
        assert {"attention.py", "convtasnet_block.py", "lstm.py"} <= set(h)
        assert all(len(v) == 64 for v in h.values())

    def test_fresh_report_accepted(self):
        from audio_only_speech_separation_tpu.utils.kernel_hashes import (
            kernel_source_hashes,
            validation_is_fresh,
        )

        assert validation_is_fresh(
            {"ok": True, "kernel_source_hashes": kernel_source_hashes()}
        )

    def test_stale_or_failed_report_rejected(self):
        from audio_only_speech_separation_tpu.utils.kernel_hashes import (
            kernel_source_hashes,
            validation_is_fresh,
        )

        good = kernel_source_hashes()
        assert not validation_is_fresh({"ok": False, "kernel_source_hashes": good})
        doctored = dict(good, **{"lstm.py": "0" * 64})
        assert not validation_is_fresh({"ok": True, "kernel_source_hashes": doctored})
        assert not validation_is_fresh({"ok": True})

    def test_committed_artifact_is_fresh(self):
        # A kernel edit without revalidation must fail CI, not just bench.
        import json
        import os

        from audio_only_speech_separation_tpu.utils.kernel_hashes import (
            validation_is_fresh,
        )

        path = os.path.join(
            os.path.dirname(__file__), "..", "docs", "PALLAS_VALIDATION.json"
        )
        with open(path) as f:
            report = json.load(f)
        assert validation_is_fresh(report), (
            "docs/PALLAS_VALIDATION.json is stale w.r.t. ops/pallas sources; "
            "re-run scripts/validate_pallas.py on the TPU host"
        )
