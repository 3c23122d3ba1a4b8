"""Mixed-precision training smoke tests (bf16 policy)."""

import numpy as np
import pytest

from audio_only_speech_separation_tpu.losses import PITLossWrapper, pairwise_neg_snr
from audio_only_speech_separation_tpu.models import ConvTasNet
from audio_only_speech_separation_tpu.parallel import make_mesh
from audio_only_speech_separation_tpu.train import (
    AudioSystem,
    Trainer,
    make_optimizer,
)
from tests.test_train import FakeLoader, tiny_model


pytestmark = pytest.mark.slow  # integration/parity: excluded from `make test-fast`


class TestBF16Training:
    @pytest.mark.skipif(
        __import__("jax").default_backend() == "cpu",
        reason="CPU backend lacks bf16×bf16→f32 dots; bf16 is a TPU policy",
    )
    def test_bf16_loss_decreases(self, tmp_path):
        model = tiny_model()
        loader = FakeLoader(n_batches=2, batch=4, T=800)
        loss = {
            "train": PITLossWrapper(pairwise_neg_snr, threshold_byloss=False),
            "val": PITLossWrapper(pairwise_neg_snr, threshold_byloss=False),
        }
        system = AudioSystem(
            audio_model=model,
            loss_func=loss,
            optimizer=make_optimizer("adam", lr=1e-3, grad_clip=5.0),
            train_loader=loader,
            val_loader=FakeLoader(n_batches=1, batch=4, T=800, seed=1),
            test_loader=None,
            scheduler=None,
        )
        trainer = Trainer(
            exp_dir=str(tmp_path),
            epochs=8,
            early_stop={"patience": 50},
            mesh=make_mesh(2),
            donate=False,
            precision="bfloat16",
        )
        trainer.fit(system)
        import csv

        rows = list(csv.DictReader(open(tmp_path / "logs" / "scalars.csv")))
        losses = [float(r["value"]) for r in rows if r["tag"] == "train_loss"]
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] - 0.5, losses

    def test_remat_matches_plain(self, tmp_path):
        # remat changes scheduling, not math: one epoch, same final loss
        results = {}
        for remat in (False, True):
            model = tiny_model()
            loader = FakeLoader(n_batches=1, batch=4, T=800)
            system = AudioSystem(
                audio_model=model,
                loss_func={
                    "train": PITLossWrapper(pairwise_neg_snr, threshold_byloss=False),
                    "val": PITLossWrapper(pairwise_neg_snr, threshold_byloss=False),
                },
                optimizer=make_optimizer("adam", lr=1e-3),
                train_loader=loader,
                val_loader=FakeLoader(n_batches=1, batch=4, T=800, seed=1),
                test_loader=None,
                scheduler=None,
            )
            trainer = Trainer(
                exp_dir=str(tmp_path / f"remat_{remat}"),
                epochs=1,
                early_stop={"patience": 50},
                mesh=make_mesh(2),
                donate=False,
                remat=remat,
            )
            trainer.fit(system)
            import csv

            rows = list(
                csv.DictReader(
                    open(tmp_path / f"remat_{remat}" / "logs" / "scalars.csv")
                )
            )
            results[remat] = [
                float(r["value"]) for r in rows if r["tag"] == "val_loss"
            ][-1]
        np.testing.assert_allclose(results[False], results[True], rtol=1e-4)
