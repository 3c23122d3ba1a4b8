"""Trainer / scheduler / checkpoint tests, incl. a tiny end-to-end overfit
(SURVEY.md §7 build stage 4) and the multi-chip dp sharding path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_only_speech_separation_tpu.losses import PITLossWrapper, pairwise_neg_snr
from audio_only_speech_separation_tpu.models import ConvTasNet
from audio_only_speech_separation_tpu.parallel import make_mesh, replicate, shard_batch
from audio_only_speech_separation_tpu.train import (
    AudioSystem,
    CheckpointManager,
    EarlyStopping,
    ReduceLROnPlateau,
    Trainer,
    get_learning_rate,
    make_optimizer,
    make_scheduler,
    set_learning_rate,
)


pytestmark = pytest.mark.slow  # integration/parity: excluded from `make test-fast`


class FakeLoader:
    """Static synthetic batches implementing the loader protocol."""

    def __init__(self, n_batches=2, batch=4, T=800, n_src=2, seed=0):
        rng = np.random.default_rng(seed)
        s = rng.normal(size=(n_batches, batch, n_src, T)).astype(np.float32) * 0.1
        self.sources = s
        self.mixes = s.sum(2)
        self.keys = [[f"b{i}_{j}" for j in range(batch)] for i in range(n_batches)]

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        for i in range(len(self.mixes)):
            yield self.mixes[i], self.sources[i], self.keys[i]

    def __len__(self):
        return len(self.mixes)


def tiny_model():
    return ConvTasNet(N=16, L=8, B=8, H=8, P=3, X=1, R=1, num_spks=2, sample_rate=8000)


class TestSchedulers:
    def test_plateau_reduces_after_patience(self):
        s = ReduceLROnPlateau(lr=1.0, patience=2, factor=0.5)
        for v in [1.0, 0.9, 0.9, 0.9]:  # 1 improvement + 3 bad
            lr = s.step(v)
        assert lr == 1.0
        lr = s.step(0.9)  # 4th bad epoch > patience
        assert lr == 0.5

    def test_plateau_resets_on_improvement(self):
        s = ReduceLROnPlateau(lr=1.0, patience=1, factor=0.5)
        s.step(1.0)
        s.step(1.1)
        lr = s.step(0.5)  # improvement resets counter
        assert lr == 1.0

    def test_make_scheduler_registry(self):
        assert make_scheduler("ReduceLROnPlateau", lr=0.1, patience=5).patience == 5
        with pytest.raises(ValueError):
            make_scheduler("NoSuch", lr=0.1)

    def test_noam_warmup_rises_then_decays(self):
        s = make_scheduler("NoamLR", lr=0.0, d_model=64, warmup_steps=10)
        lrs = [s.step_batch() for _ in range(30)]
        assert lrs[9] == max(lrs[:10])  # rising through warmup
        assert lrs[29] < lrs[10]


class TestOptimizerLR:
    def test_injected_lr_roundtrip(self):
        tx = make_optimizer("adam", lr=1e-3)
        params = {"w": jnp.ones((3,))}
        state = tx.init(params)
        assert abs(get_learning_rate(state) - 1e-3) < 1e-9
        state = set_learning_rate(state, 5e-4)
        assert abs(get_learning_rate(state) - 5e-4) < 1e-9

    def test_optimizer_names(self):
        for name in ("adam", "adamw", "sgd", "rmsprop", "lamb", "radam", "ranger"):
            tx = make_optimizer(name, lr=1e-3)
            tx.init({"w": jnp.ones((2,))})
        with pytest.raises(ValueError):
            make_optimizer("nope", lr=1e-3)


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = EarlyStopping(patience=2)
        assert not es.step(1.0)
        assert not es.step(1.1)
        assert es.step(1.2)


class TestCheckpoints:
    def test_top_k_eviction(self, tmp_path):
        cm = CheckpointManager(str(tmp_path), save_top_k=2)
        for epoch, metric in [(0, 5.0), (1, 3.0), (2, 4.0), (3, 1.0)]:
            cm.save({"params": {"w": np.ones(2)}, "opt_state": {}}, epoch, metric)
        assert len(cm.best_k) == 2
        assert set(cm.best_k.values()) == {3.0, 1.0}
        assert os.path.exists(cm.last_path)
        best = cm.load()
        assert best["monitor"]["val_loss"] == 1.0

    def test_resume(self, tmp_path):
        cm = CheckpointManager(str(tmp_path))
        cm.save({"params": {"w": np.full(2, 7.0)}, "opt_state": {}}, 4, 2.0)
        cm2 = CheckpointManager(str(tmp_path))
        state = cm2.maybe_resume()
        assert state["epoch"] == 4
        np.testing.assert_array_equal(state["params"]["w"], np.full(2, 7.0))


class TestEndToEnd:
    def test_overfit_tiny_synthetic(self, tmp_path):
        """Loss must drop substantially on a fixed synthetic mixture set."""
        model = tiny_model()
        loader = FakeLoader(n_batches=2, batch=4, T=800)
        loss = {
            "train": PITLossWrapper(pairwise_neg_snr, threshold_byloss=False),
            "val": PITLossWrapper(pairwise_neg_snr, threshold_byloss=False),
        }
        tx = make_optimizer("adam", lr=1e-3, grad_clip=5.0)
        system = AudioSystem(
            audio_model=model,
            loss_func=loss,
            optimizer=tx,
            train_loader=loader,
            val_loader=FakeLoader(n_batches=1, batch=4, T=800, seed=1),
            test_loader=None,
            scheduler=make_scheduler("ReduceLROnPlateau", lr=1e-3, patience=5),
        )
        trainer = Trainer(
            exp_dir=str(tmp_path),
            epochs=12,
            early_stop={"patience": 50},
            mesh=make_mesh(2),
            donate=False,
        )
        trainer.fit(system)
        # loss trajectory from the CSV logger
        import csv

        rows = list(csv.DictReader(open(os.path.join(tmp_path, "logs", "scalars.csv"))))
        train_losses = [float(r["value"]) for r in rows if r["tag"] == "train_loss"]
        assert train_losses[-1] < train_losses[0] - 1.0, train_losses
        # artifacts
        assert os.path.exists(os.path.join(tmp_path, "best_model.pth"))
        assert os.path.exists(os.path.join(tmp_path, "best_k_models.json"))
        assert os.path.exists(os.path.join(tmp_path, "last.ckpt"))

    def test_dp_sharding_matches_single_device(self):
        """Global-batch loss under an 8-device dp mesh == single device."""
        model = tiny_model()
        rng = np.random.default_rng(0)
        mix = jnp.asarray(rng.normal(size=(8, 800)).astype(np.float32))
        src = jnp.asarray(rng.normal(size=(8, 2, 800)).astype(np.float32))
        loss_fn = PITLossWrapper(pairwise_neg_snr, threshold_byloss=False)
        params = model.init(jax.random.PRNGKey(0), mix)

        def loss(p, m, s):
            return loss_fn(model.apply(p, m), s)

        single = float(jax.jit(loss)(params, mix, src))
        mesh = make_mesh(8)
        p_rep = replicate(params, mesh)
        m_sh, s_sh = shard_batch((mix, src), mesh)
        multi = float(jax.jit(loss)(p_rep, m_sh, s_sh))
        assert abs(single - multi) < 1e-3


class VariableBatchLoader:
    """Loader with a short tail batch (drop_last=False eval semantics)."""

    def __init__(self, sizes=(4, 2), T=800, n_src=2, seed=0):
        rng = np.random.default_rng(seed)
        self.batches = []
        for i, b in enumerate(sizes):
            s = rng.normal(size=(b, n_src, T)).astype(np.float32) * 0.1
            self.batches.append((s.sum(1), s, [f"k{i}_{j}" for j in range(b)]))

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


class TestEpochAccounting:
    def test_eval_epoch_weights_tail_batch(self, tmp_path):
        """Epoch mean must weight by batch size, not average batch means
        (VERDICT r1 weak #8)."""
        trainer = Trainer(exp_dir=str(tmp_path), epochs=1, mesh=make_mesh(1))
        loader = VariableBatchLoader(sizes=(4, 2))

        def val_step(params, batch):
            # per-batch "loss" = batch size → weighted mean (4*4+2*2)/6
            return jnp.asarray(float(batch[0].shape[0]))

        got = trainer._eval_epoch(val_step, None, loader)
        assert abs(got - 20.0 / 6.0) < 1e-6
        assert abs(got - 3.0) > 1e-3  # unweighted mean would be 3.0


class TestTrainWithDropout:
    @pytest.mark.parametrize("remat", [False, True])
    def test_fit_tdanet_dropout(self, tmp_path, remat):
        """Dropout rngs thread through the jitted (and remat'd) train step."""
        from audio_only_speech_separation_tpu.models import TDANet

        model = TDANet(
            out_channels=8, in_channels=8, num_blocks=1, upsampling_depth=4,
            enc_kernel_size=4, num_sources=2, sample_rate=8000,
        )
        loss = {
            "train": PITLossWrapper(pairwise_neg_snr, threshold_byloss=False),
            "val": PITLossWrapper(pairwise_neg_snr, threshold_byloss=False),
        }
        system = AudioSystem(
            audio_model=model,
            loss_func=loss,
            optimizer=make_optimizer("adam", lr=1e-3, grad_clip=5.0),
            train_loader=FakeLoader(n_batches=2, batch=2, T=800),
            val_loader=FakeLoader(n_batches=1, batch=2, T=800, seed=1),
            test_loader=None,
            scheduler=make_scheduler("ReduceLROnPlateau", lr=1e-3, patience=5),
        )
        trainer = Trainer(
            exp_dir=str(tmp_path), epochs=2, mesh=make_mesh(2),
            donate=False, remat=remat,
        )
        state = trainer.fit(system)
        assert state["params"] is not None
        # reference scalar names land in the CSV (audio_litmodule.py:136-148)
        import csv

        rows = list(csv.DictReader(open(os.path.join(tmp_path, "logs", "scalars.csv"))))
        tags = {r["tag"] for r in rows}
        assert {"train_loss", "val_loss", "val_pit_sisnr", "learning_rate"} <= tags
