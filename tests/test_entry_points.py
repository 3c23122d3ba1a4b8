"""End-to-end CLI tests: audio_train.py + audio_test.py on synthetic data."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml


pytestmark = pytest.mark.slow  # integration/parity: excluded from `make test-fast`


@pytest.fixture
def tiny_experiment(tmp_path):
    """Synthetic manifests + a tiny config; returns (conf_path, workdir)."""
    from audio_only_speech_separation_tpu.data.audio_io import write_wav

    sr = 8000
    for split in ("tr", "cv", "tt"):
        d = tmp_path / "data" / split
        for cond in ("mix", "s1", "s2"):
            (d / cond).mkdir(parents=True, exist_ok=True)
        infos = {c: [] for c in ("mix", "s1", "s2")}
        rng = np.random.default_rng(abs(hash(split)) % 2**32)
        for i in range(20):
            L = 2400
            s1 = rng.normal(size=L).astype(np.float32) * 0.1
            s2 = rng.normal(size=L).astype(np.float32) * 0.1
            for cond, wav in (("mix", s1 + s2), ("s1", s1), ("s2", s2)):
                p = str(d / cond / f"u{i}.wav")
                write_wav(p, wav, sr)
                infos[cond].append((p, L))
        for cond, lst in infos.items():
            with open(d / f"{cond}.json", "w") as f:
                json.dump(lst, f)

    conf = {
        "audionet": {
            "audionet_name": "ConvTasNet",
            "audionet_config": dict(N=16, L=8, B=8, H=8, P=3, X=1, R=1, num_spks=2),
        },
        "loss": {
            "train": {"loss_func": "PITLossWrapper", "sdr_type": "pairwise_neg_snr",
                      "config": {"pit_from": "pw_mtx", "threshold_byloss": False}},
            "val": {"loss_func": "PITLossWrapper", "sdr_type": "pairwise_neg_sisdr",
                    "config": {"pit_from": "pw_mtx", "threshold_byloss": False}},
        },
        "training": {"system": "AudioLightningModule", "gpus": [0], "parallel": "ddp",
                     "epochs": 2,
                     "early_stop": {"monitor": "val_loss/dataloader_idx_0",
                                    "mode": "min", "patience": 30, "verbose": False}},
        "optimizer": {"optim_name": "adam", "lr": 0.001, "weight_decay": 0},
        "scheduler": {"sche_name": "ReduceLROnPlateau",
                      "sche_config": {"patience": 15, "factor": 0.5}},
        "datamodule": {"data_name": "LRS2DataModule",
                       "data_config": dict(
                           train_dir=str(tmp_path / "data" / "tr"),
                           valid_dir=str(tmp_path / "data" / "cv"),
                           test_dir=str(tmp_path / "data" / "tt"),
                           n_src=2, sample_rate=sr, fps=25, segment=0.25,
                           normalize_audio=False, batch_size=1, num_workers=2,
                           pin_memory=False, persistent_workers=False,
                           audio_only=True)},
        "exp": {"exp_name": "tiny_e2e"},
    }
    conf_path = str(tmp_path / "tiny.yml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    return conf_path, tmp_path


def run_cli(script, args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    # the CLIs honor jax_platforms via flag; force cpu through the env that
    # conftest can't reach (subprocess)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv = {[script] + args!r};"
        f"exec(open({script!r}).read())"
    )
    return subprocess.run(
        [sys.executable, "-c", code], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=900,
    )


class TestPreprocessCLI:
    def test_wav_tree_to_manifests_to_training(self, tmp_path):
        """The full L0→L5 chain the reference drives by hand
        (data-preprocess/preprocess_wham.py:28-52 → audio_train.py):
        synthetic wav tree → preprocess.py CLI → manifests →
        audio_train.py → audio_test.py."""
        from audio_only_speech_separation_tpu.data.audio_io import write_wav

        sr = 8000
        raw = tmp_path / "raw"
        n_per_split = {"tr": 8, "cv": 4, "tt": 4}
        for split, n in n_per_split.items():
            rng = np.random.default_rng(abs(hash(split)) % 2**32)
            for cond in ("mix_both", "s1", "s2"):
                (raw / split / cond).mkdir(parents=True, exist_ok=True)
            for i in range(n):
                L = 2400
                s1 = rng.normal(size=L).astype(np.float32) * 0.1
                s2 = rng.normal(size=L).astype(np.float32) * 0.1
                for cond, wav in (("mix_both", s1 + s2), ("s1", s1), ("s2", s2)):
                    write_wav(str(raw / split / cond / f"u{i}.wav"), wav, sr)
            # a non-wav file the scanner must skip
            (raw / split / "mix_both" / "README.txt").write_text("not audio")

        out = tmp_path / "manifests"
        r = run_cli(
            "/root/repo/data-preprocess/preprocess.py",
            ["--dataset", "wham", "--in_dir", str(raw), "--out_dir", str(out)],
            str(tmp_path),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        for split, n in n_per_split.items():
            for cond in ("mix_both", "s1", "s2"):
                man = out / split / f"{cond}.json"
                assert man.exists(), man
                entries = json.loads(man.read_text())
                assert len(entries) == n
                # [wav_path, n_samples] pairs with real lengths
                assert all(e[1] == 2400 for e in entries)
                assert all(e[0].endswith(".wav") for e in entries)

        conf = {
            "audionet": {
                "audionet_name": "ConvTasNet",
                "audionet_config": dict(N=16, L=8, B=8, H=8, P=3, X=1, R=1, num_spks=2),
            },
            "loss": {
                "train": {"loss_func": "PITLossWrapper", "sdr_type": "pairwise_neg_snr",
                          "config": {"pit_from": "pw_mtx", "threshold_byloss": False}},
                "val": {"loss_func": "PITLossWrapper", "sdr_type": "pairwise_neg_sisdr",
                        "config": {"pit_from": "pw_mtx", "threshold_byloss": False}},
            },
            "training": {"system": "AudioLightningModule", "gpus": [0],
                         "parallel": "ddp", "epochs": 1,
                         "early_stop": {"monitor": "val_loss/dataloader_idx_0",
                                        "mode": "min", "patience": 30,
                                        "verbose": False}},
            "optimizer": {"optim_name": "adam", "lr": 0.001, "weight_decay": 0},
            "scheduler": {"sche_name": "ReduceLROnPlateau",
                          "sche_config": {"patience": 15, "factor": 0.5}},
            # WhamDataModule consumes the mix_both manifests preprocess wrote
            "datamodule": {"data_name": "WhamDataModule",
                           "data_config": dict(
                               train_dir=str(out / "tr"),
                               valid_dir=str(out / "cv"),
                               test_dir=str(out / "tt"),
                               n_src=2, sample_rate=sr, fps=25, segment=0.25,
                               normalize_audio=False, batch_size=1,
                               num_workers=2, pin_memory=False,
                               persistent_workers=False, audio_only=True)},
            "exp": {"exp_name": "preprocess_e2e"},
        }
        conf_path = tmp_path / "pre.yml"
        with open(conf_path, "w") as f:
            yaml.safe_dump(conf, f)
        r = run_cli("/root/repo/audio_train.py", [f"--conf-dir={conf_path}"], str(tmp_path))
        assert r.returncode == 0, r.stderr[-2000:]
        exp_dir = tmp_path / "Experiments" / "checkpoint" / "preprocess_e2e"
        assert (exp_dir / "best_model.pth").exists()
        r2 = run_cli(
            "/root/repo/audio_test.py",
            [f"--conf-dir={exp_dir / 'conf.yml'}", "--bucket-seconds", "0.5"],
            str(tmp_path),
        )
        assert r2.returncode == 0, r2.stderr[-2000:]
        lines = (exp_dir / "results" / "metrics.csv").read_text().strip().splitlines()
        assert lines[0].startswith("snt_id")
        assert sum(1 for l in lines[1:] if l.startswith("u")) == n_per_split["tt"]


class TestTrainCLI:
    def test_train_then_eval(self, tiny_experiment):
        conf_path, workdir = tiny_experiment
        r = run_cli("/root/repo/audio_train.py", [f"--conf-dir={conf_path}"], str(workdir))
        assert r.returncode == 0, r.stderr[-2000:]
        exp_dir = workdir / "Experiments" / "checkpoint" / "tiny_e2e"
        assert (exp_dir / "best_model.pth").exists()
        assert (exp_dir / "last.ckpt").exists()
        assert (exp_dir / "conf.yml").exists()
        assert (exp_dir / "best_k_models.json").exists()

        r2 = run_cli(
            "/root/repo/audio_test.py",
            [f"--conf-dir={exp_dir / 'conf.yml'}", "--bucket-seconds", "0.5"],
            str(workdir),
        )
        assert r2.returncode == 0, r2.stderr[-2000:]
        metrics = exp_dir / "results" / "metrics.csv"
        assert metrics.exists()
        lines = metrics.read_text().strip().splitlines()
        assert lines[0].startswith("snt_id")
        assert any(l.startswith("avg") for l in lines)
