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
