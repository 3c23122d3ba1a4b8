"""Multi-host data parallelism smoke test (SURVEY.md §7 stage 9).

Launches audio_train.py as TWO coordinated processes (jax.distributed +
Gloo CPU collectives, 2 virtual devices each) on synthetic manifests and
checks the run against a single-process 4-device run of the same config:

- the strided per-host loader shards partition each global batch into the
  same sample SETS the single-process loader uses, and the global-mean
  loss/gradients are permutation-invariant across the batch axis, so the
  two trajectories must agree to reduction-order tolerance;
- process 0 owns the artifacts (conf.yml, checkpoints, best_model.pth);
- the host-local eval path + process_allgather reduction executes
  (unequal per-host val shard sizes included: 20 % 2 == 0 but batch
  counts differ with batch 2 vs 4).

The reference has no multi-host story at all — Lightning single-host DDP
only (reference audio_train.py:120-132).
"""

import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # spawns 3 training subprocesses


@pytest.fixture
def tiny_experiment(tmp_path):
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
        # SGD at a tiny lr, not Adam: the equivalence assertion compares a
        # 2-host run against a single-host control.  The synthetic task
        # (separating two noise sources) is chaotic, so ANY cross-topology
        # reduction-order noise amplifies through training — Adam's
        # rsqrt(v) normalization amplifies it within steps, and even SGD
        # at lr=1e-3 diverged up to 4e-2 run-to-run.  At lr=1e-5 chaos is
        # suppressed proportionally while a genuine sharding bug (hosts
        # training on wrong/disjoint data) would still shift the loss by
        # O(0.1): the tolerance stays sharp against real regressions.
        "optimizer": {"optim_name": "sgd", "lr": 1e-05, "weight_decay": 0},
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
        "exp": {"exp_name": "tiny_mh"},
    }
    conf_path = str(tmp_path / "tiny.yml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    return conf_path, tmp_path


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(conf_path, workdir, n_virtual, extra_env):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_virtual}"
    env.update(extra_env)
    script = "/root/repo/audio_train.py"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv = ['audio_train.py', '--conf-dir={conf_path}'];"
        f"exec(open({script!r}).read())"
    )
    return subprocess.Popen(
        [sys.executable, "-c", code], cwd=workdir, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _final_val_loss(out: str) -> float:
    vals = re.findall(r"val_loss=([-\d.]+)", out)
    assert vals, f"no val_loss lines in output:\n{out[-2000:]}"
    return float(vals[-1])


def test_two_process_dp_matches_single_process(tiny_experiment):
    conf_path, tmp_path = tiny_experiment

    # --- single-process, 4 virtual devices (the control) ---------------
    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()
    proc = _launch(conf_path, sp_dir, 4, {})
    out_sp, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out_sp[-3000:]
    ref_loss = _final_val_loss(out_sp)

    # --- two processes × 2 virtual devices each ------------------------
    mh_dir = tmp_path / "mh"
    mh_dir.mkdir()
    port = _free_port()
    procs = []
    for pid in (0, 1):
        procs.append(_launch(conf_path, mh_dir, 2, {
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    # process 0 prints and owns artifacts; process 1 is silent on epochs
    assert "epoch 1:" in outs[0]
    assert "epoch 1:" not in outs[1]
    exp = mh_dir / "Experiments" / "checkpoint" / "tiny_mh"
    assert (exp / "best_model.pth").exists()
    assert (exp / "best_k_models.json").exists()

    # permutation-invariant global-batch loss: trajectories must agree
    mh_loss = _final_val_loss(outs[0])
    # exact-content equivalence is pinned separately by
    # test_sharded_loaders_partition_global_batches; this bound catches
    # wrong-data bugs (O(0.1) shifts) above the suppressed chaos floor
    assert abs(mh_loss - ref_loss) < 1e-3, (mh_loss, ref_loss)


def test_sharded_loaders_partition_global_batches(tiny_experiment):
    """Exact-content check: per-host strided shards reassemble the same
    global batches (same keys, bitwise-equal samples) the single-host
    loader produces — crops are per-(seed, epoch, item) deterministic."""
    from audio_only_speech_separation_tpu.data.dataset import LRS2Dataset
    from audio_only_speech_separation_tpu.data.loader import DataLoader

    conf_path, tmp_path = tiny_experiment
    d = str(tmp_path / "data" / "tr")

    def batches(shard_id, num_shards, bs, epoch):
        ds = LRS2Dataset(d, n_src=2, sample_rate=8000, segment=0.25, seed=0)
        dl = DataLoader(ds, batch_size=bs, shuffle=True, drop_last=True,
                        num_workers=2, seed=0, shard_id=shard_id,
                        num_shards=num_shards)
        dl.set_epoch(epoch)
        return list(dl)

    for epoch in (0, 1):
        ctrl = batches(0, 1, 4, epoch)
        h0 = batches(0, 2, 2, epoch)
        h1 = batches(1, 2, 2, epoch)
        assert len(ctrl) == len(h0) == len(h1)
        for k in range(len(ctrl)):
            ckeys = sorted(ctrl[k][2])
            mkeys = sorted(list(h0[k][2]) + list(h1[k][2]))
            assert ckeys == mkeys
            cmap = {key: ctrl[k][0][i] for i, key in enumerate(ctrl[k][2])}
            mmix = np.concatenate([h0[k][0], h1[k][0]])
            mmap = {key: mmix[i]
                    for i, key in enumerate(list(h0[k][2]) + list(h1[k][2]))}
            for key in ckeys:
                assert np.array_equal(cmap[key], mmap[key])
