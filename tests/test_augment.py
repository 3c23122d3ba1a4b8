"""Augmentation + SB dataset adapter tests."""

import csv

import numpy as np

from audio_only_speech_separation_tpu.data.augment import online_mixing_collate
from audio_only_speech_separation_tpu.data.sbdataset import SBAudioDataset
from audio_only_speech_separation_tpu.data.audio_io import write_wav


class TestOnlineMixing:
    def test_energy_preserved_and_mixture_consistent(self, rng):
        targets = rng.normal(size=(4, 2, 1000)).astype(np.float32)
        targets *= rng.uniform(0.5, 2.0, size=(4, 2, 1))
        mixes = targets.sum(1)
        new_mix, new_tgt = online_mixing_collate(mixes, targets, rng=rng)
        # per-slot energies preserved
        np.testing.assert_allclose(
            np.sum(new_tgt**2, -1), np.sum(targets**2, -1), rtol=1e-4
        )
        np.testing.assert_allclose(new_mix, new_tgt.sum(1), rtol=1e-5)


class TestSBDataset:
    def test_csv_contract(self, tmp_path, rng):
        sr = 8000
        rows = []
        for i in range(3):
            m = rng.normal(size=4000).astype(np.float32) * 0.1
            s1 = m * 0.5
            s2 = m * 0.5
            paths = {}
            for name, wav in (("mix", m), ("s1", s1), ("s2", s2)):
                p = str(tmp_path / f"{name}_{i}.wav")
                write_wav(p, wav, sr)
                paths[name] = p
            rows.append(
                dict(id=f"utt{i}", duration=0.5, mix_wav=paths["mix"],
                     s1_wav=paths["s1"], s2_wav=paths["s2"])
            )
        csv_path = str(tmp_path / "data.csv")
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        ds = SBAudioDataset(csv_path, n_src=2, sample_rate=sr, segment=0.25)
        assert len(ds) == 3
        mix, srcs, key = ds[0]
        assert mix.shape == (2000,) and srcs.shape == (2, 2000)
        assert key == "utt0"
