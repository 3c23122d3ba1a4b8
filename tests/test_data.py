"""Data layer tests (SURVEY.md §4 item 5): manifest filtering, cropping,
loader batching, sharding."""

import json
import os

import numpy as np
import pytest

import audio_only_speech_separation_tpu.data as datas


@pytest.fixture
def manifest_dir(tmp_path):
    """Synthetic wav tree + manifests: 6 utterances, lengths 800..8800."""
    from audio_only_speech_separation_tpu.data.audio_io import write_wav

    sr = 8000
    lengths = [800, 2000, 4000, 6000, 8000, 8800]
    for split in ("tr", "cv", "tt"):
        split_dir = tmp_path / split
        for cond in ("mix", "s1", "s2"):
            (split_dir / cond).mkdir(parents=True, exist_ok=True)
        infos = {c: [] for c in ("mix", "s1", "s2")}
        rng = np.random.default_rng(hash(split) % 2**32)
        for i, L in enumerate(lengths):
            s1 = rng.normal(size=L).astype(np.float32) * 0.1
            s2 = rng.normal(size=L).astype(np.float32) * 0.1
            mix = s1 + s2
            for cond, wav in (("mix", mix), ("s1", s1), ("s2", s2)):
                p = str(split_dir / cond / f"utt{i}.wav")
                write_wav(p, wav, sr)
                infos[cond].append((p, L))
        for cond, lst in infos.items():
            with open(split_dir / f"{cond}.json", "w") as f:
                json.dump(lst, f)
    return str(tmp_path)


class TestManifestDataset:
    def test_short_utterance_filtering(self, manifest_dir):
        ds = datas.LRS2Dataset(
            os.path.join(manifest_dir, "tr"), n_src=2, sample_rate=8000, segment=0.5
        )
        # segment 0.5s = 4000 samples: drops 800 and 2000
        assert len(ds) == 4
        assert ds.drop_utt == 2

    def test_test_mode_keeps_all(self, manifest_dir):
        ds = datas.LRS2Dataset(
            os.path.join(manifest_dir, "tr"), n_src=2, sample_rate=8000, segment=None
        )
        assert len(ds) == 6
        mix, srcs, key = ds[0]
        assert srcs.shape == (2, len(mix))

    def test_crop_shapes_and_mixture_consistency(self, manifest_dir):
        ds = datas.LRS2Dataset(
            os.path.join(manifest_dir, "tr"), n_src=2, sample_rate=8000, segment=0.5
        )
        mix, srcs, key = ds[0]
        assert mix.shape == (4000,)
        assert srcs.shape == (2, 4000)
        np.testing.assert_allclose(mix, srcs.sum(0), atol=1e-3)

    def test_crop_determinism_under_seed(self, manifest_dir):
        kw = dict(n_src=2, sample_rate=8000, segment=0.5)
        d1 = datas.LRS2Dataset(os.path.join(manifest_dir, "tr"), seed=7, **kw)
        d2 = datas.LRS2Dataset(os.path.join(manifest_dir, "tr"), seed=7, **kw)
        m1, _, _ = d1[3]
        m2, _, _ = d2[3]
        np.testing.assert_array_equal(m1, m2)

    def test_n_src_1_flattens_pairs(self, manifest_dir):
        ds = datas.LRS2Dataset(
            os.path.join(manifest_dir, "tr"), n_src=1, sample_rate=8000, segment=0.5
        )
        assert len(ds) == 8  # 4 kept utts × 2 sources
        mix, tgt, _ = ds[0]
        assert tgt.shape == (1, 4000)

    def test_two_step_returns_target_as_input(self, manifest_dir):
        ds = datas.LRS2TwoStepDataset(
            os.path.join(manifest_dir, "tr"), n_src=1, sample_rate=8000, segment=0.5
        )
        mix, tgt, _ = ds[0]
        np.testing.assert_array_equal(mix, tgt[0])

    def test_normalize_audio(self, manifest_dir):
        ds = datas.LRS2Dataset(
            os.path.join(manifest_dir, "tr"), n_src=2, sample_rate=8000,
            segment=0.5, normalize_audio=True,
        )
        mix, _, _ = ds[0]
        assert abs(mix.mean()) < 1e-5
        assert abs(mix.std() - 1.0) < 1e-2


class TestDataLoader:
    def test_batching_and_drop_last(self, manifest_dir):
        ds = datas.LRS2Dataset(
            os.path.join(manifest_dir, "tr"), n_src=2, sample_rate=8000, segment=0.5
        )
        loader = datas.DataLoader(ds, batch_size=3, drop_last=True, num_workers=2)
        batches = list(loader)
        assert len(batches) == 1  # 4 items → 1 full batch of 3
        mix, srcs, keys = batches[0]
        assert mix.shape == (3, 4000)
        assert srcs.shape == (3, 2, 4000)
        assert len(keys) == 3

    def test_shuffle_changes_with_epoch(self, manifest_dir):
        ds = datas.LRS2Dataset(
            os.path.join(manifest_dir, "tr"), n_src=2, sample_rate=8000, segment=None
        )
        loader = datas.DataLoader(ds, batch_size=6, shuffle=True, num_workers=1, seed=1, pad_to_max=True)
        loader.set_epoch(0)
        k0 = list(loader)[0][2]
        loader.set_epoch(1)
        k1 = list(loader)[0][2]
        assert set(k0) == set(k1)
        assert k0 != k1  # different order (probabilistically certain)

    def test_sharding_partitions(self, manifest_dir):
        ds = datas.LRS2Dataset(
            os.path.join(manifest_dir, "tr"), n_src=2, sample_rate=8000, segment=None
        )
        keys = []
        for shard in range(2):
            loader = datas.DataLoader(
                ds, batch_size=3, num_workers=1, shard_id=shard, num_shards=2,
                pad_to_max=True,
            )
            for b in loader:
                keys.extend(b[2])
        assert len(keys) == 6 and len(set(keys)) == 6

    def test_datamodule_contract(self, manifest_dir):
        dm = datas.LRS2DataModule(
            train_dir=os.path.join(manifest_dir, "tr"),
            valid_dir=os.path.join(manifest_dir, "cv"),
            test_dir=os.path.join(manifest_dir, "tt"),
            n_src=2,
            sample_rate=8000,
            segment=0.5,
            batch_size=2,
            num_workers=2,
        )
        dm.setup()
        train, val, test = dm.make_loader
        tr_sets = dm.make_sets
        assert len(tr_sets) == 3
        mix, srcs, keys = next(iter(train))
        assert mix.shape == (2, 4000)
