#!/usr/bin/env python
"""Manifest builders for every supported dataset (reference L0 layer:
data-preprocess/preprocess_{wham,librimix,lrs2_audio,lrs3_3speaker}.py).

One CLI covers all four — the scripts differ only in which condition
subdirectories they scan (SURVEY.md §2):

    python preprocess.py --dataset wham     --in_dir .../wham    --out_dir .../WhamAudio
    python preprocess.py --dataset librimix --in_dir .../Libri2Mix --out_dir .../LibriAudio
    python preprocess.py --dataset lrs2     --in_dir .../LRS2     --out_dir .../LRS2Audio
    python preprocess.py --dataset lrs3     --in_dir .../LRS3     --out_dir .../LRS33SPK
    python preprocess.py --dataset wsj0     --in_dir .../wsj0-mix/2speakers/wav8k/min --out_dir .../WSJ0Audio

Each writes ``{tr,cv,tt}/<cond>.json`` manifests of [wav_path, n_samples].
"""

import argparse
import json
import os
import sys


def wav_len(path: str) -> int:
    # the package's layered wav IO (soundfile → stdlib wave → scipy →
    # native reader) — soundfile alone is not guaranteed in deployment
    try:
        from audio_only_speech_separation_tpu.data.audio_io import wav_frames

        return wav_frames(path)
    except ImportError:
        import soundfile as sf

        with sf.SoundFile(path) as f:
            return len(f)


def preprocess_one_dir(in_data_dir: str, out_dir: str, data_type: str, cond: str):
    in_dir = os.path.abspath(os.path.join(in_data_dir, data_type, cond))
    if not os.path.isdir(in_dir):
        print(f"skip {in_dir} (missing)", file=sys.stderr)
        return
    file_infos = []
    for wav_file in sorted(os.listdir(in_dir)):
        if not wav_file.endswith(".wav"):
            continue
        wav_path = os.path.join(in_dir, wav_file)
        file_infos.append((wav_path, wav_len(wav_path)))
    os.makedirs(os.path.join(out_dir, data_type), exist_ok=True)
    with open(os.path.join(out_dir, data_type, cond + ".json"), "w") as f:
        json.dump(file_infos, f, indent=4)
    print(f"{data_type}/{cond}: {len(file_infos)} files")


CONDITIONS = {
    # dataset → condition dirs to index (mix manifest name first)
    "wham": ["mix_both", "s1", "s2"],
    "librimix": ["mix_clean", "s1", "s2"],
    "lrs2": ["mix", "s1", "s2"],
    "lrs3": ["mix_noise", "s1", "s2", "s3"],
    "wsj0": ["mix", "s1", "s2"],
}


def main():
    parser = argparse.ArgumentParser("separation dataset preprocessing")
    parser.add_argument("--dataset", choices=sorted(CONDITIONS), required=True)
    parser.add_argument("--in_dir", type=str, required=True,
                        help="Directory containing tr, cv and tt")
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--splits", nargs="*", default=["tr", "cv", "tt"])
    args = parser.parse_args()
    for data_type in args.splits:
        for cond in CONDITIONS[args.dataset]:
            preprocess_one_dir(args.in_dir, args.out_dir, data_type, cond)


if __name__ == "__main__":
    main()
