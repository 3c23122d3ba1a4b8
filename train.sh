#!/bin/bash
# Batch training driver (reference: train.sh:7-17)
set -e

configs=(
  # configs/dprnn_wsj0.yml
  # configs/dptnet_wsj0.yml
  configs/convtasnet_lrs3.yml
)

for conf in "${configs[@]}"; do
  echo "=== training $conf ==="
  python -B audio_train.py --conf-dir="$conf"
done
