#!/bin/bash
# Batch eval driver (reference: test.sh:7-16)
set -e

experiments=(
  # Experiments/checkpoint/ConvTasNet-LRS33SPK-tpu/conf.yml
)

for conf in "${experiments[@]}"; do
  echo "=== evaluating $conf ==="
  python -B audio_test.py --conf-dir="$conf"
done
