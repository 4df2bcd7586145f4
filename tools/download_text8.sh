#!/usr/bin/env bash
# Equivalent of the reference data/download_text8.sh (reference
# data/download_text8.sh:1-5): fetch enwik8 and filter it to text8.
# NOTE: this container has no network egress; run on a connected machine.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p data
if [ ! -f data/enwik8 ]; then
  wget -O data/enwik8.zip http://mattmahoney.net/dc/enwik8.zip
  (cd data && unzip -o enwik8.zip)
fi
python -m word2bits_tpu.data.wikifil data/enwik8 > data/text8
echo "wrote data/text8"
