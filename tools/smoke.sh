#!/usr/bin/env bash
# End-to-end smoke of every CLI surface on a synthetic corpus.
# Usage: bash tools/smoke.sh [workdir]   (defaults to a temp dir)
# Runs on whatever JAX backend is default (TPU here; JAX_PLATFORMS=cpu works).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
D="${1:-$(mktemp -d)}"; mkdir -p "$D"
cd "$D"
echo "workdir: $D"

python - <<'EOF'
import numpy as np
rng = np.random.default_rng(42)
topics = [["cat","dog","pet","fur","paw","tail"],["sun","moon","star","sky","cloud","rain"],
          ["red","blue","green","color","paint","ink"],["run","walk","jump","move","step","go"]]
fill = ["the","a","of","and","to","in"]
lines=[" ".join([fill[rng.integers(6)] if rng.random()<.3 else t[rng.integers(6)]
       for _ in range(rng.integers(8,16))]) for t in (topics[rng.integers(4)] for _ in range(2000))]
open("corpus.txt","w").write("\n".join(lines)+"\n")
EOF

echo "== vocab-only (no -output: reference returns after vocab build) =="
python -m word2bits_tpu.cli train -train corpus.txt -save-vocab vocab.txt | tail -2

echo "== CBOW train (bf16 fused, shared negatives, packed export) =="
python -m word2bits_tpu.cli train -train corpus.txt -output cbow.bin -binary 1 \
    -size 32 -window 3 -negative 6 -iter 2 -min-count 2 -bitlevel 1 \
    -batch-size 128 -neg-sharing 16 -fused-tables 1 -dtype bfloat16 \
    -packed 1 -checkpoint-dir ckpt -debug 1 | tail -2

echo "== resume for one more epoch =="
python -m word2bits_tpu.cli train -train corpus.txt -output cbow.bin -binary 1 \
    -size 32 -window 3 -negative 6 -iter 3 -min-count 2 -bitlevel 1 \
    -batch-size 128 -neg-sharing 16 -fused-tables 1 -dtype bfloat16 \
    -packed 1 -checkpoint-dir ckpt -resume 1 -debug 1 | tail -2

echo "== CBOW train (hot/cold scatter split + dense-hot negatives) =="
python -m word2bits_tpu.cli train -train corpus.txt -output dh.bin -binary 1 \
    -size 32 -window 3 -negative 6 -iter 2 -min-count 2 -bitlevel 1 \
    -batch-size 128 -neg-sharing 16 -fused-tables 1 \
    -hot-rows 16 -neg-dense-hot 1 -debug 1 | tail -2

echo "== skip-gram train =="
python -m word2bits_tpu.cli train -train corpus.txt -output sg.bin -binary 1 \
    -size 32 -window 3 -negative 6 -iter 2 -min-count 2 -bitlevel 1 \
    -batch-size 128 -model skipgram -debug 1 | tail -2

echo "== evaluate (reference-compatible interface) =="
printf ": smoke\ncat dog sun moon\nsun moon cat dog\nred blue run walk\n" > q.txt
python -m word2bits_tpu.cli accuracy cbow.bin 0 0 -questions q.txt | tail -3

if command -v gcc >/dev/null && [ -f /root/reference/src/compute-accuracy.c ]; then
  echo "== cross-check with the compiled REFERENCE evaluator =="
  gcc /root/reference/src/compute-accuracy.c -o ref-accuracy -lm -O2
  ./ref-accuracy cbow.bin 0 0 < q.txt | tail -3
fi

echo "== convert: requantize + bit-pack an existing vector file =="
python -m word2bits_tpu.cli convert sg.bin sg.pack -bitlevel 1 -packed 1
python -m word2bits_tpu.cli convert sg.pack sg_round.bin -binary 1
python -m word2bits_tpu.cli accuracy sg_round.bin 0 0 -questions q.txt | tail -2

echo "== tune: throughput auto-tuner (two variants; more compiles would
strain the on-device smoke budget at 30-150s per remote compile) =="
python -m word2bits_tpu.cli tune -train corpus.txt -size 32 -window 3 \
    -negative 6 -min-count 2 -batch-size 128 -tune-seconds 0.2 \
    -tune-max-variants 2 | tail -3

echo "== packed storage round-trip =="
python - <<'EOF'
from word2bits_tpu.io.packed import read_packed
from word2bits_tpu.io.vectors import read_vectors
import numpy as np, os
w1, v1 = read_vectors("cbow.bin")
w2, v2, bl = read_packed("cbow.bin.pack")
assert w1 == w2 and np.array_equal(v1, v2)
r = os.path.getsize("cbow.bin") / os.path.getsize("cbow.bin.pack")
print(f"packed == fp32 rows exactly; {r:.1f}x smaller")
EOF

echo "SMOKE OK"
