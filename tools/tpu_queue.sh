#!/bin/bash
# Run the round's queued TPU measurements in order, logging each to its own
# file under /tmp/tpu_runs.  Intended to be chained after tools/tunnel_probe.sh
# succeeds.  Each job runs in its own process under timeout; a failure does
# not stop the queue (the tunnel may re-wedge mid-queue — later jobs retry
# their own first dispatch).
set -u
OUT=${TPU_RUNS_DIR:-/tmp/tpu_runs}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  local name=$1; shift
  echo "$(date +%H:%M:%S) START $name" >> "$OUT/queue.log"
  timeout "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "$(date +%H:%M:%S) END $name rc=$?" >> "$OUT/queue.log"
}

# 1. step-variant decisions (one process, many variants; biggest info/second)
# (26 variants x (30-150s remote compile + 8s measure; CLAUDE.md compile
#  range) — worst case ~70 min, give 4500s)
run step_bench 4500 python tools/step_bench.py
# 2. scatter microbench (informs ARCHITECTURE scatter table)
run scatter_bench 1200 python tools/scatter_bench.py
# 3. full-Wikipedia single-chip capacity probe (VERDICT missing #5)
#    compile-only buffer report first (cannot OOM; gives the real HBM peak
#    incl. temps), then the execution probes
run capacity_3.7M_analyze 900 python tools/capacity_probe.py 3700000 800 16384 --analyze
run capacity_3.7M 1200 python tools/capacity_probe.py 3700000 800 16384
run capacity_3.7M_dense 1200 python tools/capacity_probe.py 3700000 800 16384 --dense 4096
# 4. the round's headline: bench.py (self-supervising, retries internally)
run bench 3600 python bench.py
# 5. end-to-end CLI smoke ON THE DEVICE (each leg pays the per-process
#    first-dispatch cost; budget generously)
run smoke_tpu 2400 bash tools/smoke.sh
python tools/tpu_summarize.py "$OUT" >> "$OUT/queue.log" 2>&1
echo "$(date +%H:%M:%S) QUEUE DONE" >> "$OUT/queue.log"
