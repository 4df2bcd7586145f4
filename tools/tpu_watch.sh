#!/bin/bash
# Supervise the round's TPU measurement queue across tunnel flakes.
#
# The single probe->queue chain runs the queue exactly ONCE; if the tunnel
# serves briefly and re-wedges mid-queue, the round loses its measurements.
# This wrapper loops: wait for the tunnel (tools/tunnel_probe.sh blocks
# until a probe dispatch succeeds), run the queue into an iteration-local
# dir, and stop only once bench.py has produced a real JSON result (the
# round's headline artifact).  Later iterations re-run everything — jobs
# that already succeeded are cheap to repeat relative to losing bench.
#
# Usage: bash tools/tpu_watch.sh [max_iters]   (default 20)
set -u
MAX=${1:-20}
for i in $(seq 1 "$MAX"); do
  echo "$(date +%H:%M:%S) watch: iteration $i — waiting for tunnel" \
    >> /tmp/tpu_watch.log
  bash /root/repo/tools/tunnel_probe.sh /tmp/tunnel_probe.log 480 240
  export TPU_RUNS_DIR=/tmp/tpu_runs_$i
  echo "$(date +%H:%M:%S) watch: tunnel up — running queue -> $TPU_RUNS_DIR" \
    >> /tmp/tpu_watch.log
  bash /root/repo/tools/tpu_queue.sh
  if grep -q '"metric"' "$TPU_RUNS_DIR/bench.out" 2>/dev/null; then
    echo "$(date +%H:%M:%S) watch: bench landed — done" >> /tmp/tpu_watch.log
    # surface results where earlier tooling expects them; walk ALL
    # iterations oldest->newest and only let NON-EMPTY outputs overwrite,
    # so a later wedged iteration cannot bury an earlier good measurement
    mkdir -p /tmp/tpu_runs
    for d in /tmp/tpu_runs_*; do
      [ -d "$d" ] || continue
      for f in "$d"/*.out; do
        [ -s "$f" ] || continue
        cp "$f" /tmp/tpu_runs/
        e="${f%.out}.err"; [ -f "$e" ] && cp "$e" /tmp/tpu_runs/
      done
    done
    exit 0
  fi
  echo "$(date +%H:%M:%S) watch: queue ran but bench has no result; re-arming" \
    >> /tmp/tpu_watch.log
  sleep 300
done
echo "$(date +%H:%M:%S) watch: gave up after $MAX iterations" >> /tmp/tpu_watch.log
exit 1
