#!/bin/bash
# Periodically probe the axon TPU tunnel; exit 0 the first time it serves.
# Gentle cadence (default 600 s) — the tunnel recovers after quiet periods
# (CLAUDE.md), so hammering it is counterproductive.
LOG=${1:-/tmp/tunnel_probe.log}
INTERVAL=${2:-600}
ATTEMPT_TIMEOUT=${3:-240}
while true; do
  echo "$(date +%H:%M:%S) probe start" >> "$LOG"
  if timeout "$ATTEMPT_TIMEOUT" env PYTHONPATH=/root/repo:/root/.axon_site \
      python -c "
import time, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((256, 256))
v = float((x @ x)[0, 0])
print(f'OK {v} {time.time()-t0:.1f}s', flush=True)
" >> "$LOG" 2>&1; then
    echo "$(date +%H:%M:%S) TUNNEL UP" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) probe failed; sleeping $INTERVAL" >> "$LOG"
  sleep "$INTERVAL"
done
