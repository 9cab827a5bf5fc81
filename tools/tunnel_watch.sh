#!/bin/bash
# Poll the TPU tunnel until it answers a tiny matmul; log state transitions.
# Usage: tools/tunnel_watch.sh [logfile]
LOG=${1:-/tmp/tunnel_watch.log}
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); (x@x).sum().block_until_ready()
" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) LIVE" >> "$LOG"
    exit 0
  else
    echo "$(date -u +%FT%TZ) down" >> "$LOG"
  fi
  sleep 60
done
